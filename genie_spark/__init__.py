"""genie_spark — a PySpark-native closed-world KG-construction engine.

A from-scratch, Spark-first re-expression of the capabilities of
epfl-dlab/GenIE (reference at /root/reference, see SURVEY.md): constrained
triple generation, entity linking / canonicalization against a broadcast
name catalog, graph materialization, and the full evaluation harness
(micro / macro / bucket / zero-shot metrics) — all as DataFrame plans that
Catalyst can optimize, with Python confined to one Arrow-batched
``mapInPandas`` generation operator.
"""

__version__ = "0.1.0"
