#!/usr/bin/env python
"""Evaluate an existing run output file — the reference's
``evaluate_from_file`` entry point (genie/evaluate_from_file.py:19-100)
as a flat CLI over the DataFrame evaluation layer.

Reads a reference-format ``testing_output.json`` (or any JSONL with
id/input/prediction/target linearizations — sources.read_testing_output
tolerates both key spellings), optionally restricts both sides to a
relation set (the relation-world files of §2, one JSON string per line),
runs the micro evaluator (optionally bootstrapped) and the macro
evaluator, prints the reference's ``name, score`` / ``mean +- std``
lines, and writes ``{micro,macro}_results.json`` under --output-dir —
the same artifacts the reference run leaves behind.

    python evaluate_from_file.py --input testing_output.json \
        --output-dir /tmp/eval --bootstrap 50 [--relations rels.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="testing_output.json path")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--relations", help="relation-set jsonl (one name per line)")
    ap.add_argument("--bootstrap", type=int, default=None,
                    help="bootstrap resamples for micro CIs (reference: 50)")
    ap.add_argument("--bootstrap-mode", choices=["multinomial", "poisson"],
                    default="multinomial")
    ap.add_argument("--cpus", type=int, default=0,
                    help="local[<n>] master; 0 = use the active/spark-submit master")
    args = ap.parse_args(argv)

    b = SparkSession.builder.appName("genie-spark-evaluate-from-file")
    if args.cpus:
        b = b.master(f"local[{args.cpus}]").config(
            "spark.sql.shuffle.partitions", str(max(2 * args.cpus, 16))
        )
    spark = b.config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from genie_spark.evaluation import evaluate_macro, evaluate_micro
    from genie_spark.sources import read_relation_set, read_testing_output

    df = read_testing_output(spark, args.input)
    rels = None
    if args.relations:
        rels = sorted(read_relation_set(spark, args.relations))

    micro = evaluate_micro(
        df,
        relations_to_consider=rels,
        num_bootstrap_samples=args.bootstrap,
        bootstrap_mode=args.bootstrap_mode,
    )
    if rels is not None:
        from genie_spark.evaluation import _restrict

        df = _restrict(df, list(rels), "pred", "target")
    macro, per_rel = evaluate_macro(df)

    os.makedirs(args.output_dir, exist_ok=True)
    results = {"micro": micro, "macro": macro}
    for name, scores in results.items():
        for metric, score in scores.items():
            line = (
                f"{score[0]:.3f} +- {score[1]:.3f}"
                if isinstance(score, tuple)
                else f"{score:.3f}"
            )
            print(f"{name}-{metric}, {line}")
        with open(
            os.path.join(args.output_dir, f"{name}_results.json"), "w",
            encoding="utf-8",
        ) as f:
            json.dump(scores, f, indent=4)
    per_rel.toPandas().to_json(
        os.path.join(args.output_dir, "macro_per_relation.json"),
        orient="records", indent=2,
    )
    return results


if __name__ == "__main__":
    main()
