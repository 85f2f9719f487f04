"""Distributed connected components — transitive duplicate clustering.

Candidate-pair generators (MinHash-LSH, SimHash, embedding-LSH —
datapipe/dedup.py) emit an EDGE LIST of near-duplicate pairs. Keeping
one document per *pair* under-deletes: if A~B and B~C but A!~C, pairwise
keep-min retains both A and C even though the three form one duplicate
cluster. Production web dedup (the CCNet / RefinedWeb / SlimPajama
lineage) therefore runs connected components over the candidate graph
and keeps one representative per component.

The operator is min-label propagation with pointer jumping, the
standard Spark formulation of the MapReduce CC algorithms (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14):

* every vertex starts labeled with itself;
* each round, a vertex takes the min label over itself + its neighbors
  (one shuffle keyed on vertex), then labels are pointer-jumped
  (``lbl := lbl(lbl)``, one shuffle keyed on label) — the jump is what
  turns O(diameter) rounds into O(log n);
* iterate until a round changes nothing.

Scale notes (100 TB): each round is two shuffles over the EDGE list —
near-dup graphs are sparse (edges ≪ corpus; most documents have no
candidate at all and never enter the graph). Lineage is cut per round
with ``localCheckpoint`` so the plan stays O(1) deep regardless of
round count (on a real cluster prefer a reliable ``checkpoint`` dir —
localCheckpoint pins executor blocks). The driver-side convergence test
is one ``isEmpty`` on the changed-labels frame per round — the same
loop structure GraphFrames' connectedComponents uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """Components of the undirected graph given as an edge list.

    Returns ``(id, component)`` for every vertex that appears in an
    edge, where ``component`` is the MINIMUM vertex id reachable from
    ``id`` — a deterministic, engine-independent canonical label (the
    DuckDB twin computes the same min over a recursive closure).
    Vertices absent from the edge list are their own singleton
    components; callers add them back with a left join + coalesce (see
    ``components_with_singletons``)."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
    sym = sym.union(sym.select(F.col("w").alias("u"), F.col("u").alias("w")))
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
    )
    if use_local_checkpoint:
        sym = sym.localCheckpoint(eager=False)

    for _ in range(max_rounds):
        # neighbor-min: aggregate each vertex's neighbors' labels, then
        # join back so the TRUE previous label (old_lbl) rides along —
        # the convergence test below needs it, and this shape has the
        # same shuffle count as the union+groupBy formulation.
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "w"), "w")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl"),
            F.col("lbl").alias("old_lbl"),
        )
        # pointer jump: lbl := lbl(lbl). Labels are vertex ids, so the
        # label's own label exists whenever lbl != id; min() keeps the
        # jump monotone.
        jump = stepped.select(
            F.col("id").alias("lbl"), F.col("lbl").alias("lbl2")
        )
        new = (
            stepped.join(jump, "lbl", "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("lbl2", "lbl")).alias("lbl"),
                "old_lbl",
            )
        )
        if use_local_checkpoint:
            new = new.localCheckpoint(eager=True)
        # convergence = NO label moved this round (labels only decrease,
        # so post-jump lbl == old_lbl iff both the neighbor step and the
        # jump were no-ops). A filter over the just-materialized blocks
        # — no join back to the previous round's frame.
        done = new.filter(F.col("lbl") != F.col("old_lbl")).isEmpty()
        labels = new.select("id", "lbl")
        if done:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    return labels.select("id", F.col("lbl").alias("component"))


def components_with_singletons(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Every vertex gets a component: edge-connected vertices share
    their min-reachable id, untouched vertices are their own singleton.
    One broadcast-sized join when the component table is small relative
    to the corpus (near-dup graphs); Catalyst/AQE picks the strategy."""
    comp = connected_components(edges, src, dst)
    return (
        vertices.join(
            comp.withColumnRenamed("id", id_col), id_col, "left"
        )
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
    )


def component_dedup(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep exactly ONE vertex per duplicate component — the minimum id,
    which by construction equals the component label, so survivorship is
    the filter ``id == component``: no extra shuffle beyond the
    component computation itself."""
    tagged = components_with_singletons(vertices, edges, id_col, src, dst)
    return tagged.filter(F.col(id_col) == F.col("component")).select(id_col)
