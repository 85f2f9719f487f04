"""Entity linking / canonicalization joins and graph materialization.

The reference canonicalizes by Python dict lookup
(reference: genie/models/genie_base_pl.py:406-410 via the
surface_form2id dict, genie/datamodule/utils/surface_forms_utils.py:278-295).
Spark-first, each dict lookup becomes a **broadcast equi-join** against
the (small) catalog dimension, and the triple-set dedup becomes a
hash-partitioned ``dropDuplicates`` — with the head-entity skew the
north_rule calls out handled explicitly (salted pre-aggregation) plus AQE
skew-join as the adaptive backstop.

Scale notes (100 TB):
* ent/rel catalogs are ≤ a few GB (6M names) — always broadcast; the fact
  table side never shuffles for the join itself.
* the dedup shuffle keys on (s_id, r_id, o_id); Zipf-head subjects
  concentrate traffic. ``dedup_triples`` therefore pre-aggregates within
  partitions (map-side distinct via salted groupBy) before the global
  distinct — the classic two-phase distinct that bounds any single
  reducer's input by (#salts × #distinct), not by row count.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def dedup_catalog(catalog: DataFrame) -> DataFrame:
    """J6 (reference genie/utils/utils.py:39-104): drop catalog entries
    whose surface form maps to more than one id — an ambiguous name can't
    canonicalize. groupBy + filter + semi-join, all stock."""
    unique_names = (
        catalog.groupBy("name").count().filter(F.col("count") == 1).select("name")
    )
    return catalog.join(broadcast(unique_names), "name", "inner").select(
        catalog["id"], catalog["name"], catalog["provenance"]
    )


def surface_to_id(
    triples: DataFrame,
    ent_catalog: DataFrame,
    rel_catalog: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """J1: (s, r, o) surface forms → (s_id, r_id, o_id) via three broadcast
    joins (reference genie_base_pl.py:406-410). ``how='left'`` keeps
    unlinkable triples with null ids (J2's no_match analog).

    Input must have columns s, r, o; passes through all other columns.
    """
    ents = dedup_catalog(ent_catalog).select(
        F.col("name"), F.col("id"), F.col("provenance")
    )
    rels = dedup_catalog(rel_catalog).select(F.col("name"), F.col("id"))
    e_s = broadcast(ents.select(F.col("name").alias("s"), F.col("id").alias("s_id"),
                                F.col("provenance").alias("s_provenance")))
    e_o = broadcast(ents.select(F.col("name").alias("o"), F.col("id").alias("o_id"),
                                F.col("provenance").alias("o_provenance")))
    r_r = broadcast(rels.select(F.col("name").alias("r"), F.col("id").alias("r_id")))
    return triples.join(e_s, "s", how).join(r_r, "r", how).join(e_o, "o", how)


def id_to_surface(
    id_triples: DataFrame,
    ent_catalog: DataFrame,
    rel_catalog: DataFrame,
) -> DataFrame:
    """J2 (reference triplet_utils.py:38-68, surface_forms_utils.py:180-232):
    annotate id-triples with surface forms + per-position match status
    (`title` / `label` / `no_match`). Left joins keep unmatched ids.

    Input columns: s_id, r_id, o_id (+passthrough).
    """
    ents = ent_catalog.select("id", "name", "provenance")
    rels = rel_catalog.select("id", "name")

    def status(prov):
        return (
            F.when(prov.isNull(), F.lit("no_match"))
            .when(prov == "en_title", F.lit("title"))
            .otherwise(F.lit("label"))
        )

    out = id_triples
    for pos in ("s", "o"):
        dim = broadcast(
            ents.select(
                F.col("id").alias(f"{pos}_id"),
                F.col("name").alias(pos),
                F.col("provenance").alias(f"_{pos}_prov"),
            )
        )
        out = out.join(dim, f"{pos}_id", "left").withColumn(
            f"{pos}_status", status(F.col(f"_{pos}_prov"))
        ).drop(f"_{pos}_prov")
    dim_r = broadcast(
        rels.select(F.col("id").alias("r_id"), F.col("name").alias("r"))
    )
    out = out.join(dim_r, "r_id", "left").withColumn(
        "r_status", F.when(F.col("r").isNull(), "no_match").otherwise("title")
    )
    # roll-up per triple (reference surface_forms_utils.py:207-213): the
    # weakest position status wins (no_match > label > title)
    return out.withColumn(
        "triple_status",
        F.when(
            (F.col("s_status") == "no_match")
            | (F.col("r_status") == "no_match")
            | (F.col("o_status") == "no_match"),
            "no_match",
        )
        .when((F.col("s_status") == "label") | (F.col("o_status") == "label"), "label")
        .otherwise("title"),
    )


def dedup_triples(
    triples: DataFrame,
    keys=("s_id", "r_id", "o_id"),
    salt_buckets: int = 0,
) -> DataFrame:
    """Global distinct over (s,r,o) with explicit skew handling.

    With ``salt_buckets=0``: plain ``dropDuplicates`` — Spark already does
    partial (map-side) distinct before the shuffle, and AQE splits skewed
    reduce partitions. With ``salt_buckets=N``: the two-phase salted form
    the north_rule asks to demonstrate — phase 1 dedups within
    (salt, keys) groups where salt spreads each hot key over N reducers;
    phase 2 dedups the (now ≤ N × distinct) survivors.
    """
    keys = list(keys)
    if salt_buckets <= 1:
        return triples.dropDuplicates(keys)
    salted = triples.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id()), F.lit(salt_buckets))
    )
    phase1 = salted.dropDuplicates(keys + ["_salt"]).drop("_salt")
    return phase1.dropDuplicates(keys)


def materialize_graph(
    extracted: DataFrame,
    ent_catalog: DataFrame,
    rel_catalog: DataFrame,
    salt_buckets: int = 0,
) -> DataFrame:
    """Full downstream stage: exploded predictions → linked id triples →
    global dedup → graph rows (subj, pred, obj, subj_name, pred_name,
    obj_name, n_sources, first_url).

    ``extracted`` is the output of the generation stage: one row per
    sentence with ``pred_triples: array<struct<s,r,o>>`` and ``url``.
    Provenance aggregates (n_sources, first_url) replace the reference's
    per-rank JSONL lineage (genie_base_pl.py:275-297) with a single
    shuffle-sharing groupBy.
    """
    flat = extracted.select(
        "url", F.explode_outer("pred_triples").alias("t")
    ).filter(F.col("t").isNotNull()).select("url", "t.s", "t.r", "t.o")
    linked = surface_to_id(flat, ent_catalog, rel_catalog, how="inner")
    if salt_buckets > 1:
        # explicit skew pre-reduction: dedup (triple, url) pairs under a
        # salt first, so the final hot-key reducer sees at most the
        # distinct-url count per triple, not the raw mention count
        linked = dedup_triples(
            linked, keys=("s_id", "r_id", "o_id", "url"), salt_buckets=salt_buckets
        )
    # one shuffle does both dedup and provenance aggregation. min (not
    # first): when several surface forms link to one id, first() is
    # aggregation-order-dependent — min keeps the graph rows
    # partition-invariant, the invariant the whole decode path holds.
    grouped = linked.groupBy("s_id", "r_id", "o_id").agg(
        F.min("s").alias("subj_name"),
        F.min("r").alias("pred_name"),
        F.min("o").alias("obj_name"),
        F.countDistinct("url").alias("n_sources"),
        F.min("url").alias("first_url"),
    )
    return grouped.select(
        F.col("s_id").alias("subj"),
        F.col("r_id").alias("pred"),
        F.col("o_id").alias("obj"),
        "subj_name", "pred_name", "obj_name", "n_sources", "first_url",
    )


def write_graph(
    graph: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: Optional[str] = "pred",
    table: Optional[str] = None,
) -> str:
    """Materialize the graph table. With an Iceberg runtime and ``table``
    identifier: snapshot-committed ``writeTo`` (see iceberg.py); otherwise
    a Parquet directory with identical partitioning (by predicate —
    bounded cardinality, prunes predicate-filtered reads). Returns the
    sink kind actually used ('iceberg' | 'parquet')."""
    from .iceberg import write_table

    return write_table(
        graph,
        table or "genie.graph",
        path,
        mode=mode,
        partition_by=partition_by,
    )


def fuzzy_candidates(
    mentions: DataFrame,
    catalog: DataFrame,
    max_block_df: int = 1_000_000,
    mention_col: str = "mention",
    mention_id_col: str = "mention_id",
    name_col: str = "name",
    id_col: str = "id",
) -> DataFrame:
    """Blocked + scored fuzzy-link candidate pairs — the shared first
    two stages of :func:`fuzzy_link` (token blocking with a df-cut,
    then full-string Levenshtein), WITHOUT the per-mention argmin.
    Returns one row per surviving (mention, entity) pair:
    (mention_id, mention, dist, entity_id, entity_name).

    Exposed separately because entity RESOLUTION consumes the whole
    thresholded candidate graph (transitive clustering over every pair
    with dist <= t), whereas entity LINKING keeps only the argmin.

    Scale shape (100 TB): the token-blocking join shuffles on the token
    key with the df-cut bounding per-key fan-out; scoring is row-local.
    No all-pairs stage anywhere."""
    def toks(df, idc, strc):
        return (
            df.select(F.col(idc), F.explode(F.split(F.col(strc), " ")).alias("tok"))
            .filter(F.col("tok") != "")
            .distinct()
        )

    cat_toks = toks(catalog, id_col, name_col)
    keep = (
        cat_toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .filter(F.col("df") <= max_block_df)
        .select("tok")
    )
    cand = (
        toks(mentions, mention_id_col, mention_col)
        .join(F.broadcast(keep), "tok")
        .join(cat_toks.withColumnRenamed(id_col, "_cand_id"), "tok")
        .select(mention_id_col, "_cand_id")
        .distinct()
    )
    scored = (
        cand.join(mentions.select(mention_id_col, mention_col), mention_id_col)
        .join(
            catalog.select(
                F.col(id_col).alias("_cand_id"), F.col(name_col).alias("_cand_name")
            ),
            "_cand_id",
        )
        .select(
            mention_id_col,
            mention_col,
            F.levenshtein(F.col(mention_col), F.col("_cand_name")).cast("long").alias("dist"),
            F.col("_cand_id").alias("entity_id"),
            F.col("_cand_name").alias("entity_name"),
        )
    )
    return scored


def fuzzy_link(
    mentions: DataFrame,
    catalog: DataFrame,
    max_block_df: int = 1_000_000,
    mention_col: str = "mention",
    mention_id_col: str = "mention_id",
    name_col: str = "name",
    id_col: str = "id",
) -> DataFrame:
    """Approximate entity linking for surface forms exact-match (J1,
    surface_to_id) cannot resolve — the standard blocked-ER shape
    (token blocking + edit-distance scoring + deterministic argmin).

    The reference links only exact trie-constrained names
    (genie/models/genie_base_pl.py:406-410); real KG construction needs
    a fallback for OCR noise / typos / morphological variants. Stages:

    1. **Blocking**: candidate pairs share >= 1 whitespace token between
       mention and catalog name. Tokens whose catalog document frequency
       exceeds ``max_block_df`` are excluded from blocking (the df-cut
       that bounds hub-token fan-out at web scale — same discipline as
       ngram_jaccard_pairs' df_cut).
    2. **Scoring**: unit-cost Levenshtein on the full strings (JVM
       F.levenshtein — identical DP definition in DuckDB).
    3. **Resolution**: per-mention argmin via min(struct(dist, id,
       name)) — partial-aggregatable and fully deterministic (ties break
       to the lowest entity id).

    Mentions none of whose tokens survive blocking produce no row
    (honest recall accounting; callers union a left-anti pass if they
    need explicit no_match rows). Stages 1-2 live in
    :func:`fuzzy_candidates` (shared with entity resolution); the
    argmin groupBy here partial-aggregates map-side."""
    scored = fuzzy_candidates(
        mentions, catalog, max_block_df,
        mention_col, mention_id_col, name_col, id_col,
    )
    best = scored.groupBy(mention_id_col, mention_col).agg(
        F.min(F.struct("dist", "entity_id", "entity_name")).alias("_b")
    )
    return best.select(
        mention_id_col,
        mention_col,
        F.col("_b.dist").alias("dist"),
        F.col("_b.entity_id").alias("entity_id"),
        F.col("_b.entity_name").alias("entity_name"),
    )


def resolve_entities(
    mentions: DataFrame,
    catalog: DataFrame,
    max_dist: int = 1,
    max_block_df: int = 1_000_000,
    mention_col: str = "mention",
    mention_id_col: str = "mention_id",
    name_col: str = "name",
    id_col: str = "id",
) -> DataFrame:
    """Collective entity resolution: transitive clustering over the
    THRESHOLDED fuzzy-candidate graph. Where :func:`fuzzy_link` keeps
    each mention's single best entity, resolution keeps EVERY candidate
    pair with dist <= max_dist as an edge of a bipartite
    mention-entity graph and runs distributed connected components over
    it — a mention close to two catalog entries merges those entries
    into one cluster (duplicate/near-duplicate catalog listings), and
    chains M1~E1, M2~E1, M2~E2 collapse transitively, which pairwise
    linking cannot do. Returns one row per node ('M'<mention_id> /
    'E'<entity_id>) with its cluster label = min reachable node id;
    untouched nodes are their own singleton cluster.

    Scale shape (100 TB): candidate generation is the df-cut blocked
    join (no all-pairs); the component loop is two shuffles per round
    over the EDGE list only (thresholded near-dup edges ≪ catalog), via
    datapipe/graph.py's min-label-propagation + pointer jumping."""
    from .datapipe.graph import components_with_singletons

    cands = fuzzy_candidates(
        mentions, catalog, max_block_df,
        mention_col, mention_id_col, name_col, id_col,
    )
    edges = cands.filter(F.col("dist") <= max_dist).select(
        F.concat(F.lit("M"), F.col(mention_id_col).cast("string")).alias("id_a"),
        F.concat(F.lit("E"), F.col("entity_id").cast("string")).alias("id_b"),
    )
    verts = (
        mentions.select(
            F.concat(F.lit("M"), F.col(mention_id_col).cast("string")).alias("node")
        )
        .union(
            catalog.select(
                F.concat(F.lit("E"), F.col(id_col).cast("string")).alias("node")
            )
        )
        .distinct()
    )
    return components_with_singletons(verts, edges, "node")


def fuse_latest(
    assertions: DataFrame,
    s_col: str = "s",
    r_col: str = "r",
    o_col: str = "o",
    ts_col: str = "ts",
) -> DataFrame:
    """Knowledge fusion over timestamped assertions: latest-object-wins
    per (subject, relation) plus conflict accounting — the temporal step
    after materialize_graph when the same fact is re-extracted from
    pages crawled at different times (warc_ts in the north-rule input).

    One partial-aggregatable groupBy: the winning object is
    max(struct(ts, o)) (newest assertion; ties break to the greatest
    object — deterministic), alongside assertion/object counts and a
    conflicted flag (>= 2 distinct objects ever asserted). The
    count(DISTINCT o) forces an expand-style two-phase agg under AQE but
    stays keyed on (s, r) — no extra shuffle of the fact table beyond
    the one aggregation."""
    return (
        assertions.groupBy(
            F.col(s_col).alias("s"), F.col(r_col).alias("r")
        )
        .agg(
            F.max(F.struct(F.col(ts_col).alias("ts"), F.col(o_col).alias("o"))).alias("_w"),
            F.count(F.lit(1)).cast("long").alias("n_assertions"),
            F.countDistinct(F.col(o_col)).cast("long").alias("n_objects"),
        )
        .select(
            "s",
            "r",
            F.col("_w.o").alias("o_latest"),
            F.col("_w.ts").alias("latest_ts"),
            "n_assertions",
            "n_objects",
            (F.col("n_objects") > 1).cast("long").alias("conflicted"),
        )
    )


def fuse_vote(
    assertions: DataFrame,
    s_col: str = "s",
    r_col: str = "r",
    o_col: str = "o",
) -> DataFrame:
    """Knowledge fusion by majority vote: per (subject, relation) the
    object asserted by the most sources wins (ties break to the
    greatest object — deterministic), with margin accounting. The
    complement of :func:`fuse_latest` for sources without trustworthy
    timestamps (reference counterpart: the fact-aggregation step after
    extraction, genie/utils/evaluation_utils.py aggregates per-triple
    sets; voting is the web-scale variant when the same fact arrives
    from many crawls).

    Plan: one groupBy on (s, r, o) reduces the fact table to per-object
    vote counts (partial-aggregatable, map-side combined), then a
    second groupBy on (s, r) over the already-reduced counts picks
    max(struct(n_votes, o)) and sums totals — the second shuffle moves
    only one row per distinct object, never the fact table.
    margin_ppm = winner votes in ppm of all votes (integer floor-div,
    oracle-exact); 1_000_000 means unanimous."""
    votes = assertions.groupBy(
        F.col(s_col).alias("s"),
        F.col(r_col).alias("r"),
        F.col(o_col).alias("o"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_votes"))
    return (
        votes.groupBy("s", "r")
        .agg(
            F.max(F.struct("n_votes", "o")).alias("_w"),
            F.sum("n_votes").cast("long").alias("n_total"),
            F.count(F.lit(1)).cast("long").alias("n_objects"),
        )
        .select(
            "s",
            "r",
            F.col("_w.o").alias("o_winner"),
            F.col("_w.n_votes").alias("n_votes"),
            "n_total",
            "n_objects",
            F.expr("_w.n_votes * 1000000L div n_total").alias("margin_ppm"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple = ("s", "r"),
    val_col: str = "o_latest",
) -> DataFrame:
    """Diff two fused-graph snapshots (e.g. :func:`fuse_latest` outputs
    from two crawl cuts): per (subject, relation) key, status is
    'added' (key only in new), 'removed' (only in old), 'changed'
    (both, different object) or 'unchanged'. The continuous-crawl KG
    maintenance primitive — what a downstream consumer reads to apply
    incremental updates instead of reloading the graph.

    Plan: one full outer join keyed on (s, r) — both sides are already
    one row per key, so the join moves each graph exactly once; no
    text, no fact table. Callers normally filter status != 'unchanged'
    (the diff is small relative to the graph; the filter happens after
    the join because 'unchanged' needs both sides to decide)."""
    keys = list(key_cols)
    o = old.select(
        *keys, F.col(val_col).alias("o_old"), F.lit(1).alias("_in_old")
    )
    n = new.select(
        *keys, F.col(val_col).alias("o_new"), F.lit(1).alias("_in_new")
    )
    return o.join(n, keys, "full_outer").select(
        *keys,
        "o_old",
        "o_new",
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("o_old") != F.col("o_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
