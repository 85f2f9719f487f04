"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline: one scan, row-local
arithmetic (zip_with/aggregate — JVM codegen, no Python), then a global
top-k (Spark's TakeOrdered — no full sort). The scale path is
hyperplane-LSH bucketing: each vector gets a deterministic b-bit bucket;
a query probes only its bucket (and optionally hamming-1 neighbors), so
the scan cost drops by ~2^b while recall stays high for near-duplicate
search. Hyperplane coefficients are seeded literals generated once (same
constants inlined into the DuckDB oracle → bit-identical buckets).

The IVF path splits index-build from probe: `materialize_ivf_cells`
assigns each vector its nearest-centroid cell once and writes the corpus
`partitionBy("cell")`; `ivf_topk_pruned` then reads only the probed cells
via partition pruning — per-query cost is O(corpus / n_cells · n_probe),
with the O(corpus) assignment amortized over every query against the
index (a k-means refinement would change only the centroid list, not the
plan shape).
"""

from __future__ import annotations

import hashlib
import math
from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _plane_sign(seed: int, plane: int, dim: int) -> int:
    """Deterministic ±1 coefficient from md5 — reproducible anywhere."""
    h = hashlib.md5(f"{seed}:{plane}:{dim}".encode()).hexdigest()
    return 1 if int(h[:2], 16) % 2 == 0 else -1


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> List[List[int]]:
    """n_planes × dim ±1 matrix; inline these constants into both engines."""
    return [
        [_plane_sign(seed, p, d) for d in range(dim)] for p in range(n_planes)
    ]


def arr_lit(vals: Sequence[float]) -> Column:
    """array<double> literal via ONE parsed SQL expression. Building the
    same array from nested F.array(F.lit(...)) costs one py4j round-trip
    per element — ~6s of pure driver latency for a 32×16 codebook,
    measured; repr(float)+'D' round-trips every double exactly."""
    return F.expr("array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")")


def arr2_lit(rows) -> Column:
    """array<array<double>> literal via one parsed SQL expression."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in r) + ")"
            for r in rows
        )
        + ")"
    )


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    emb: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Baseline ANN oracle: cosine against a literal query vector, global
    top-k (ties broken by id for cross-engine determinism)."""
    qlit = arr_lit(query)
    scored = emb.select(
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col), qlit), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def hyperplane_bucket_col(
    vec_col: Column, planes: List[List[int]]
) -> Column:
    """array<float> → int bucket: bit p set iff Σ_d vec[d]·planes[p][d] > 0.
    Row-local; the planes are literals so Catalyst constant-folds them."""
    bucket = F.lit(0).cast("long")
    for p, coeffs in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                arr_lit(coeffs),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def _vec_dim(emb: DataFrame, vec_col: str, dim) -> int:
    """Resolve the embedding dimensionality. Callers should pass ``dim``
    (schema metadata or pipeline config) — the fallback probe runs one
    extra Spark job at plan-build time, which a 100-TB plan should not."""
    if dim is not None:
        return int(dim)
    return len(emb.select(vec_col).first()[0])


def bucketed_embeddings(
    emb: DataFrame,
    n_planes: int = 4,
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int = None,
) -> DataFrame:
    planes = hyperplanes(n_planes, _vec_dim(emb, vec_col, dim), seed)
    return emb.withColumn("bucket", hyperplane_bucket_col(F.col(vec_col), planes))


def query_bucket(query: Sequence[float], planes: List[List[int]]) -> int:
    qbucket = 0
    for p, coeffs in enumerate(planes):
        if sum(c * float(x) for c, x in zip(coeffs, query)) > 0:
            qbucket |= 1 << p
    return qbucket


def probe_buckets(qbucket: int, n_planes: int, multiprobe: int = 0) -> List[int]:
    """The query bucket plus, with ``multiprobe=1``, its n_planes
    hamming-1 neighbors — vectors near a hyperplane land on either side,
    so probing adjacent buckets recovers most of the recall a single-
    bucket probe loses, at (n_planes+1)/2^n_planes of the full-scan
    cost."""
    buckets = [qbucket]
    if multiprobe >= 1:
        buckets += [qbucket ^ (1 << p) for p in range(n_planes)]
    return sorted(set(buckets))


def lsh_topk(
    emb: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Scale-path ANN: probe only the query's hyperplane bucket (plus its
    hamming-1 neighbors with ``multiprobe=1``). With 2^n_planes buckets
    the scan shrinks ~2^n_planes× (partition pruning applies when the
    table is written bucketed/partitioned by `bucket`)."""
    dim = len(query)
    planes = hyperplanes(n_planes, dim, seed)
    probes = probe_buckets(query_bucket(query, planes), n_planes, multiprobe)
    bucketed = emb.withColumn("bucket", hyperplane_bucket_col(F.col(vec_col), planes))
    qlit = arr_lit(query)
    return (
        bucketed.filter(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            F.col("bucket"),
            F.round(cosine_col(F.col(vec_col), qlit), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def materialize_lsh_buckets(
    emb: DataFrame,
    path: str,
    n_planes: int = 4,
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int = None,
) -> None:
    """Assign every vector its hyperplane bucket ONCE and persist
    ``partitionBy("bucket")`` — probes against the written table are
    partition pruning over 1 (or 1+n_planes multiprobe) directories out
    of 2^n_planes, not a full scan re-hashing per query."""
    planes = hyperplanes(n_planes, _vec_dim(emb, vec_col, dim), seed)
    emb.withColumn(
        "bucket", hyperplane_bucket_col(F.col(vec_col), planes)
    ).write.partitionBy("bucket").mode("overwrite").parquet(path)


def lsh_topk_pruned(
    spark,
    path: str,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Probe a materialized bucket table: `bucket IN probes` on the
    partition column prunes to the probed directories; exact cosine
    inside."""
    dim = len(query)
    planes = hyperplanes(n_planes, dim, seed)
    probes = probe_buckets(query_bucket(query, planes), n_planes, multiprobe)
    qlit = arr_lit(query)
    bucketed = spark.read.parquet(path)
    return (
        bucketed.filter(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            F.col("bucket").cast("long").alias("bucket"),
            F.round(cosine_col(F.col(vec_col), qlit), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: partition the corpus by nearest centroid, probe
# only the query's cell(s). Centroids here are deterministic hash-sampled
# corpus vectors (a k-means refinement keeps the same plan shape — assign =
# argmin over centroid literals — so this is the representative scale path:
# the table is written partitioned by `cell`, and a probe prunes to
# n_probe_cells partitions).
# ---------------------------------------------------------------------------


def ivf_centroids(
    emb: DataFrame,
    n_cells: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> List[List[float]]:
    """Deterministic centroid pick: the n_cells corpus vectors with the
    smallest md5-derived hash of their id — stable across runs/engines,
    no RNG, no iteration. Collected to the driver (n_cells × dim floats,
    tiny) and inlined as literals into both engines' assignment exprs."""
    from .hashes import h60

    rows = (
        emb.select(id_col, vec_col)
        .withColumn("_h", h60(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(n_cells)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def ivf_kmeans_centroids(
    emb: DataFrame,
    n_cells: int = 8,
    n_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> List[List[float]]:
    """Lloyd refinement of the hash-sampled seeds: each iteration assigns
    every vector to its argmax-cosine cell (same 9dp-rounded metric as
    :func:`ivf_cell_col`) and moves each centroid to the element-wise mean
    of its members, rounded to 9dp so Spark and DuckDB summation-order
    drift (~1e-13 relative) can't flip an argmax. Empty cells keep their
    previous centroid. Fixed iteration count + deterministic seeds ⇒ the
    same centroids on every engine and every run.

    Cost: n_iters scans, each one groupBy(cell) with dim partial-agg
    columns (map-side combine; the shuffle carries n_cells × partitions ×
    dim counters, independent of corpus size). The index-build is
    amortized over every query against the materialized cell table."""
    cents = ivf_centroids(emb, n_cells, vec_col, id_col)
    dim = len(cents[0])
    for _ in range(n_iters):
        cells = emb.withColumn("cell", ivf_cell_col(F.col(vec_col), cents))
        means = cells.groupBy("cell").agg(
            *[
                F.round(
                    F.avg(F.element_at(F.col(vec_col), d + 1).cast("double")), 9
                ).alias(f"m{d}")
                for d in range(dim)
            ]
        ).collect()
        by_cell = {r["cell"]: [float(r[f"m{d}"]) for d in range(dim)] for r in means}
        cents = [by_cell.get(i, cents[i]) for i in range(n_cells)]
    return cents


def _cent_cos(vec_col: Column, cent: Sequence[float]) -> Column:
    """Cosine to a centroid literal, rounded to 9dp — the rounding absorbs
    engine summation-order drift so the argmax (and the DuckDB oracle's)
    agree bit-for-bit."""
    return F.round(cosine_col(vec_col, arr_lit(cent)), 9)


def ivf_cell_col(vec_col: Column, centroids: List[List[float]]) -> Column:
    """Spherical IVF assignment: argmax cosine over centroid literals →
    cell id (cells must align with the query metric; L2 cells over
    unnormalized vectors scatter cosine-neighbors — measured recall
    collapse 2/10 vs 8+/10). The n_cells cosines are computed ONCE each
    into a single array and argmax'd via array_position(·, array_max(·)),
    instead of the chained-F.when form whose plan carried every cosine
    twice (once for cell, once for best) and nested ~2·n_cells exprs —
    the source of the multi-MiB task binaries flagged in round 1.
    array_position returns the FIRST maximum → ties break to the lower
    cell id (same semantics as the reference strict->keep-first fold)."""
    cos_arr = F.array(*[_cent_cos(vec_col, c) for c in centroids])
    return (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int")


def ivf_probe_cells(
    query: Sequence[float], centroids: List[List[float]], n_probe: int = 2
) -> List[int]:
    """Driver-side (n_cells is tiny): the n_probe cell ids whose centroids
    are cosine-nearest the query, ties to the lower id — same 9dp rounding
    as the Column-side assignment."""
    def pycos(cent):
        dot = sum(float(x) * float(c) for x, c in zip(query, cent))
        nq = math.sqrt(sum(float(x) * float(x) for x in query))
        nc = math.sqrt(sum(float(c) * float(c) for c in cent))
        return round(dot / (nq * nc), 9)

    sims = [pycos(cent) for cent in centroids]
    return sorted(range(len(centroids)), key=lambda i: (-sims[i], i))[:n_probe]


def materialize_ivf_cells(
    emb: DataFrame,
    centroids: List[List[float]],
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Assign every vector its cell ONCE and persist `partitionBy("cell")`
    — the index-build step of IVF. Probes against the written table are
    partition pruning (PartitionFilters on `cell`), not a full scan that
    re-evaluates n_cells cosines per row per query. At 100 TB this is the
    difference between an O(corpus) assignment amortized over all queries
    and paying it on every single probe."""
    emb.withColumn("cell", ivf_cell_col(F.col(vec_col), centroids)).write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(path)


def ivf_topk_pruned(
    spark,
    path: str,
    query: Sequence[float],
    centroids: List[List[float]],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a materialized cell table: `cell IN probe` on the partition
    column prunes to n_probe directories; exact cosine inside."""
    probe = ivf_probe_cells(query, centroids, n_probe)
    qlit = arr_lit(query)
    cells = spark.read.parquet(path)
    return (
        cells.filter(F.col("cell").isin(probe))
        .select(
            F.col(id_col),
            F.col("cell").cast("int").alias("cell"),
            F.round(cosine_col(F.col(vec_col), qlit), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk(
    emb: DataFrame,
    query: Sequence[float],
    centroids: List[List[float]],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Index-free IVF probe (assignment inline): correct but re-derives
    the cell per row — use :func:`materialize_ivf_cells` +
    :func:`ivf_topk_pruned` everywhere the table is probed more than
    once."""
    probe = ivf_probe_cells(query, centroids, n_probe)
    qlit = arr_lit(query)
    cells = emb.withColumn("cell", ivf_cell_col(F.col(vec_col), centroids))
    return (
        cells.filter(F.col("cell").isin(probe))
        .select(
            F.col(id_col),
            F.col("cell"),
            F.round(cosine_col(F.col(vec_col), qlit), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk_sql(
    query: Sequence[float],
    n_cells: int = 8,
    k: int = 10,
    n_probe: int = 2,
) -> str:
    """DuckDB twin of :func:`ivf_centroids` + :func:`ivf_topk`, fully
    data-derived (the centroid pick runs in SQL with the same hash order),
    so the one static oracle string is correct at every scale factor."""
    from .hashes import h60_sql

    q = _q_vec_sql(query)

    def cos_sql(a: str, b: str) -> str:
        return (
            f"round(list_sum(list_transform(list_zip({a}, {b}),"
            f" p -> p[1]::DOUBLE * p[2]::DOUBLE))"
            f" / (sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
            f" * sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))), 9)"
        )

    return f"""
WITH cents AS (
  SELECT embedding AS cvec,
         row_number() OVER (ORDER BY {h60_sql("vec_id::VARCHAR")}, vec_id) - 1 AS cid
  FROM embeddings
  QUALIFY cid < {n_cells}
),
assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {cos_sql("e.embedding", "c.cvec")} DESC, c.cid
         ) AS rnk
  FROM embeddings e CROSS JOIN cents c
),
cells AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rnk = 1),
probe AS (
  SELECT cid FROM cents
  ORDER BY {cos_sql(q, "cvec")} DESC, cid
  LIMIT {n_probe}
)
SELECT vec_id, cell,
       round(list_sum(list_transform(list_zip(embedding, {q}),
                                     p -> p[1]::DOUBLE * p[2]::DOUBLE))
             / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform({q}, x -> x * x)))), 6) AS cosine
FROM cells WHERE cell IN (SELECT cid FROM probe)
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def ivf_kmeans_topk_sql(
    query: Sequence[float],
    n_cells: int = 8,
    k: int = 10,
    n_probe: int = 2,
    n_iters: int = 2,
) -> str:
    """DuckDB twin of :func:`ivf_kmeans_centroids` + :func:`ivf_topk`:
    the Lloyd iterations unroll to one (assign → per-cell element-wise
    avg → coalesce-with-previous) CTE block each, fully data-derived, so
    the single static oracle string is correct at every scale factor."""
    from .hashes import h60_sql

    q = _q_vec_sql(query)

    def cos_sql(a: str, b: str) -> str:
        return (
            f"round(list_sum(list_transform(list_zip({a}, {b}),"
            f" p -> p[1]::DOUBLE * p[2]::DOUBLE))"
            f" / (sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
            f" * sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))), 9)"
        )

    blocks = [
        f"""cents0 AS (
  SELECT list_transform(embedding, x -> x::DOUBLE) AS cvec,
         row_number() OVER (ORDER BY {h60_sql("vec_id::VARCHAR")}, vec_id) - 1 AS cid
  FROM embeddings
  QUALIFY cid < {n_cells}
)"""
    ]
    for it in range(n_iters):
        prev, cur = f"cents{it}", f"cents{it + 1}"
        blocks.append(
            f"""a{it} AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {cos_sql("e.embedding", "c.cvec")} DESC, c.cid
         ) AS rnk
  FROM embeddings e CROSS JOIN {prev} c
),
dm{it} AS (
  SELECT cid AS cell, dim, round(avg(val), 9) AS m
  FROM (SELECT cid, unnest(embedding)::DOUBLE AS val,
               generate_subscripts(embedding, 1) AS dim
        FROM a{it} WHERE rnk = 1)
  GROUP BY 1, 2
),
m{it} AS (SELECT cell, list(m ORDER BY dim) AS mvec FROM dm{it} GROUP BY 1),
{cur} AS (
  SELECT c.cid, coalesce(m.mvec, c.cvec) AS cvec
  FROM {prev} c LEFT JOIN m{it} m ON c.cid = m.cell
)"""
        )
    final = f"cents{n_iters}"
    blocks.append(
        f"""assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {cos_sql("e.embedding", "c.cvec")} DESC, c.cid
         ) AS rnk
  FROM embeddings e CROSS JOIN {final} c
),
cells AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rnk = 1),
probe AS (
  SELECT cid FROM {final}
  ORDER BY {cos_sql(q, "cvec")} DESC, cid
  LIMIT {n_probe}
)"""
    )
    with_sql = ",\n".join(blocks)
    return f"""
WITH {with_sql}
SELECT vec_id, cell,
       round(list_sum(list_transform(list_zip(embedding, {q}),
                                     p -> p[1]::DOUBLE * p[2]::DOUBLE))
             / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform({q}, x -> x * x)))), 6) AS cosine
FROM cells WHERE cell IN (SELECT cid FROM probe)
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# oracle SQL builders (DuckDB twins; same literals, same rounding)
# ---------------------------------------------------------------------------


def _q_vec_sql(query: Sequence[float]) -> str:
    return "[" + ", ".join(f"{float(x)!r}" for x in query) + "]"


def brute_force_topk_sql(query: Sequence[float], k: int = 10) -> str:
    q = _q_vec_sql(query)
    return f"""
SELECT vec_id,
       round(list_sum(list_transform(list_zip(embedding, {q}),
                                     p -> p[1]::DOUBLE * p[2]::DOUBLE))
             / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform({q}, x -> x * x)))), 6) AS cosine
FROM embeddings
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def _bucket_expr_sql(planes: List[List[int]], vec: str = "embedding") -> str:
    terms = []
    for p, coeffs in enumerate(planes):
        plane = "[" + ", ".join(f"{float(c)!r}" for c in coeffs) + "]"
        terms.append(
            f"(CASE WHEN list_sum(list_transform(list_zip({vec}, {plane}),"
            f" p -> p[1]::DOUBLE * p[2])) > 0 THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


def lsh_topk_sql(
    query: Sequence[float],
    k: int,
    n_planes: int,
    dim: int,
    seed: int = 42,
    multiprobe: int = 0,
) -> str:
    planes = hyperplanes(n_planes, dim, seed)
    probes = probe_buckets(query_bucket(query, planes), n_planes, multiprobe)
    q = _q_vec_sql(query)
    in_list = ", ".join(str(b) for b in probes)
    return f"""
WITH b AS (
  SELECT vec_id, embedding, ({_bucket_expr_sql(planes)})::BIGINT AS bucket FROM embeddings
)
SELECT vec_id, bucket,
       round(list_sum(list_transform(list_zip(embedding, {q}),
                                     p -> p[1]::DOUBLE * p[2]::DOUBLE))
             / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform({q}, x -> x * x)))), 6) AS cosine
FROM b WHERE bucket IN ({in_list})
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def embedding_neardup_lsh_sql(
    n_planes: int, dim: int, threshold: float, seed: int = 42
) -> str:
    """DuckDB twin of dedup.embedding_neardup_lsh_pairs: same hyperplane
    literals, same bucket-blocked all-pairs cosine."""
    planes = hyperplanes(n_planes, dim, seed)
    return f"""
WITH base AS (
  SELECT vec_id,
         ({_bucket_expr_sql(planes)})::BIGINT AS bucket,
         list_transform(embedding, x -> x::DOUBLE) AS v,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS n
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.n * b.n), 6) AS cosine
FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.n * b.n) >= {threshold}
"""


# ---------------------------------------------------------------------------
# product quantization (ADC) — the memory-compression ANN tier
# ---------------------------------------------------------------------------


def pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    k_sub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> List[List[List[float]]]:
    """PQ codebooks: the ``k_sub`` smallest-hash corpus vectors (the same
    deterministic seed rule as :func:`ivf_centroids`) sliced into ``m``
    subspaces — codebook[j][c] is seed c's j-th subvector. Driver data:
    m × k_sub × (dim/m) floats. Production would Lloyd-refine each
    subspace codebook with the :func:`ivf_kmeans_centroids` machinery;
    the seeded form keeps the oracle compact while exercising the full
    PQ structure (encode → ADC)."""
    seeds = ivf_centroids(emb, k_sub, vec_col, id_col)
    dim = len(seeds[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [[s[j * sub:(j + 1) * sub] for s in seeds] for j in range(m)]


def _py_dot(a, b) -> float:
    # sequential left-to-right accumulation — the same order DuckDB's
    # list_sum and Spark's F.aggregate fold in, so all three engines
    # produce the identical double before the 9dp round
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def pq_code_cols(vec_col: Column, codebooks) -> List[Column]:
    """Per-subspace code assignment: argmax over codewords of
    round(dot(x_j, c) − 0.5·‖c‖², 9) — the L2 argmin in dot form (the
    ‖x_j‖² term is constant per row and drops out). First-max ties break
    to the lower code id. Entirely row-local Column math: encoding a
    10^12-vector corpus is one scan, no shuffle — the point of PQ is
    that the stored code (m small ints) replaces the dim-float vector,
    an ~(8·dim)/m-fold memory compression for the ANN serving tier."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    return [
        _sub_code_col(F.slice(vec_col, j * sub + 1, sub), codebooks[j])
        for j in range(m)
    ]


def _sub_code_col(sl: Column, book) -> Column:
    """Code for ONE subvector column against one codebook. ONE zip_with
    over (codebook, half-norms) literal arrays — not k_sub inlined
    aggregates: the expanded form put m × k_sub 16-element HOF aggregates
    in the plan (the round-1 task-binary blowup all over again; measured
    12.7s → ~1s at sf0.1)."""
    books_lit = arr2_lit(book)
    halfn_lit = arr_lit([0.5 * _py_dot(w, w) for w in book])
    scores = F.zip_with(
        books_lit, halfn_lit, lambda w, n: F.round(dot_col(sl, w) - n, 9)
    )
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def pq_kmeans_codebooks(
    emb: DataFrame,
    m: int = 4,
    k_sub: int = 16,
    n_iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Lloyd refinement of the seeded PQ codebooks, per subspace: each
    iteration assigns every subvector to its L2-argmin codeword (the same
    9dp-rounded dot − ½‖c‖² metric the encoder uses) and moves each
    codeword to the element-wise mean of its members, rounded to 9dp so
    Spark/DuckDB summation-order drift can't flip a later argmax; empty
    codes keep their previous word. Fixed iteration count + deterministic
    seeds ⇒ identical codebooks on every engine and every run. Cost:
    m × n_iters groupBy-scans at INDEX BUILD time (the shuffle carries
    k_sub × partitions × (dim/m) counters, independent of corpus size),
    amortized over every query against the materialized codes."""
    books = pq_codebooks(emb, m, k_sub, vec_col, id_col)
    sub = len(books[0][0])
    for _ in range(n_iters):
        # ALL m subspace assignments ride one scan (explode over j) into
        # one groupBy(j, c) and ONE collect — the per-subspace loop ran m
        # sequential jobs over the same corpus for k_sub×m result rows.
        # Per-(j, c) means are computed by the same F.avg over the same
        # member sets, so the refined codebooks are value-identical.
        per_j = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _sub_code_col(
                            F.slice(F.col(vec_col), j * sub + 1, sub), books[j]
                        ).alias("c"),
                        F.slice(F.col(vec_col), j * sub + 1, sub).alias("s"),
                    )
                    for j in range(m)
                ]
            )
        )
        means = (
            emb.select(per_j.alias("e"))
            .select("e.j", "e.c", "e.s")
            .groupBy("j", "c")
            .agg(
                *[
                    F.round(
                        F.avg(F.element_at(F.col("s"), d + 1).cast("double")), 9
                    ).alias(f"m{d}")
                    for d in range(sub)
                ]
            )
            .collect()
        )
        by_jc = {
            (r["j"], r["c"]): [float(r[f"m{d}"]) for d in range(sub)]
            for r in means
        }
        books = [
            [by_jc.get((j, i), books[j][i]) for i in range(k_sub)]
            for j in range(m)
        ]
    return books


def pq_topk(
    emb: DataFrame,
    query: Sequence[float],
    codebooks,
    k: int = 10,
    rerank: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query is NOT quantized; each
    corpus vector contributes Σ_j dot(q_j, codeword_{j,code_j}), looked
    up from the m × k_sub table computed once driver-side and inlined as
    literals. The approximate cosine divides by the PQ norm
    √(Σ_j ‖codeword‖²). Both sums are explicit fixed-order + chains (not
    aggregates), so Spark and the DuckDB twin add in the same order.
    Plan shape: row-local lookups + TakeOrderedAndProject — no shuffle,
    no global sort."""
    codes = pq_code_cols(F.col(vec_col), codebooks)
    with_codes = emb.select(
        F.col(id_col),
        F.col(vec_col),
        *[c.alias(f"_c{j}") for j, c in enumerate(codes)],
    )
    return _pq_adc_topk(
        with_codes, query, codebooks, k, rerank, vec_col, id_col, "_c{}"
    )


def materialize_pq_codes(
    emb: DataFrame,
    codebooks,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Encode once, serve forever: write (id, vector, c0..c{m-1}) to
    ``path``. Production stores the codes WITHOUT the vector (the whole
    point of PQ is that the serving tier holds m small ints per item) and
    fetches full vectors from the primary store only for the re-rank
    pool; the vector is co-located here because the sandbox has no
    separate vector store. Row-local encode — one scan, no shuffle."""
    codes = pq_code_cols(F.col(vec_col), codebooks)
    emb.select(
        F.col(id_col),
        F.col(vec_col),
        *[c.alias(f"c{j}") for j, c in enumerate(codes)],
    ).write.mode("overwrite").parquet(path)


def pq_topk_from_codes(
    spark,
    path: str,
    query: Sequence[float],
    codebooks,
    k: int = 10,
    rerank: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k against a :func:`materialize_pq_codes` table: the
    per-query plan is literal-table lookups over the stored codes — the
    corpus encode is paid once at index build, exactly the build/probe
    split the IVF tier has."""
    return _pq_adc_topk(
        spark.read.parquet(path), query, codebooks, k, rerank, vec_col,
        id_col, "c{}",
    )


def _pq_adc_topk(
    with_codes: DataFrame,
    query: Sequence[float],
    codebooks,
    k: int,
    rerank: int,
    vec_col: str,
    id_col: str,
    code_fmt: str,
) -> DataFrame:
    m = len(codebooks)
    sub = len(codebooks[0][0])
    q = [float(x) for x in query]
    qnorm = _py_dot(q, q) ** 0.5
    adc = None
    n2 = None
    for j in range(m):
        qj = q[j * sub:(j + 1) * sub]
        t_lit = arr_lit([round(_py_dot(qj, w), 9) for w in codebooks[j]])
        n_lit = arr_lit([round(_py_dot(w, w), 9) for w in codebooks[j]])
        tj = F.element_at(t_lit, F.col(code_fmt.format(j)) + 1)
        nj = F.element_at(n_lit, F.col(code_fmt.format(j)) + 1)
        adc = tj if adc is None else adc + tj
        n2 = nj if n2 is None else n2 + nj
    scored = with_codes.select(
        F.col(id_col),
        F.col(vec_col),
        F.round(adc / (F.lit(qnorm) * F.sqrt(n2)), 6).alias("adc_cosine"),
    )
    if rerank:
        # two-stage serving: the ADC lookup prunes to a small pool, exact
        # cosine re-ranks the pool ONLY — the standard production PQ
        # shape (quantization error stays out of the final ordering; the
        # full-precision vectors are read for `rerank` rows, not the
        # corpus)
        pool = scored.orderBy(
            F.desc("adc_cosine"), F.asc(id_col)
        ).limit(rerank)
        q_lit = arr_lit(q)
        return (
            pool.select(
                F.col(id_col),
                F.round(cosine_col(F.col(vec_col), q_lit), 6).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k)
        )
    return scored.select(id_col, "adc_cosine").orderBy(
        F.desc("adc_cosine"), F.asc(id_col)
    ).limit(k)


# ---------------------------------------------------------------------------
# IVF-PQ composition — the actual web-scale ANN serving shape: a coarse
# IVF cell probe prunes the corpus to n_probe partitions, ADC over stored
# PQ codes ranks the survivors from m small ints each, and exact cosine
# re-ranks only the candidate pool. At 10^12 vectors this is the only
# tier whose serving cost AND memory both stay sublinear: partition
# pruning bounds I/O, codes bound memory, re-rank bounds quantization
# error.
# ---------------------------------------------------------------------------


def materialize_ivf_pq(
    emb: DataFrame,
    centroids: List[List[float]],
    codebooks,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Build the composed index ONCE: every vector gets its coarse IVF
    cell (argmax-cosine over centroid literals) and its m PQ codes in
    the same row-local scan, written ``partitionBy("cell")`` — probes
    prune to cell directories and read codes, never the full corpus.
    (The full vector is co-located for the re-rank stage; production
    would store it in the primary store only.)"""
    codes = pq_code_cols(F.col(vec_col), codebooks)
    emb.select(
        F.col(id_col),
        F.col(vec_col),
        ivf_cell_col(F.col(vec_col), centroids).alias("cell"),
        *[c.alias(f"c{j}") for j, c in enumerate(codes)],
    ).write.partitionBy("cell").mode("overwrite").parquet(path)


def ivf_pq_topk_pruned(
    spark,
    path: str,
    query: Sequence[float],
    centroids: List[List[float]],
    codebooks,
    k: int = 10,
    n_probe: int = 2,
    rerank: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a :func:`materialize_ivf_pq` index: `cell IN probe` is
    partition pruning (PartitionFilters — asserted in test_plans), ADC
    ranks the pruned rows from their stored codes, exact cosine re-ranks
    the pool only."""
    probe = ivf_probe_cells(query, centroids, n_probe)
    pruned = spark.read.parquet(path).filter(F.col("cell").isin(probe))
    return _pq_adc_topk(
        pruned, query, codebooks, k, rerank, vec_col, id_col, "c{}"
    )


def ivf_pq_topk(
    emb: DataFrame,
    query: Sequence[float],
    centroids: List[List[float]],
    codebooks,
    k: int = 10,
    n_probe: int = 2,
    rerank: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Index-free IVF-PQ (cell + codes derived inline): correct but
    re-derives assignments per row — use :func:`materialize_ivf_pq` +
    :func:`ivf_pq_topk_pruned` everywhere the table is probed more than
    once."""
    probe = ivf_probe_cells(query, centroids, n_probe)
    codes = pq_code_cols(F.col(vec_col), codebooks)
    pruned = emb.select(
        F.col(id_col),
        F.col(vec_col),
        ivf_cell_col(F.col(vec_col), centroids).alias("cell"),
        *[c.alias(f"c{j}") for j, c in enumerate(codes)],
    ).filter(F.col("cell").isin(probe))
    return _pq_adc_topk(
        pruned, query, codebooks, k, rerank, vec_col, id_col, "c{}"
    )


def ivf_pq_topk_sql(
    query: Sequence[float],
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_sub: int = 16,
    dim: int = 64,
    k: int = 10,
    rerank: int = 0,
) -> str:
    """DuckDB twin of :func:`ivf_pq_topk`: the IVF assignment/probe CTEs
    (same as :func:`ivf_topk_sql`), PQ encode restricted to the probed
    survivors (encoding is row-local, so codes are identical to a full-
    corpus encode), the fixed-order ADC chain, and the exact re-rank —
    fully data-derived, correct at every scale factor."""
    from .hashes import h60_sql

    sub = dim // m
    q = _q_vec_sql(query)
    qnorm = _py_dot(query, query) ** 0.5

    def dot_sql(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(list_zip({a}, {b}),"
            f" p -> p[1]::DOUBLE * p[2]::DOUBLE))"
        )

    def n2_sql(a: str) -> str:
        return f"list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))"

    def cos9(a: str, b: str) -> str:
        return f"round({dot_sql(a, b)} / (sqrt({n2_sql(a)}) * sqrt({n2_sql(b)})), 9)"

    def sl(expr: str, j: int) -> str:
        return f"list_slice({expr}, {j * sub + 1}, {(j + 1) * sub})"

    assign = ",\n".join(
        f"""a{j} AS (
  SELECT e.vec_id, s.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round({dot_sql(sl("e.embedding", j), sl("s.svec", j))}
                    - 0.5 * {n2_sql(sl("s.svec", j))}, 9) DESC, s.cid
         ) AS rnk
  FROM surv e CROSS JOIN seeds s
),
c{j} AS (SELECT vec_id, cid AS code FROM a{j} WHERE rnk = 1)"""
        for j in range(m)
    )
    joins = " ".join(
        f"JOIN c{j} ON c{j}.vec_id = c0.vec_id" for j in range(1, m)
    )
    seed_joins = " ".join(
        f"JOIN seeds s{j} ON s{j}.cid = c{j}.code" for j in range(m)
    )
    adc_chain = " + ".join(
        f"round({dot_sql(sl(q, j), sl(f's{j}.svec', j))}, 9)" for j in range(m)
    )
    n2_chain = " + ".join(
        f"round({n2_sql(sl(f's{j}.svec', j))}, 9)" for j in range(m)
    )
    base = f"""WITH cents AS (
  SELECT embedding AS cvec,
         row_number() OVER (ORDER BY {h60_sql("vec_id::VARCHAR")}, vec_id) - 1 AS cid
  FROM embeddings
  QUALIFY cid < {n_cells}
),
cassign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {cos9("e.embedding", "c.cvec")} DESC, c.cid
         ) AS rnk
  FROM embeddings e CROSS JOIN cents c
),
probe AS (
  SELECT cid FROM cents
  ORDER BY {cos9(q, "cvec")} DESC, cid
  LIMIT {n_probe}
),
surv AS (
  SELECT vec_id, embedding FROM cassign
  WHERE rnk = 1 AND cid IN (SELECT cid FROM probe)
),
seeds AS (
  SELECT list_transform(embedding, x -> x::DOUBLE) AS svec,
         row_number() OVER (ORDER BY {h60_sql("vec_id::VARCHAR")}, vec_id) - 1 AS cid
  FROM embeddings
  QUALIFY cid < {k_sub}
),
{assign}"""
    adc_select = f"""SELECT c0.vec_id,
       round(({adc_chain}) / ({qnorm!r} * sqrt({n2_chain})), 6) AS adc_cosine
FROM c0 {joins} {seed_joins}
ORDER BY adc_cosine DESC, c0.vec_id ASC"""
    if not rerank:
        return f"\n{base}\n{adc_select}\nLIMIT {k}\n"
    exact = (
        f"round({dot_sql('e.embedding', q)}"
        f" / (sqrt({n2_sql('e.embedding')}) * sqrt({n2_sql(q)})), 6)"
    )
    return f"""
{base},
pool AS (
  {adc_select}
  LIMIT {rerank}
)
SELECT e.vec_id, {exact} AS cosine
FROM pool p JOIN surv e ON e.vec_id = p.vec_id
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {k}
"""


def pq_topk_sql(
    query: Sequence[float],
    m: int = 4,
    k_sub: int = 16,
    dim: int = 64,
    k: int = 10,
    rerank: int = 0,
) -> str:
    """DuckDB twin of :func:`pq_codebooks` + :func:`pq_code_cols` +
    :func:`pq_topk`, fully data-derived (seed pick, per-subspace argmax
    encode, 4-term fixed-order ADC chain), so the one static oracle
    string is correct at every scale factor."""
    from .hashes import h60_sql

    sub = dim // m
    q = _q_vec_sql(query)
    qnorm = _py_dot(query, query) ** 0.5

    def dot_sql(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(list_zip({a}, {b}),"
            f" p -> p[1]::DOUBLE * p[2]::DOUBLE))"
        )

    def sl(expr: str, j: int) -> str:
        return f"list_slice({expr}, {j * sub + 1}, {(j + 1) * sub})"

    def n2_sql(a: str) -> str:
        return f"list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))"

    # per-subspace assignment: rank codewords per (vec, subspace)
    assign = ",\n".join(
        f"""a{j} AS (
  SELECT e.vec_id, s.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round({dot_sql(sl("e.embedding", j), sl("s.svec", j))}
                    - 0.5 * {n2_sql(sl("s.svec", j))}, 9) DESC, s.cid
         ) AS rnk
  FROM embeddings e CROSS JOIN seeds s
),
c{j} AS (SELECT vec_id, cid AS code FROM a{j} WHERE rnk = 1)"""
        for j in range(m)
    )
    joins = " ".join(
        f"JOIN c{j} ON c{j}.vec_id = c0.vec_id" for j in range(1, m)
    )
    seed_joins = " ".join(
        f"JOIN seeds s{j} ON s{j}.cid = c{j}.code" for j in range(m)
    )
    adc_chain = " + ".join(
        f"round({dot_sql(sl(q, j), sl(f's{j}.svec', j))}, 9)" for j in range(m)
    )
    n2_chain = " + ".join(
        f"round({n2_sql(sl(f's{j}.svec', j))}, 9)" for j in range(m)
    )
    base = f"""WITH seeds AS (
  SELECT list_transform(embedding, x -> x::DOUBLE) AS svec,
         row_number() OVER (ORDER BY {h60_sql("vec_id::VARCHAR")}, vec_id) - 1 AS cid
  FROM embeddings
  QUALIFY cid < {k_sub}
),
{assign}"""
    adc_select = f"""SELECT c0.vec_id,
       round(({adc_chain}) / ({qnorm!r} * sqrt({n2_chain})), 6) AS adc_cosine
FROM c0 {joins} {seed_joins}
ORDER BY adc_cosine DESC, c0.vec_id ASC"""
    if not rerank:
        return f"\n{base}\n{adc_select}\nLIMIT {k}\n"
    exact = (
        f"round({dot_sql('e.embedding', q)}"
        f" / (sqrt({n2_sql('e.embedding')}) * sqrt({n2_sql(q)})), 6)"
    )
    return f"""
{base},
pool AS (
  {adc_select}
  LIMIT {rerank}
)
SELECT e.vec_id, {exact} AS cosine
FROM pool p JOIN embeddings e ON e.vec_id = p.vec_id
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {k}
"""


def pq_kmeans_topk_sql(
    query: Sequence[float],
    m: int = 4,
    k_sub: int = 16,
    dim: int = 64,
    k: int = 10,
    n_iters: int = 1,
) -> str:
    """DuckDB twin of :func:`pq_kmeans_codebooks` + encode + ADC: the
    per-subspace Lloyd iterations unroll to one (assign → per-dim avg →
    coalesce-with-previous) CTE block each, fully data-derived — the
    same unrolling recipe as :func:`ivf_kmeans_topk_sql`, sliced per
    subspace."""
    from .hashes import h60_sql

    sub = dim // m
    q = _q_vec_sql(query)
    qnorm = _py_dot(query, query) ** 0.5

    def dot_sql(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(list_zip({a}, {b}),"
            f" p -> p[1]::DOUBLE * p[2]::DOUBLE))"
        )

    def n2_sql(a: str) -> str:
        return f"list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))"

    def esl(j: int) -> str:
        return f"list_slice(e.embedding, {j * sub + 1}, {(j + 1) * sub})"

    blocks = [
        f"""seeds AS (
  SELECT list_transform(embedding, x -> x::DOUBLE) AS svec,
         row_number() OVER (ORDER BY {h60_sql("vec_id::VARCHAR")}, vec_id) - 1 AS cid
  FROM embeddings
  QUALIFY cid < {k_sub}
)"""
    ]
    for j in range(m):
        blocks.append(
            f"sb{j}i0 AS (SELECT cid, "
            f"list_slice(svec, {j * sub + 1}, {(j + 1) * sub}) AS bvec "
            f"FROM seeds)"
        )
        for it in range(n_iters):
            prev, cur = f"sb{j}i{it}", f"sb{j}i{it + 1}"
            rank = (
                f"round({dot_sql(esl(j), 'b.bvec')}"
                f" - 0.5 * {n2_sql('b.bvec')}, 9)"
            )
            blocks.append(
                f"""a{j}x{it} AS (
  SELECT e.vec_id, {esl(j)} AS sv, b.cid,
         row_number() OVER (
           PARTITION BY e.vec_id ORDER BY {rank} DESC, b.cid
         ) AS rnk
  FROM embeddings e CROSS JOIN {prev} b
),
dm{j}x{it} AS (
  SELECT cid AS code, dim, round(avg(val), 9) AS mval
  FROM (SELECT cid, unnest(sv)::DOUBLE AS val,
               generate_subscripts(sv, 1) AS dim
        FROM a{j}x{it} WHERE rnk = 1)
  GROUP BY 1, 2
),
mm{j}x{it} AS (SELECT code, list(mval ORDER BY dim) AS bvec FROM dm{j}x{it} GROUP BY 1),
{cur} AS (
  SELECT p.cid, coalesce(mm.bvec, p.bvec) AS bvec
  FROM {prev} p LEFT JOIN mm{j}x{it} mm ON p.cid = mm.code
)"""
            )
        final_book = f"sb{j}i{n_iters}"
        rank = (
            f"round({dot_sql(esl(j), 'b.bvec')}"
            f" - 0.5 * {n2_sql('b.bvec')}, 9)"
        )
        blocks.append(
            f"""fa{j} AS (
  SELECT e.vec_id, b.cid,
         row_number() OVER (
           PARTITION BY e.vec_id ORDER BY {rank} DESC, b.cid
         ) AS rnk
  FROM embeddings e CROSS JOIN {final_book} b
),
c{j} AS (SELECT vec_id, cid AS code FROM fa{j} WHERE rnk = 1)"""
        )
    joins = " ".join(
        f"JOIN c{j} ON c{j}.vec_id = c0.vec_id" for j in range(1, m)
    )
    seed_joins = " ".join(
        f"JOIN sb{j}i{n_iters} s{j} ON s{j}.cid = c{j}.code" for j in range(m)
    )
    adc_chain = " + ".join(
        f"round({dot_sql(f'list_slice({q}, {j * sub + 1}, {(j + 1) * sub})', f's{j}.bvec')}, 9)"
        for j in range(m)
    )
    n2_chain = " + ".join(
        f"round({n2_sql(f's{j}.bvec')}, 9)" for j in range(m)
    )
    with_sql = ",\n".join(blocks)
    return f"""
WITH {with_sql}
SELECT c0.vec_id,
       round(({adc_chain}) / ({qnorm!r} * sqrt({n2_chain})), 6) AS adc_cosine
FROM c0 {joins} {seed_joins}
ORDER BY adc_cosine DESC, c0.vec_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023 — arXiv:2303.09540): cluster
# the embedding space, then drop near-identical vectors WITHIN each
# cluster. The cluster assignment bounds the quadratic pair term — at
# 10^10 documents the all-pairs comparison only ever runs inside one
# cell, so k is chosen to keep cells at a comparable-pairs size, and the
# per-cell work is an ordinary shuffle-keyed self-join, not a cartesian
# product over the corpus.
# ---------------------------------------------------------------------------


def semantic_dedup_survivors(
    emb: DataFrame,
    centroids: List[List[float]],
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Vectors that SURVIVE semantic dedup: assign each vector its
    cluster (argmax cosine over the centroid literals, ties to the lower
    cell — :func:`ivf_cell_col`), generate within-cluster pairs via the
    blocked self-join (:func:`~genie_spark.datapipe.dedup.
    embedding_neardup_pairs`), and drop every vector that has a
    cosine-≥-threshold neighbor with a smaller id. Keep-lowest-id is the
    deterministic stand-in for the paper's keep-one-per-group policy —
    it needs no extra pass over the pair set and both engines agree on
    it bit-for-bit. Returns ``(id, cell)``."""
    from .dedup import embedding_neardup_pairs, spread_for_compute

    # cell assignment is n_cells × dim interpreted HOF ops per row —
    # compute-bound, so spread the single-split embeddings scan
    cells = spread_for_compute(emb).select(
        F.col(id_col),
        F.col(vec_col),
        ivf_cell_col(F.col(vec_col), centroids).alias("cell"),
    )
    cores = emb.sparkSession.sparkContext.defaultParallelism
    pairs = embedding_neardup_pairs(
        cells, vec_col, id_col, block_col="cell", threshold=threshold,
        salt=-(-cores * 8 // max(1, len(centroids))),  # 8x-oversampled keys vs partitions; 1 (no-op) once cells >= 8x cores
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return cells.join(dropped, id_col, "left_anti").select(id_col, "cell")


def semantic_dedup_sql(
    n_cells: int = 8,
    threshold: float = 0.95,
) -> str:
    """DuckDB twin of :func:`semantic_dedup_survivors` — data-derived
    hash-seeded centroids (same pick as :func:`ivf_topk_sql`), the same
    9dp-rounded argmax assignment, within-cell pairs at 6dp cosine, and
    the keep-lowest-id anti-join."""
    from .hashes import h60_sql

    def cos_sql(a: str, b: str, dp: int) -> str:
        return (
            f"round(list_sum(list_transform(list_zip({a}, {b}),"
            f" p -> p[1]::DOUBLE * p[2]::DOUBLE))"
            f" / (sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
            f" * sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))), {dp})"
        )

    return f"""
WITH cents AS (
  SELECT embedding AS cvec,
         row_number() OVER (ORDER BY {h60_sql("vec_id::VARCHAR")}, vec_id) - 1 AS cid
  FROM embeddings
  QUALIFY cid < {n_cells}
),
assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {cos_sql("e.embedding", "c.cvec", 9)} DESC, c.cid
         ) AS rnk
  FROM embeddings e CROSS JOIN cents c
),
cells AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rnk = 1),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {cos_sql("a.embedding", "b.embedding", 6)} >= {threshold}
)
SELECT c.vec_id, c.cell FROM cells c
ANTI JOIN dropped d ON d.vec_id = c.vec_id
"""


def lsh_recall_eval(
    emb: DataFrame,
    n_planes: int = 4,
    dim: int = 64,
    k: int = 10,
    query_mod: int = 97,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of the hyperplane-LSH probe against exact brute force,
    measured over a hash-drawn query panel (ids ≡ 0 mod ``query_mod``)
    drawn from the corpus itself — the accuracy accounting every
    approximate index owes its users (the recall/cost curve is THE
    ANN tuning artifact; see e.g. Johnson et al., faiss, 2017). Per
    query: ground truth = global top-k by (cosine, id); approximate =
    top-k restricted to the query's own bucket; returns
    ``(qid, n_hits, recall_ppm)`` in integer ppm.

    Scale shape: ground truth is a query-panel × corpus join (panel is
    a broadcast; per-row math is JVM zip_with/aggregate), the approx
    side joins on the BUCKET key, and both top-ks are
    query-partitioned windows — no global sort; the recall join moves
    k rows per query."""
    from pyspark.sql import Window

    planes = hyperplanes(n_planes, dim, seed)
    q = (
        emb.filter(F.col(id_col) % query_mod == 0)
        .select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qemb"),
        )
        .withColumn("qb", hyperplane_bucket_col(F.col("qemb"), planes))
    )
    e = emb.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket_col(F.col(vec_col), planes).alias("eb"),
    )
    cos = F.round(cosine_col(F.col(vec_col), F.col("qemb")), 6)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))

    def topk(pairs):
        return (
            pairs.select("qid", F.col(id_col), cos.alias("cosine"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("qid", id_col)
        )

    gt = topk(
        F.broadcast(q).crossJoin(e).filter(F.col(id_col) != F.col("qid"))
    )
    ap = topk(
        q.join(e, q.qb == e.eb).filter(F.col(id_col) != F.col("qid"))
    )
    hits = gt.join(ap, ["qid", id_col]).groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    return (
        q.select("qid")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(f"(coalesce(n_hits, 0L) * 1000000L) div {k}L")
            .cast("long")
            .alias("recall_ppm"),
        )
    )


def lsh_recall_eval_sql(
    n_planes: int = 4,
    dim: int = 64,
    k: int = 10,
    query_mod: int = 97,
    seed: int = 42,
) -> str:
    """DuckDB twin of :func:`lsh_recall_eval` — same plane literals,
    same (round(cosine,6), id) ordering, same integer-ppm recall."""
    planes = hyperplanes(n_planes, dim, seed)
    b_e = _bucket_expr_sql(planes, "embedding")
    b_q = _bucket_expr_sql(planes, "qemb")
    cos = (
        "round(list_sum(list_transform(list_zip(embedding, qemb),"
        " p -> p[1]::DOUBLE * p[2]::DOUBLE))"
        " / (sqrt(list_sum(list_transform(embedding,"
        " x -> x::DOUBLE * x::DOUBLE)))"
        " * sqrt(list_sum(list_transform(qemb,"
        " x -> x::DOUBLE * x::DOUBLE)))), 6)"
    )
    return f"""
WITH re_q AS (
  SELECT vec_id AS qid, embedding AS qemb, {b_q.replace("embedding", "qemb")} AS qb
  FROM (SELECT vec_id, embedding, embedding AS qemb FROM embeddings
        WHERE vec_id % {query_mod} = 0)),
re_e AS (SELECT vec_id, embedding, {b_e} AS eb FROM embeddings),
re_gt AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {cos} DESC, e.vec_id ASC) AS rn
    FROM re_q q CROSS JOIN re_e e WHERE e.vec_id <> q.qid)
  WHERE rn <= {k}),
re_ap AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {cos} DESC, e.vec_id ASC) AS rn
    FROM re_q q JOIN re_e e ON q.qb = e.eb WHERE e.vec_id <> q.qid)
  WHERE rn <= {k}),
re_hit AS (
  SELECT g.qid, count(*)::BIGINT AS n_hits
  FROM re_gt g JOIN re_ap a ON g.qid = a.qid AND g.vec_id = a.vec_id
  GROUP BY 1)
SELECT q.qid, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       (coalesce(h.n_hits, 0) * 1000000 // {k})::BIGINT AS recall_ppm
FROM re_q q LEFT JOIN re_hit h ON q.qid = h.qid
"""


def hard_negatives_lsh_sql(
    n_planes: int, dim: int, threshold: float, seed: int = 42
) -> str:
    """DuckDB twin of dedup.hard_negative_pairs: the
    embedding_neardup_lsh chain plus the label-inequality predicate."""
    planes = hyperplanes(n_planes, dim, seed)
    return f"""
WITH base AS (
  SELECT vec_id, label,
         ({_bucket_expr_sql(planes)})::BIGINT AS bucket,
         list_transform(embedding, x -> x::DOUBLE) AS v,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS n
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       a.label AS label_a, b.label AS label_b,
       round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.n * b.n), 6) AS cosine
FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.n * b.n) >= {threshold}
  AND a.label <> b.label
"""
