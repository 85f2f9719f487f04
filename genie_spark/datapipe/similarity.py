"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline: one scan, row-local
arithmetic (zip_with/aggregate — JVM codegen, no Python), then a global
top-k (Spark's TakeOrdered — no full sort). The scale path is
hyperplane-LSH bucketing: each vector gets a deterministic b-bit bucket;
a query probes only its bucket (and optionally hamming-1 neighbors), so
the scan cost drops by ~2^b while recall stays high for near-duplicate
search. Hyperplane coefficients are seeded literals generated once (same
constants inlined into the DuckDB oracle → bit-identical buckets).

An IVF variant at production scale would k-means the corpus and bucket by
nearest centroid — same plan shape (bucket column + per-bucket scan), so
the LSH form here is the representative implementation.
"""

from __future__ import annotations

import hashlib
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
    qlit = F.array(*[F.lit(float(x)) for x in query])
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
                F.array(*[F.lit(float(c)) for c in coeffs]),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def bucketed_embeddings(
    emb: DataFrame,
    n_planes: int = 4,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(n_planes, dim, seed)
    return emb.withColumn("bucket", hyperplane_bucket_col(F.col(vec_col), planes))


def lsh_topk(
    emb: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Scale-path ANN: probe only the query's hyperplane bucket. With
    2^n_planes buckets the scan shrinks ~2^n_planes× (partition pruning
    applies when the table is written bucketed/partitioned by `bucket`)."""
    dim = len(query)
    planes = hyperplanes(n_planes, dim, seed)
    qbucket = 0
    for p, coeffs in enumerate(planes):
        if sum(c * float(x) for c, x in zip(coeffs, query)) > 0:
            qbucket |= 1 << p
    bucketed = emb.withColumn("bucket", hyperplane_bucket_col(F.col(vec_col), planes))
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return (
        bucketed.filter(F.col("bucket") == qbucket)
        .select(
            F.col(id_col),
            F.lit(qbucket).alias("bucket"),
            F.round(cosine_col(F.col(vec_col), qlit), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


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


def lsh_topk_sql(
    query: Sequence[float], k: int, n_planes: int, dim: int, seed: int = 42
) -> str:
    planes = hyperplanes(n_planes, dim, seed)
    qbucket = 0
    for p, coeffs in enumerate(planes):
        if sum(c * float(x) for c, x in zip(coeffs, query)) > 0:
            qbucket |= 1 << p
    q = _q_vec_sql(query)
    bucket_terms = []
    for p, coeffs in enumerate(planes):
        plane = "[" + ", ".join(f"{float(c)!r}" for c in coeffs) + "]"
        bucket_terms.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(embedding, {plane}),"
            f" p -> p[1]::DOUBLE * p[2])) > 0 THEN {1 << p} ELSE 0 END)"
        )
    bucket_expr = " + ".join(bucket_terms)
    return f"""
WITH b AS (
  SELECT vec_id, embedding, ({bucket_expr})::BIGINT AS bucket FROM embeddings
)
SELECT vec_id, bucket,
       round(list_sum(list_transform(list_zip(embedding, {q}),
                                     p -> p[1]::DOUBLE * p[2]::DOUBLE))
             / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform({q}, x -> x * x)))), 6) AS cosine
FROM b WHERE bucket = {qbucket}
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""
