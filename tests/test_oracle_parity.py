"""Local twin of the driver's correctness gate: every queries() entry with
an oracle must match the DuckDB result exactly (columns sorted by name,
rows sorted, values compared after float normalization)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
# the flagship twin-oracle must be generated for the same corpus the
# Spark queries run on (the driver pins both to sf0.01; tests use sf0.001)
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style normalization: floats compared at 6dp
        return round(v, 6) + 0.0  # -0.0 → 0.0
    if hasattr(v, "item"):
        return _norm(v.item())
    return v


def _rows(df_cols, rows):
    order = sorted(range(len(df_cols)), key=lambda i: df_cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


# computed once: oracle_sql() re-runs the flagship pure-Python twin on
# every call
ORACLES = entry.oracle_sql()
QUERY_NAMES = sorted(ORACLES)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ducks, name):
    q = entry.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = ducks.sql(ORACLES[name])
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column sets differ"
    a, b = _rows(spark_cols, spark_rows), _rows(duck_cols, duck_rows)
    assert len(a) == len(b), f"{name}: row counts {len(a)} vs {len(b)}"
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert not mism, f"{name}: first mismatches {mism}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a stable schema."""
    for name in sorted(set(entry.queries()) - set(ORACLES)):
        df = entry.queries()[name](spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name
