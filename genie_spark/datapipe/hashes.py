"""Cross-engine deterministic hash primitives.

The correctness gate runs every query twice — PySpark and DuckDB — and
compares value hashes, so any hash an operator materializes must be
computable identically in both engines. ``h60`` is a 60-bit integer from
the first 15 hex digits of md5 (both engines agree byte-for-byte on md5;
15 hex digits keeps the value inside a signed 64-bit int):

* Spark:  ``conv(substring(md5(x), 1, 15), 16, 10) :: bigint``
* DuckDB: ``('0x' || substr(md5(x), 1, 15)) :: UBIGINT :: BIGINT``

At production scale, swap in ``xxhash64`` (JVM-intrinsic, no hex
round-trip) via ``h_fast`` — identical plan shape, not oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col: Column) -> Column:
    """60-bit deterministic hash, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def h60_salted(col: Column, salt: Column) -> Column:
    return h60(F.concat(salt.cast("string"), F.lit("\x01"), col))


def h_fast(col: Column) -> Column:
    """Production-path hash (xxhash64): ~5× cheaper than md5, JVM
    whole-stage-codegen intrinsic. Not DuckDB-reproducible."""
    return F.xxhash64(col)


def h60_sql(expr: str) -> str:
    """DuckDB twin of :func:`h60` for oracle SQL strings."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::UBIGINT::BIGINT)"


def h60_salted_sql(expr: str, salt_expr: str) -> str:
    return h60_sql(f"({salt_expr})::varchar || chr(1) || ({expr})")
