#!/usr/bin/env python
"""Local twin of the driver's correctness gate, over the FULL registry.

The driver samples ~50 of the registry's queries per round, so some
entries (historically including the flagship) can go rounds without a
driver-green row. This runner closes that evidence gap: it executes
EVERY ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01 (the driver's comparison scale), compares rows /
schema / value-hash exactly like tests/test_oracle_parity.py (columns
sorted by name, floats normalized to 6dp, rows sorted), and writes
``CORRECTNESS_local_r{N}.json`` in the driver's per-query record shape.

Usage:
    python correctness_local.py --round 5 [--sf-dir /root/testdata/sf0.01]
"""

import argparse
import hashlib
import json
import math
import os
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6) + 0.0  # -0.0 -> 0.0
    if hasattr(v, "item"):
        return _norm(v.item())
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


def _hash(canon_rows):
    h = hashlib.md5()
    for r in canon_rows:
        h.update(repr(r).encode())
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: all)")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_ORACLE_SF"] = args.sf_dir
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = sorted(queries)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    results, failed = {}, []
    t_all = time.time()
    for name in names:
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            t0 = time.time()
            sdf = queries[name](spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
            if name in oracles:
                rel = con.sql(oracles[name])
                d_cols, d_rows = rel.columns, rel.fetchall()
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(
                    c.lower() for c in s_cols
                ) == sorted(c.lower() for c in d_cols)
                a, b = _canon(s_cols, s_rows), _canon(d_cols, d_rows)
                rec["hash_match"] = _hash(a) == _hash(b)
            else:  # rows-only entry (driver's weaker check)
                rec["rows_match"] = rec["spark_rows"] >= 0
                rec["schema_match"] = bool(s_cols)
                rec["hash_match"] = None
            rec["sec"] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 - record, keep going
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        results[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and (
            rec["hash_match"] is not False
        ) and rec["err"] is None
        if not ok:
            failed.append(name)
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"({rec.get('sec', '?')}s, rows={rec['spark_rows']})",
              flush=True)

    out = args.out or f"CORRECTNESS_local_r{args.round:02d}.json"
    payload = {
        "_meta": {
            "sf_dir": args.sf_dir,
            "round": args.round,
            "n_queries": len(names),
            "n_pass": len(names) - len(failed),
            "failed": failed,
            "total_sec": round(time.time() - t_all, 1),
        },
        **results,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass -> {out}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
