#!/usr/bin/env python
"""CLI for the REBEL / NRE / FewRel → KILT converters — the Spark
counterpart of the reference's convert_*_data2kilt.py scripts
(reference: genie/datamodule/initial_preprocessing/, driven per split by
argparse there too).

    python convert_datasets.py --format rebel \
        --input data/rebel/en_train.jsonl \
        --ent-catalog catalogs/ent.jsonl --rel-catalog catalogs/rel.jsonl \
        --output out/en_train_kilt

Inputs are JSONL with the explicit per-format schemas (REBEL_SCHEMA /
NRE_SCHEMA / FEWREL_SCHEMA — no inference scan); catalogs are the
engine's {wikidata_id, information{en_title,en_label}} JSONL read by
``read_catalog``. Output is KILT JSONL readable by ``read_kilt``.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--format", choices=["rebel", "nre", "nre_geo", "fewrel"], required=True
    )
    ap.add_argument(
        "--input", required=True,
        help="raw dataset JSONL (nre_geo: the trip-split .pickle)",
    )
    ap.add_argument("--ent-catalog", required=True)
    ap.add_argument("--rel-catalog", required=True)
    ap.add_argument("--output", required=True, help="KILT JSONL directory")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from genie_spark.converters import (
        FEWREL_SCHEMA,
        NRE_SCHEMA,
        REBEL_SCHEMA,
        convert_fewrel,
        convert_nre,
        convert_nre_geo,
        convert_rebel,
        read_nre_geo_pickle,
    )
    from genie_spark.sources import read_catalog, write_jsonl

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("genie-spark-convert")
        .config("spark.sql.shuffle.partitions", str(max(2 * args.cpus, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    ents = read_catalog(spark, args.ent_catalog)
    rels = read_catalog(spark, args.rel_catalog)
    if args.format == "nre_geo":
        raw = read_nre_geo_pickle(spark, args.input)
        out = convert_nre_geo(raw, ents, rels)
    else:
        schema, convert = {
            "rebel": (REBEL_SCHEMA, convert_rebel),
            "nre": (NRE_SCHEMA, convert_nre),
            "fewrel": (FEWREL_SCHEMA, convert_fewrel),
        }[args.format]
        raw = spark.read.schema(schema).json(args.input)
        out = convert(raw, ents, rels)
    write_jsonl(out, args.output, mode="overwrite")
    n = spark.read.json(args.output).count()
    print(json.dumps({"format": args.format, "rows_written": n, "output": args.output}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
