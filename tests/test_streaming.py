"""Streaming (continuous-crawl) mode: availableNow micro-batches must
produce exactly the batch pipeline's rows, and a restart must not re-read
processed files."""

import os

import pytest
from pyspark.sql import functions as F

from genie_spark import synth
from genie_spark.pipeline import extract_pipeline
from genie_spark.streaming import read_stream_output, stream_extract

N_PAGES = 24


@pytest.fixture(scope="module")
def catalogs():
    ents = synth.unique_entity_names(synth.make_entities())
    rels = sorted(synth.RELATIONS)
    return ents, rels


def _key_rows(df):
    return sorted(
        (r["url"], r["sent_idx"], r["prediction"])
        for r in df.select("url", "sent_idx", "prediction").collect()
    )


def test_stream_matches_batch_and_resumes(spark, tmp_path, catalogs):
    ents, rels = catalogs
    pages = synth.pages_df(spark, N_PAGES)
    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "stream_out")

    # first half arrives
    half = sorted(r["url"] for r in pages.select("url").collect())
    half = half[: len(half) // 2]
    first = pages.filter(F.col("url").isin(half))
    first.write.mode("overwrite").parquet(in_dir)
    stream_extract(spark, in_dir, out_dir, ents, rels, available_now=True)
    got1 = _key_rows(read_stream_output(spark, out_dir))
    want1 = _key_rows(extract_pipeline(spark, first, ents, rels))
    assert got1 == want1 and len(got1) > 0

    # more files arrive; restart processes ONLY the new ones (offset log),
    # and the union equals the full batch run
    rest = pages.filter(~F.col("url").isin(half))
    rest.write.mode("append").parquet(in_dir)
    stream_extract(spark, in_dir, out_dir, ents, rels, available_now=True)
    got2 = _key_rows(read_stream_output(spark, out_dir))
    want2 = _key_rows(extract_pipeline(spark, pages, ents, rels))
    assert got2 == want2
    assert len(got2) > len(got1)
