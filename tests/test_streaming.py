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


def test_torn_batch_invisible_until_replayed(spark, tmp_path, catalogs):
    """A crash mid-overwrite leaves a batch dir without _SUCCESS (delete-
    then-write); read_stream_output must skip it — torn batches are
    uncommitted, mirroring checkpoint._clean_uncommitted."""
    ents, rels = catalogs
    pages = synth.pages_df(spark, 8)
    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "stream_out")
    # two arrivals → two committed batch dirs
    half = sorted(r["url"] for r in pages.select("url").collect())[:4]
    pages.filter(F.col("url").isin(half)).write.mode("overwrite").parquet(in_dir)
    stream_extract(spark, in_dir, out_dir, ents, rels, available_now=True)
    pages.filter(~F.col("url").isin(half)).write.mode("append").parquet(in_dir)
    stream_extract(spark, in_dir, out_dir, ents, rels, available_now=True)
    committed = _key_rows(read_stream_output(spark, out_dir))

    # simulate a torn overwrite of a NEW batch: part files, no _SUCCESS
    torn = os.path.join(out_dir, "data", "batch=999")
    os.makedirs(torn)
    src = os.path.join(out_dir, "data", "batch=0")
    part = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    import shutil

    shutil.copy(os.path.join(src, part), os.path.join(torn, part))
    assert _key_rows(read_stream_output(spark, out_dir)) == committed

    # and a torn replay of an EXISTING batch (marker deleted mid-overwrite)
    os.remove(os.path.join(src, "_SUCCESS"))
    after = _key_rows(read_stream_output(spark, out_dir))
    assert len(after) < len(committed)
    assert set(after) <= set(committed)


def test_stream_dedup_exact_cross_batch(spark, tmp_path):
    """Stateful streaming dedup: the first document of each hash ever seen
    is emitted once; duplicates within a batch AND across later batches
    (stream restarts included) are suppressed by the checkpointed state."""
    from genie_spark.streaming import stream_dedup_exact

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "dedup_out")

    batch1 = [(3, "alpha text"), (1, "alpha text"), (2, "beta text")]
    spark.createDataFrame(batch1, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(in_dir)
    stream_dedup_exact(spark, in_dir, out_dir, available_now=True)
    got1 = {r["text"]: r["keep_id"] for r in
            spark.read.parquet(out_dir + "/data").collect()}
    assert got1 == {"alpha text": 1, "beta text": 2}  # min doc_id wins in-batch

    # second arrival: one repeat (suppressed by state), one new
    batch2 = [(9, "alpha text"), (4, "gamma text")]
    spark.createDataFrame(batch2, "doc_id bigint, text string").write.mode(
        "append"
    ).parquet(in_dir)
    stream_dedup_exact(spark, in_dir, out_dir, available_now=True)
    got2 = {r["text"]: r["keep_id"] for r in
            spark.read.parquet(out_dir + "/data").collect()}
    assert got2 == {"alpha text": 1, "beta text": 2, "gamma text": 4}


def test_stream_dedup_minhash_matches_batch_candidates(spark, tmp_path):
    """Streaming near-dup must accumulate EXACTLY the batch LSH candidate
    set: after each arrival, distinct (id_a, id_b) over all emitted rows
    equals datapipe.dedup.lsh_candidate_pairs on the union corpus seen so
    far — cross-batch collisions included (a late near-duplicate pairs
    with documents from earlier batches via bucket state)."""
    from genie_spark.datapipe.dedup import lsh_candidate_pairs, minhash_signatures
    from genie_spark.streaming import stream_dedup_minhash

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "near_out")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b1 = [
        (1, base),
        (2, base + " lambda"),          # near-dup of 1
        (3, "one two three four five six seven eight nine ten"),
    ]
    b2 = [
        (9, base + " mu"),              # near-dup of 1 and 2 (arrives later)
        (4, "cat dog bird fish lion tiger bear wolf fox deer"),
    ]
    schema = "doc_id bigint, text string"

    def arrive(rows, mode):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(in_dir)

    def streamed():
        try:
            return {
                (r["id_a"], r["id_b"])
                for r in spark.read.parquet(out_dir + "/data").collect()
            }
        except Exception:
            return set()

    def batch(rows):
        sigs = minhash_signatures(spark.createDataFrame(rows, schema))
        return {
            (r["id_a"], r["id_b"])
            for r in lsh_candidate_pairs(sigs).collect()
        }

    arrive(b1, "overwrite")
    stream_dedup_minhash(spark, in_dir, out_dir, available_now=True)
    assert streamed() == batch(b1)
    assert (1, 2) in streamed()

    arrive(b2, "append")
    stream_dedup_minhash(spark, in_dir, out_dir, available_now=True)
    want = batch(b1 + b2)
    assert streamed() == want
    assert {(1, 9), (2, 9)} <= want  # cross-batch collisions via state


def test_stream_dedup_ttl_evicts_and_reports_state(spark, tmp_path):
    """The state_ttl eviction story: an aged-out hash is forgotten (its
    next fetch is emitted as new) and state_metrics exposes the seen-set
    size and removals from the query progress. TTL mode runs under a
    continuous processing-time trigger (timeouts never fire in an
    availableNow drain — guarded in the API), so each phase starts the
    checkpointed query, polls for its observable effect, and stops."""
    import time

    from genie_spark.streaming import state_metrics, stream_dedup_exact

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "dedup_out")

    def arrive(rows, mode):
        spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.mode(mode).parquet(in_dir)

    def sink_rows():
        try:
            return sorted(
                (r["text"], r["keep_id"])
                for r in spark.read.parquet(out_dir + "/data").collect()
            )
        except Exception:
            return []

    def run_until(pred, timeout_s=300):  # shared host: generous deadline
        q = stream_dedup_exact(
            spark, in_dir, out_dir, available_now=False,
            state_ttl="2 seconds", trigger_interval="300 milliseconds",
        )
        try:
            deadline = time.time() + timeout_s
            while time.time() < deadline:
                if q.exception() is not None:
                    raise AssertionError(str(q.exception()))
                if pred(q):
                    return q
                time.sleep(0.5)
            raise AssertionError("condition not reached before timeout")
        finally:
            q.stop()

    # availableNow + TTL is rejected loudly, not hung
    with pytest.raises(ValueError, match="availableNow"):
        stream_dedup_exact(
            spark, in_dir, out_dir, available_now=True, state_ttl="1 hour"
        )

    arrive([(1, "alpha text")], "overwrite")
    # capture the satisfying metrics snapshot INSIDE the predicate: by the
    # time run_until has stopped the query, later micro-batches may have
    # already TTL-evicted the row (numRowsTotal back to 0 — the r4 flake)
    seen = {}

    def alpha_state_seen(q):
        m = state_metrics(q)
        ok = (
            sink_rows() == [("alpha text", 1)]
            and m.get("numRowsTotal") == 1
            and m.get("memoryUsedBytes", 0) > 0
        )
        if ok:
            seen.update(m)
        return ok

    run_until(alpha_state_seen)
    assert seen["numRowsTotal"] == 1 and seen["memoryUsedBytes"] > 0

    # let the TTL lapse; the restarted query fires the timeout and evicts
    # the alpha hash (observable as a state-row removal). Sleep well past
    # the 2s TTL: under co-tenant load the previous query's final
    # timeout registration can land late
    time.sleep(6)
    arrive([(2, "filler text")], "append")
    run_until(
        lambda q: ("filler text", 2) in sink_rows()
        and state_metrics(q).get("numRowsRemoved", 0) >= 1
    )

    # re-fetch of alpha after eviction: treated as new (re-emitted)
    arrive([(9, "alpha text")], "append")
    run_until(
        lambda q: sink_rows()
        == [("alpha text", 1), ("alpha text", 9), ("filler text", 2)]
    )


def test_stream_page_rates_watermark_windows(spark, tmp_path):
    """Watermarked per-window page rates: a window is appended only after
    the watermark passes its end; late rows inside the tolerance still
    count; the unfinalized tail window is withheld."""
    import datetime as dt

    from genie_spark.streaming import stream_page_rates

    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "rates_out")

    def page(url, hour, minute, lang="en"):
        ts = dt.datetime(2024, 1, 1, hour, minute)
        return (url, ts, b"<html/>", "text", lang)

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    # arrival 1 (one file): hour-0 pages. Run: nothing finalizes yet.
    spark.createDataFrame(
        [page("u1", 0, 5), page("u2", 0, 20), page("u3", 0, 40, "de")], schema
    ).coalesce(1).write.mode("overwrite").parquet(in_dir)
    stream_page_rates(
        spark, in_dir, out_dir, max_files_per_trigger=None, available_now=True
    )
    # arrival 2 (one file): a LATE hour-0 row — still inside the previous
    # watermark — plus hour-3 rows that push the watermark past the hour-0
    # window end, finalizing it.
    spark.createDataFrame(
        [page("u4", 0, 55), page("u5", 3, 10), page("u6", 3, 30)], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    stream_page_rates(
        spark, in_dir, out_dir, max_files_per_trigger=None, available_now=True
    )
    got = {
        (r["win_start"].hour, r["lang"]): r["n_pages"]
        for r in spark.read.parquet(out_dir + "/data").collect()
    }
    # hour-0 windows finalized (incl. the late u4); hour-3 window withheld
    assert got == {(0, "en"): 3, (0, "de"): 1}


def test_ttl_ms_parsing_and_errors():
    from genie_spark.streaming import _ttl_ms

    assert _ttl_ms(1500) == 1500
    assert _ttl_ms("2 seconds") == 2000
    assert _ttl_ms("1.5 minutes") == 90_000
    assert _ttl_ms(" 30  days ") == 30 * 86_400_000
    import pytest as _pytest

    for bad in ("500ms", "2seconds", "1 min", "fast", "", "2 2 seconds"):
        with _pytest.raises(ValueError, match="state_ttl"):
            _ttl_ms(bad)


def test_stream_fuse_latest_matches_batch(spark, tmp_path):
    """Streaming fusion: two arrivals of timestamped assertions; the
    final emission per (s, r) must equal the batch fuse_latest of the
    full input — winner, counts, and the exact conflicted flag — and the
    second availableNow run must process only the new files."""
    import datetime

    from genie_spark.canonicalize import fuse_latest
    from genie_spark.streaming import stream_fuse_latest

    t = datetime.datetime
    in_dir, out_dir = str(tmp_path / "a_in"), str(tmp_path / "a_out")
    schema = "s string, r string, o string, ts timestamp"
    batch1 = [
        ("s1", "r", "old", t(2020, 1, 1)),
        ("s2", "r", "only", t(2020, 6, 1)),
        ("s3", "r", "a", t(2020, 1, 1)),  # within-batch conflict
        ("s3", "r", "b", t(2020, 1, 1)),
    ]
    batch2 = [
        ("s1", "r", "new", t(2021, 1, 1)),   # cross-batch conflict + win
        ("s2", "r", "only", t(2019, 1, 1)),  # older re-assertion, no flip
        ("s4", "r", "late", t(2022, 1, 1)),  # new key in batch 2
    ]
    spark.createDataFrame(batch1, schema).write.mode("overwrite").parquet(in_dir)
    stream_fuse_latest(spark, in_dir, out_dir, available_now=True)
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(in_dir)
    stream_fuse_latest(spark, in_dir, out_dir, available_now=True)

    out = spark.read.parquet(os.path.join(out_dir, "data"))
    # current graph = the emission with the highest n_assertions per key
    # (counts only grow); ties impossible since a key emits once per touch
    latest = {
        (r["s"], r["r"]): r
        for r in out.collect()
        if r["n_assertions"]
        == max(
            x["n_assertions"]
            for x in out.collect()
            if (x["s"], x["r"]) == (r["s"], r["r"])
        )
    }
    want = {
        (r["s"], r["r"]): r
        for r in fuse_latest(
            spark.createDataFrame(batch1 + batch2, schema)
        ).collect()
    }
    assert set(latest) == set(want)
    for k, w in want.items():
        got = latest[k]
        assert got["o_latest"] == w["o_latest"], k
        assert got["n_assertions"] == w["n_assertions"], k
        assert got["conflicted"] == w["conflicted"], k
        assert got["latest_ts_ms"] == int(
            w["latest_ts"].replace(tzinfo=datetime.timezone.utc).timestamp() * 1000
        ), k


def test_stream_distant_supervision_matches_batch(spark, tmp_path):
    """Streaming alignment over two document arrivals must equal the
    batch distant_supervision of the full corpus (alignment is
    per-document; union of batches == batch of union), and the second
    availableNow run must align only the new files."""
    from genie_spark.datapipe.align import distant_supervision, doc_tokens
    from genie_spark.streaming import stream_distant_supervision

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    schema = "doc_id long, text string"
    kb = spark.createDataFrame(
        [("alpha", "rel_0", "beta"), ("gamma", "rel_1", "alpha")],
        "s_name string, r string, o_name string",
    )
    batch1 = [(1, "alpha beta x"), (2, "alpha only")]
    batch2 = [(3, "gamma alpha beta"), (4, "beta gamma")]

    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream_distant_supervision(spark, in_dir, kb, out_dir, available_now=True)
    first = spark.read.parquet(out_dir + "/data").count()

    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream_distant_supervision(spark, in_dir, kb, out_dir, available_now=True)

    got = {
        tuple(r)
        for r in spark.read.parquet(out_dir + "/data")
        .select("doc_id", "s_name", "r", "o_name")
        .collect()
    }
    full = spark.createDataFrame(batch1 + batch2, schema)
    want = {
        tuple(r)
        for r in distant_supervision(doc_tokens(full), kb).collect()
    }
    assert got == want
    assert first < len(got)  # second run appended only the new docs


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Streaming sessionization: sessions spanning the batch boundary
    stay one session; the emitted closed-session log must equal the
    batch operator minus each user's still-open final session."""
    import datetime

    from genie_spark.datapipe.sampling import sessionize
    from genie_spark.streaming import stream_sessionize

    t = datetime.datetime
    in_dir, out_dir = str(tmp_path / "s_in"), str(tmp_path / "s_out")
    schema = "event_id bigint, ts timestamp, user_id bigint"
    base = t(2024, 1, 1)
    m = datetime.timedelta(minutes=1)
    batch1 = [
        (1, base, 10), (2, base + 10 * m, 10),          # A session 1
        (5, base, 20), (6, base + 10 * m, 20),          # B session 1 start
    ]
    batch2 = [
        (3, base + 120 * m, 10),                        # A session 2
        (4, base + 300 * m, 10),                        # A session 3 (open)
        (7, base + 20 * m, 20),                         # B session 1 spans!
        (8, base + 180 * m, 20),                        # B session 2 (open)
    ]
    spark.createDataFrame(batch1, schema).write.mode("overwrite").parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir, gap_minutes=30)
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir, gap_minutes=30)

    got = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["start_us"], r["end_us"], r["duration_us"]
        )
        for r in spark.read.parquet(os.path.join(out_dir, "data")).collect()
    }
    full = sessionize(
        spark.createDataFrame(batch1 + batch2, schema), gap_minutes=30
    ).collect()
    last_idx = {}
    for r in full:
        last_idx[r["user_id"]] = max(
            last_idx.get(r["user_id"], 0), r["session_idx"]
        )
    want = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["start_us"], r["end_us"], r["duration_us"]
        )
        for r in full
        if r["session_idx"] != last_idx[r["user_id"]]
    }
    assert got == want and len(want) == 3  # A:2 closed + B:1 closed


def test_stream_cms_sketch_matches_batch(spark, tmp_path):
    """Live CMS: the drained stream's final snapshot equals the batch
    cms_sketch over the full corpus (cellwise sums are batching-
    insensitive), and a restart with new files refreshes the snapshot
    incrementally (fixed-size state, no reprocessing of old files)."""
    from genie_spark.datapipe.sketches import cms_sketch
    from genie_spark.streaming import stream_cms_sketch

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "cms_out")
    docs1 = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} gamma") for i in range(40)],
        "doc_id bigint, text string",
    )
    docs1.write.mode("overwrite").parquet(in_dir)
    stream_cms_sketch(spark, in_dir, out_dir, depth=4, width=256)
    snap1 = {
        (r.j, r.b): r.cnt
        for r in spark.read.parquet(out_dir + "/data").collect()
    }
    want1 = {
        (r.j, r.b): r.cnt
        for r in cms_sketch(
            docs1.select(F.explode(F.split("text", " ")).alias("t")).filter(
                F.col("t") != ""
            ),
            "t", depth=4, width=256,
        ).collect()
    }
    assert snap1 == want1 and len(snap1) > 0

    docs2 = spark.createDataFrame(
        [(100 + i, f"delta epsilon w{i % 5}") for i in range(25)],
        "doc_id bigint, text string",
    )
    docs2.write.mode("append").parquet(in_dir)
    stream_cms_sketch(spark, in_dir, out_dir, depth=4, width=256)
    snap2 = {
        (r.j, r.b): r.cnt
        for r in spark.read.parquet(out_dir + "/data").collect()
    }
    alltok = (
        docs1.unionByName(docs2)
        .select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    want2 = {
        (r.j, r.b): r.cnt
        for r in cms_sketch(alltok, "t", depth=4, width=256).collect()
    }
    assert snap2 == want2
    assert sum(snap2.values()) > sum(snap1.values())
