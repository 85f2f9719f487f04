"""BPE merge learning (datapipe/vocab.py): hand-verified merges on a
tiny corpus, partition invariance (the loop is pure distributed plans),
and the documented two-pass overlap semantics."""

from pyspark.sql import functions as F

from genie_spark.datapipe.vocab import bpe_learn_merges, word_freq


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_bpe_hand_verified_merges(spark):
    # corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3 — the
    # Sennrich et al. running example. Pair counts, round 1:
    #   (e,s): newest 6 + widest 3 = 9   <- argmax
    #   (s,t): 9, but (e,s) < (s,t) lexicographically on ties? counts
    #   equal (9, 9): tiebreak left asc -> ('e','s') wins.
    docs = _docs(
        spark,
        ["low " * 5 + ("lower " * 2) + ("newest " * 6) + ("widest " * 3)],
    )
    rows = bpe_learn_merges(docs, merges=3).collect()
    got = [(r.step, r.left, r.right, r.merged, r.pair_cnt) for r in rows]
    assert got[0] == (1, "e", "s", "es", 9)
    assert got[1] == (2, "es", "t", "est", 9)
    # round 3: remaining top pairs: (l,o) low+lower = 7, (o,w) = 7;
    # tiebreak -> (l,o)
    assert got[2] == (3, "l", "o", "lo", 7)


def test_bpe_partition_invariant(spark):
    texts = [f"token{i % 9} merge pair pair merge" for i in range(50)]
    one = [tuple(r) for r in bpe_learn_merges(_docs(spark, texts), 4).collect()]
    two = [
        tuple(r)
        for r in bpe_learn_merges(_docs(spark, texts).repartition(13), 4).collect()
    ]
    assert one == two


def test_bpe_two_pass_handles_adjacent_occurrences(spark):
    # "abab": after merging (a,b) the sequence must become "ab ab" in
    # ONE round — the second replace pass catches the occurrence whose
    # leading space the first pass consumed
    docs = _docs(spark, ["abab abab abab"])
    rows = bpe_learn_merges(docs, merges=2).collect()
    assert (rows[0].left, rows[0].right) == ("a", "b")
    # round 2's top pair is then (ab, ab) — only possible if BOTH ab
    # symbols materialized in round 1
    assert (rows[1].left, rows[1].right) == ("ab", "ab")


def test_word_freq_counts(spark):
    docs = _docs(spark, ["a b a", "b  c"])
    wf = {r.word: r.cnt for r in word_freq(docs).collect()}
    assert wf == {"a": 2, "b": 2, "c": 1}


def test_bpe_encode_stats_and_word_boundary(spark):
    from genie_spark.datapipe.vocab import bpe_encode_stats

    # "ab" is the only merge; "a b" as SEPARATE words must NOT merge
    # across the boundary sentinel
    docs = _docs(spark, ["abab abab", "a b a b"])
    mt = bpe_learn_merges(docs, merges=1)
    row = bpe_encode_stats(docs, mt, merges=1).collect()[0]
    # doc1: 8 chars -> 4 "ab" symbols; doc2: 4 single chars unchanged
    assert row.n_docs == 2
    assert row.n_symbols_before == 12
    assert row.n_symbols_after == 8
    assert row.compression_ppm == 666666
