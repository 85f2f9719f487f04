"""Metric aggregations vs hand-computed values (reference semantics:
genie/metrics/*, genie/utils/evaluators.py)."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType,
)

from genie_spark.kilt import (
    drop_ignored_relations,
    filter_matching_status,
    filter_relations_drop,
    filter_relations_keep,
)
from genie_spark.metrics import (
    bootstrap_micro,
    bucket_metrics,
    macro_metrics,
    micro_metrics,
    per_relation_metrics,
    relation_coverage,
    relation_occurrences,
    zero_shot_metrics,
)

TRIPLE = StructType(
    [StructField("s", StringType()), StructField("r", StringType()), StructField("o", StringType())]
)
SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("pred", ArrayType(TRIPLE)),
        StructField("target", ArrayType(TRIPLE)),
    ]
)


def t(*parts):
    return tuple(parts)


@pytest.fixture(scope="module")
def eval_df(spark):
    rows = [
        # sample 1: pred {A,B}, target {A,C} → correct 1
        (1, [t("s1", "ra", "o1"), t("s2", "rb", "o2")], [t("s1", "ra", "o1"), t("s3", "rc", "o3")]),
        # sample 2: exact match incl. duplicate pred collapsing
        (2, [t("s4", "ra", "o4"), t("s4", "ra", "o4")], [t("s4", "ra", "o4")]),
        # sample 3: empty pred, nonempty target
        (3, [], [t("s5", "rb", "o5")]),
        # sample 4: both empty
        (4, [], []),
    ]
    return spark.createDataFrame(rows, SCHEMA).cache()


def test_micro_metrics(spark, eval_df):
    row = micro_metrics(eval_df).collect()[0]
    # correct=2, pred=3, target=4
    assert row["n_correct"] == 2 and row["n_pred"] == 3 and row["n_target"] == 4
    assert row["precision"] == pytest.approx(2 / 3)
    assert row["recall"] == pytest.approx(0.5)
    p, r = 2 / 3, 0.5
    assert row["f1"] == pytest.approx(2 * p * r / (p + r))


def test_micro_zero_division(spark):
    # reference semantics: empty denominator → 0.0 (triplet_set_recall.py:48-52)
    df = spark.createDataFrame([(1, [], [])], SCHEMA)
    row = micro_metrics(df).collect()[0]
    assert row["precision"] == 0.0 and row["recall"] == 0.0 and row["f1"] == 0.0
    df2 = spark.createDataFrame([(1, [t("a", "r", "b")], [])], SCHEMA)
    row2 = micro_metrics(df2).collect()[0]
    assert row2["precision"] == 0.0 and row2["recall"] == 0.0 and row2["f1"] == 0.0


def test_per_relation_and_macro(spark, eval_df):
    per = {r["rel"]: r for r in per_relation_metrics(eval_df).collect()}
    # ra: correct 2 (s1,s4), pred 2, target 2 → P=R=F1=1
    assert per["ra"]["precision"] == 1.0 and per["ra"]["recall"] == 1.0
    # rb: pred 2 (s2,s5-pred? no: sample3 pred empty) → pred {s2-rb}, target {s5-rb}, correct 0
    assert per["rb"]["n_pred"] == 1 and per["rb"]["n_target"] == 1 and per["rb"]["n_correct"] == 0
    # rc: pred 0, target 1 → P=0 (other side nonempty), R=0
    assert per["rc"]["precision"] == 0.0 and per["rc"]["recall"] == 0.0
    macro = macro_metrics(eval_df).collect()[0]
    assert macro["n_relations"] == 3
    assert macro["macro_f1"] == pytest.approx((1.0 + 0.0 + 0.0) / 3)


def test_bucket_metrics(spark, eval_df):
    train = spark.createDataFrame(
        [("ra", 8), ("rb", 2)], ["rel", "count"]
    )  # ra → bucket 3, rb → bucket 1, rc unseen → -1
    rows = {r["bucket"]: r for r in bucket_metrics(eval_df, train).collect()}
    assert set(rows) == {3, 1, -1}
    assert rows[3]["precision"] == 1.0
    assert rows[-1]["n_target"] == 1 and rows[-1]["recall"] == 0.0


def test_zero_shot_metrics(spark, eval_df):
    groups = spark.createDataFrame(
        [("ra", "seen"), ("rc", "dropped")], ["rel", "group"]
    )  # rb missing → defaults to seen
    rows = {r["group"]: r for r in zero_shot_metrics(eval_df, groups).collect()}
    assert set(rows) == {"seen", "dropped"}
    assert rows["dropped"]["n_target"] == 1 and rows["dropped"]["n_pred"] == 0
    assert rows["seen"]["n_correct"] == 2


def test_bootstrap_micro_deterministic(spark, eval_df):
    a = {r["metric"]: (r["mean"], r["std"]) for r in bootstrap_micro(eval_df, n_runs=20).collect()}
    b = {r["metric"]: (r["mean"], r["std"]) for r in bootstrap_micro(eval_df, n_runs=20).collect()}
    assert a == b
    assert set(a) == {"precision", "recall", "f1"}
    for m, (mean, std) in a.items():
        assert 0.0 <= mean <= 1.0 and std >= 0.0 and not math.isnan(std)


def test_relation_occurrences_and_coverage(spark, eval_df):
    occ = {r["rel"]: r["count"] for r in relation_occurrences(eval_df, "target").collect()}
    assert occ == {"ra": 2, "rb": 1, "rc": 1}
    cov = sorted(r["rel"] for r in relation_coverage(eval_df).collect())
    assert cov == ["rc"]  # rc in targets, never predicted; rb IS predicted


# ---------------------------------------------------------------------------
# KILT filters
# ---------------------------------------------------------------------------

KILT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("instance_matching_status", StringType()),
        StructField("surface_triples", ArrayType(TRIPLE)),
        StructField("target", StringType()),
    ]
)


@pytest.fixture(scope="module")
def kilt_df(spark):
    rows = [
        (1, "title", [t("a", "r1", "b")], ""),
        (2, "label", [t("a", "r2", "b")], ""),
        (3, "no_match", [t("a", "r1", "b"), t("c", "r3", "d")], ""),
        (4, "title", [t("a", "r3", "b")], ""),
    ]
    return spark.createDataFrame(rows, KILT_SCHEMA).cache()


def test_filter_matching_status(spark, kilt_df):
    assert {r["id"] for r in filter_matching_status(kilt_df).collect()} == {1, 4}
    both = filter_matching_status(kilt_df, ("title", "label"))
    assert {r["id"] for r in both.collect()} == {1, 2, 4}


def test_filter_relations_drop_keep(spark, kilt_df):
    assert {r["id"] for r in filter_relations_drop(kilt_df, ["r3"]).collect()} == {1, 2}
    assert {r["id"] for r in filter_relations_keep(kilt_df, ["r1", "r3"]).collect()} == {1, 3, 4}


def test_drop_ignored_relations_relinearizes(spark, kilt_df):
    out = {r["id"]: r for r in drop_ignored_relations(kilt_df, ["r3"]).collect()}
    assert set(out) == {1, 2, 3}  # sample 4 became empty → dropped (F5)
    assert [tuple(x) for x in out[3]["surface_triples"]] == [("a", "r1", "b")]
    assert out[3]["target"] == " <sub> a <rel> r1 <obj> b <et>"


def test_per_relation_counts_null_and_separator_fields(spark):
    """Rel derivation must come from the struct field for ALL
    contributions: a NULL field or a field containing the key separator
    must neither split one relation's counts across groups nor make
    n_correct exceed n_pred."""
    from genie_spark.metrics import per_relation_metrics

    def t(s, r, o):
        return {"s": s, "r": r, "o": o}

    rows = [
        # rel containing the separator, present in both sides
        (1, [t("a", "x␞y", "b")], [t("a", "x␞y", "b")]),
        # NULL object: distinct structs that a NULL-skipping key would
        # collide; only one is shared
        (2, [t("a", "rel", None), t("a", None, "rel")], [t("a", "rel", None)]),
    ]
    df = spark.createDataFrame(
        rows, "id int, pred array<struct<s:string,r:string,o:string>>, "
        "target array<struct<s:string,r:string,o:string>>"
    )
    out = {r["rel"]: r for r in per_relation_metrics(df).collect()}
    assert out["x␞y"]["n_correct"] == 1 and out["x␞y"]["n_pred"] == 1
    assert out["rel"]["n_correct"] == 1 and out["rel"]["n_pred"] == 1
    for r in out.values():
        assert r["n_correct"] <= r["n_pred"]
        assert r["n_correct"] <= r["n_target"] + r["n_pred"]  # sanity


def test_multinomial_bootstrap_exact_totals(spark):
    """The multinomial mode must resample EXACTLY n datapoints per run
    (the reference's random.choices(range(n), k=n) invariant) — verified
    by replicating the deterministic hash draws in pure Python and
    comparing per-run weighted totals against a hand-computed resample."""
    import hashlib

    from genie_spark.metrics import bootstrap_micro_multinomial

    def t(s, r, o):
        return {"s": s, "r": r, "o": o}

    rows = [
        (1, [t("a", "r", "b")], [t("a", "r", "b")]),
        (2, [t("c", "r", "d")], []),
        (3, [], [t("e", "r", "f")]),
        (4, [t("g", "r", "h"), t("i", "r", "j")], [t("g", "r", "h")]),
    ]
    df = spark.createDataFrame(
        rows, "id int, pred array<struct<s:string,r:string,o:string>>, "
        "target array<struct<s:string,r:string,o:string>>"
    )
    n, n_runs = len(rows), 7
    got = {r["metric"]: (r["mean"], r["std"]) for r in
           bootstrap_micro_multinomial(df, n_runs=n_runs).collect()}

    # pure-Python twin of the hash draws + estimator
    from genie_spark.datapipe.hashes import (
        MINHASH_M31,
        _LO_MASK,
        _MIX_A,
        _MIX_B,
        _MIX_C,
    )

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def mix(h, r):
        a = (_MIX_A * (2 * r + 1)) % MINHASH_M31 + 1
        b = (_MIX_B * (2 * r + 1)) % MINHASH_M31 + 1
        return ((a * (h >> 30) + _MIX_C) % MINHASH_M31) * (1 << 31) + (
            (b * (h & _LO_MASK) + _MIX_C) % MINHASH_M31
        )

    per_sample = {1: (1, 1, 1), 2: (0, 1, 0), 3: (0, 0, 1), 4: (1, 2, 1)}
    # ids sorted -> j = id-1
    stats = {"precision": [], "recall": [], "f1": []}
    for run in range(n_runs):
        picks = [mix(h60(str(j)), run) % n for j in range(n)]
        assert len(picks) == n  # exact per-run total
        c = sum(per_sample[p + 1][0] for p in picks)
        p_ = sum(per_sample[p + 1][1] for p in picks)
        tt = sum(per_sample[p + 1][2] for p in picks)
        prec = 0.0 if p_ == 0 else c / p_
        rec = 0.0 if tt == 0 else c / tt
        f1 = 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
        stats["precision"].append(prec)
        stats["recall"].append(rec)
        stats["f1"].append(f1)

    import statistics

    for m, vals in stats.items():
        assert got[m][0] == pytest.approx(statistics.mean(vals))
        assert got[m][1] == pytest.approx(statistics.stdev(vals))  # sample std


def test_sequence_nll_forced_scoring():
    """A9 — sequence_nll must (a) reproduce the reference loss formula
    (label_smoothed_nll_loss, utils.py:6-54) from its own per-step
    log-probs, and (b) prefer the decoder's own top beam over a
    corrupted target (the confidence-signal property)."""
    import math

    from genie_spark.constraints import TagCodes
    from genie_spark.decode import (
        DeterministicScorer,
        _log_softmax,
        generate_for_text,
        sequence_nll,
        top_valid_prediction,
    )
    from genie_spark.tokenizer import WordTokenizer
    from genie_spark.trie import trie_from_names

    ents = sorted(["Alice", "Zurich", "Berlin"])
    rels = sorted(["born", "dux"])
    tok = WordTokenizer(ents + rels)
    codes = TagCodes(tok)
    ent_t, rel_t = trie_from_names(ents, tok), trie_from_names(rels, tok)
    scorer = DeterministicScorer(tok)

    text = "Alice born Zurich."
    beams = generate_for_text(text, scorer, tok, codes, ent_t, rel_t, num_beams=2)
    pred = top_valid_prediction(beams)
    ids = tok.encode_pieces(pred) + [tok.eos_token_id]
    nll, smooth, n, loss = sequence_nll(
        text, ids, scorer, tok, codes, ent_t, rel_t, epsilon=0.1
    )
    assert n == len(ids) and nll > 0 and smooth > nll
    # formula: loss = ((1-eps)*nll + eps/(V-1)*smooth) / n
    v = len(tok)
    assert loss == pytest.approx(((0.9 * nll) + (0.1 / (v - 1)) * smooth) / n)

    # corrupted target (swap the object to a worse-matching entity) must
    # score a higher per-token NLL than the decoder's own choice
    worse = pred.replace("Zurich", "Berlin")
    if worse != pred:
        ids2 = tok.encode_pieces(worse) + [tok.eos_token_id]
        nll2, _, n2, _ = sequence_nll(
            text, ids2, scorer, tok, codes, ent_t, rel_t
        )
        assert nll2 / n2 > nll / n

    # manual twin of the first step's contribution
    ctx = scorer.context(text)
    from genie_spark.constraints import DecodeState

    st = DecodeState(codes, ent_t, rel_t)
    lps = _log_softmax(scorer.score(ctx, [], st, list(range(len(tok))), ptr=0))
    first_nll, *_ = sequence_nll(
        text, ids[:1], scorer, tok, codes, ent_t, rel_t
    )
    assert first_nll == pytest.approx(-lps[ids[0]])
    assert not math.isnan(loss)


def test_evaluation_runner_matches_metric_modules(spark):
    """evaluate_micro/evaluate_macro/evaluate_dataset (the reference's
    get_metrics + evaluator shapes) must agree with the underlying metric
    aggregations, honor relation restriction on both sides, and use the
    target-occurring averaging set for macro."""
    from genie_spark.evaluation import evaluate_dataset, evaluate_macro, evaluate_micro
    from genie_spark.metrics import micro_metrics

    def t(s, r, o):
        return {"s": s, "r": r, "o": o}

    rows = [
        (1, [t("a", "r1", "b"), t("x", "halluc", "y")], [t("a", "r1", "b")]),
        (2, [t("c", "r2", "d")], [t("c", "r2", "d"), t("e", "r2", "f")]),
        (3, [], [t("g", "r3", "h")]),
    ]
    df = spark.createDataFrame(
        rows, "id int, pred array<struct<s:string,r:string,o:string>>, "
        "target array<struct<s:string,r:string,o:string>>"
    )

    micro = evaluate_micro(df)
    base = micro_metrics(df).first()
    assert micro == {"precision": base["precision"], "recall": base["recall"],
                     "f1": base["f1"]}

    # restriction applies to BOTH sides (evaluation.py:34-36)
    only_r1 = evaluate_micro(df, relations_to_consider=["r1"])
    assert only_r1["precision"] == 1.0 and only_r1["recall"] == 1.0

    macro, per_rel = evaluate_macro(df)
    rels = {r["rel"] for r in per_rel.collect()}
    assert rels == {"r1", "r2", "r3"}  # 'halluc' (pred-only) excluded
    assert macro["recall"] == pytest.approx((1.0 + 0.5 + 0.0) / 3)

    boot = evaluate_micro(df, num_bootstrap_samples=5)
    for m, (mean, std) in boot.items():
        assert 0.0 <= mean <= 1.0 and std >= 0.0

    ds = evaluate_dataset(df, num_bootstrap_samples=5)
    assert set(ds) == {"micro", "macro"}


def test_calibration_bins_exact(spark):
    """Reliability-diagram binning: bin edges, floor-ppm means, |gap|,
    and the top-edge clamp (conf_ppm == 1e6 lands in the last bin)."""
    from genie_spark.metrics import calibration_bins

    rows = [
        (50_000, 100_000),     # bin 0
        (149_999, 200_000),    # bin 1
        (150_000, 100_000),    # bin 1
        (1_000_000, 999_999),  # clamped to bin 9
    ]
    df = spark.createDataFrame(rows, ["conf_ppm", "acc_ppm"])
    got = {r["bin"]: r for r in calibration_bins(df, bins=10).collect()}
    assert set(got) == {0, 1, 9}
    assert got[0]["n_samples"] == 1 and got[0]["gap_ppm"] == 50_000
    b1 = got[1]
    assert b1["n_samples"] == 2
    assert b1["mean_conf_ppm"] == (149_999 + 150_000) // 2
    assert b1["mean_acc_ppm"] == 150_000
    assert b1["gap_ppm"] == abs(b1["mean_conf_ppm"] - b1["mean_acc_ppm"])
    assert got[9]["mean_acc_ppm"] == 999_999


def test_calibration_bins_rejects_bad_bins():
    from genie_spark.metrics import calibration_bins

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bins"):
        calibration_bins(None, bins=7)
