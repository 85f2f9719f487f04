"""Spark-layer tests: extraction parity vs the pure-Python oracle,
canonicalization joins, dedup, graph materialize, checkpoint resume."""

import pytest
from pyspark.sql import functions as F

from genie_spark import synth
from genie_spark.canonicalize import (
    dedup_catalog,
    dedup_triples,
    materialize_graph,
    surface_to_id,
    id_to_surface,
)
from genie_spark.constraints import TagCodes
from genie_spark.decode import DeterministicScorer, generate_for_text, top_valid_prediction
from genie_spark.extract import split_sentences, sentences_df, html_to_text, html_to_text_col
from genie_spark.pipeline import GenieExtractor, extract_pipeline
from genie_spark.tokenizer import WordTokenizer
from genie_spark.trie import trie_from_names
from genie_spark.triples import parse_linearization, format_linearization, parse_triples_col

N_PAGES = 40


@pytest.fixture(scope="module")
def catalogs():
    ents = synth.unique_entity_names(synth.make_entities())
    rels = sorted(synth.RELATIONS)
    return ents, rels


@pytest.fixture(scope="module")
def pages(spark):
    return synth.pages_df(spark, N_PAGES).cache()


def test_pages_df_matches_local(spark, pages):
    rows = {r["url"]: r for r in pages.collect()}
    local = synth.pages_local(N_PAGES)
    assert len(rows) == len(local)
    for lr in local:
        sr = rows[lr["url"]]
        assert bytes(sr["html"]) == lr["html"]
        assert sr["text"] == lr["text"]
        assert sr["lang"] == lr["lang"]


def test_sentences_df_byte_identical(spark, pages):
    """The JVM-side sentence splitter must agree byte-for-byte with the
    pure-Python twin (the per-url invariant)."""
    got = {
        (r["url"], r["sent_idx"]): r["input"]
        for r in sentences_df(pages).select("url", "sent_idx", "input").collect()
    }
    for lr in synth.pages_local(N_PAGES):
        for i, s in enumerate(split_sentences(lr["text"])):
            assert got[(lr["url"], i)] == s
    n_local = sum(len(split_sentences(r["text"])) for r in synth.pages_local(N_PAGES))
    assert len(got) == n_local


def test_html_to_text_col_matches_python(spark, pages):
    df = pages.select("url", "text", html_to_text_col(F.col("html")).alias("derived"))
    for r in df.collect():
        assert r["derived"] == r["text"], r["url"]


def test_parse_triples_col_matches_python(spark):
    lins = [
        format_linearization([("Alice Smith", "birthplace", "Zurich")]),
        format_linearization([("A", "r", "B"), ("A", "r", "B"), ("C", "q", "D")]),
        " <sub> A <rel> r <obj> B <et> <sub> C",  # trailing partial chunk
        "",
        "no tags at all",
        # hostile whitespace: tab/NBSP inside fields — both forms must
        # trim ONLY 0x20 (Spark trim semantics), keeping these bytes
        " <sub> tab\there <rel> nb\xa0sp <obj> \tlead <et>",
        " <sub> \xa0 <rel> x <obj> y <et>",  # NBSP-only field survives
    ]
    df = spark.createDataFrame([(s,) for s in lins], ["lin"]).withColumn(
        "triples", parse_triples_col(F.col("lin"))
    )
    for r in df.collect():
        got = [(t["s"], t["r"], t["o"]) for t in r["triples"]]
        assert got == parse_linearization(r["lin"])


def test_pipeline_matches_driver_oracle(spark, pages, catalogs):
    """Flagship parity: the distributed pipeline's predictions must be
    byte-identical to the single-process reference decoder run over the
    same sentences (SURVEY.md §5.2 golden test)."""
    ents, rels = catalogs
    out = extract_pipeline(spark, pages, ents, rels, num_beams=2).cache()
    got = {(r["url"], r["sent_idx"]): r for r in out.collect()}

    tok = WordTokenizer(ents + rels)
    codes = TagCodes(tok)
    ent_t, rel_t = trie_from_names(ents, tok), trie_from_names(rels, tok)
    scorer = DeterministicScorer(tok)
    n_checked = 0
    for lr in synth.pages_local(N_PAGES):
        if lr["lang"] != "en":
            assert all(u != lr["url"] for (u, _) in got)
            continue
        for i, sent in enumerate(split_sentences(lr["text"])):
            beams = generate_for_text(sent, scorer, tok, codes, ent_t, rel_t, num_beams=2)
            r = got[(lr["url"], i)]
            assert r["input"] == sent
            assert r["prediction"] == top_valid_prediction(beams)
            assert [(b["text"], b["log_prob"]) for b in r["beams"]] == [
                (b["text"], b["log_prob"]) for b in beams
            ]
            parsed = parse_linearization(r["prediction"] or "")
            assert [(t["s"], t["r"], t["o"]) for t in r["pred_triples"]] == parsed
            n_checked += 1
    assert n_checked > 20


def test_pipeline_partition_invariance(spark, pages, catalogs):
    """Same rows regardless of parallelism — the two-cluster-size
    determinism invariant at sandbox scale."""
    ents, rels = catalogs
    a = extract_pipeline(spark, pages.repartition(1), ents, rels).select(
        "url", "sent_idx", "prediction"
    )
    b = extract_pipeline(spark, pages.repartition(13), ents, rels).select(
        "url", "sent_idx", "prediction"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_extraction_recovers_gold_facts(spark, pages, catalogs):
    """Quality gate at sandbox scale: the deterministic scorer must recover
    the majority of embedded gold facts (P/R vs gold; the ≥0.95 agreement
    target is vs the reference decoder = the driver oracle, which parity
    tests cover exactly)."""
    ents, rels = catalogs
    out = extract_pipeline(spark, pages, ents, rels)
    pred = set()
    for r in out.collect():
        for t in r["pred_triples"]:
            pred.add((r["url"], t["s"], t["r"], t["o"]))
    gold = set()
    for lr in synth.pages_local(N_PAGES):
        if lr["lang"] != "en":
            continue
        for g in lr["gold"]:
            gold.add((lr["url"], g["s"], g["r"], g["o"]))
    assert gold, "fixture must embed facts"
    recall = len(pred & gold) / len(gold)
    precision = len(pred & gold) / max(len(pred), 1)
    assert recall > 0.6, f"recall {recall:.2f} too low: decoder regressed"
    assert precision > 0.5, f"precision {precision:.2f} too low"


def test_pr_agreement_with_reference_decoder(spark, pages, catalogs):
    """North-rule acceptance, computed as the north rule states it: micro
    P/R of the Spark pipeline's emitted triples vs the reference decoder's
    emitted triples must be ≥ 0.95 (BASELINE.json metric). The pipeline is
    deterministic so this lands at exactly 1.0; the assertion is the
    contract, the equality tests above explain why it holds."""
    from genie_spark.metrics import micro_metrics

    ents, rels = catalogs
    out = extract_pipeline(spark, pages, ents, rels, num_beams=2)
    spark_rows = {
        (r["url"], r["sent_idx"]): [(t["s"], t["r"], t["o"]) for t in r["pred_triples"]]
        for r in out.collect()
    }

    tok = WordTokenizer(ents + rels)
    codes = TagCodes(tok)
    ent_t, rel_t = trie_from_names(ents, tok), trie_from_names(rels, tok)
    scorer = DeterministicScorer(tok)
    rows = []
    for lr in synth.pages_local(N_PAGES):
        if lr["lang"] != "en":
            continue
        for i, sent in enumerate(split_sentences(lr["text"])):
            beams = generate_for_text(sent, scorer, tok, codes, ent_t, rel_t, num_beams=2)
            ref = parse_linearization(top_valid_prediction(beams) or "")
            rows.append(
                (
                    f"{lr['url']}#{i}",
                    spark_rows[(lr["url"], i)],
                    [tuple(t) for t in ref],
                )
            )
    df = spark.createDataFrame(
        rows,
        "id string, pred array<struct<s:string,r:string,o:string>>, "
        "target array<struct<s:string,r:string,o:string>>",
    )
    m = micro_metrics(df).collect()[0]
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m
    assert m["n_target"] > 0


# ---------------------------------------------------------------------------
# canonicalization
# ---------------------------------------------------------------------------


def test_dedup_catalog_drops_ambiguous(spark):
    ents, _ = synth.catalogs_df(spark)
    clean = dedup_catalog(ents)
    names = [r["name"] for r in clean.collect()]
    assert len(names) == len(set(names))
    dupes = {synth._CITIES[0], synth._ORGS[0]}
    assert not dupes & set(names)


def test_surface_to_id_and_back(spark):
    ents_df, rels_df = synth.catalogs_df(spark)
    triples = spark.createDataFrame(
        [
            ("u1", "Alan Aachen", "birthplace", "Lausanne"),
            ("u2", "Nope Nobody", "birthplace", "Lausanne"),  # unlinkable
            ("u3", "Alan Aachen", "not a relation", "Lausanne"),
        ],
        ["url", "s", "r", "o"],
    )
    inner = surface_to_id(triples, ents_df, rels_df, how="inner")
    rows = inner.collect()
    assert len(rows) == 1 and rows[0]["url"] == "u1"
    assert rows[0]["s_id"].startswith("Q") and rows[0]["r_id"].startswith("P")

    left = surface_to_id(triples, ents_df, rels_df, how="left")
    by_url = {r["url"]: r for r in left.collect()}
    assert by_url["u2"]["s_id"] is None and by_url["u2"]["o_id"] is not None
    assert by_url["u3"]["r_id"] is None

    back = id_to_surface(
        inner.select("s_id", "r_id", "o_id"), ents_df, rels_df
    ).collect()[0]
    assert back["s"] == "Alan Aachen" and back["o"] == "Lausanne"
    assert back["triple_status"] in ("title", "label")


def test_id_to_surface_no_match_status(spark):
    ents_df, rels_df = synth.catalogs_df(spark)
    df = spark.createDataFrame([("Q1", "P1", "QX999")], ["s_id", "r_id", "o_id"])
    row = id_to_surface(df, ents_df, rels_df).collect()[0]
    assert row["o_status"] == "no_match" and row["triple_status"] == "no_match"


def test_dedup_triples_salted_equals_plain(spark):
    rows = [("Q1", "P1", f"Q{i % 7}") for i in range(500)] + [
        ("Q2", "P2", "Q3")
    ] * 50
    df = spark.createDataFrame(rows, ["s_id", "r_id", "o_id"]).repartition(8)
    plain = sorted(map(tuple, dedup_triples(df).collect()))
    salted = sorted(map(tuple, dedup_triples(df, salt_buckets=4).collect()))
    assert plain == salted
    assert len(plain) == 8


def test_materialize_graph(spark, pages, catalogs):
    ents, rels = catalogs
    ents_df, rels_df = synth.catalogs_df(spark)
    extracted = extract_pipeline(spark, pages, ents, rels)
    graph = materialize_graph(extracted, ents_df, rels_df).cache()
    rows = graph.collect()
    assert rows
    keys = [(r["subj"], r["pred"], r["obj"]) for r in rows]
    assert len(keys) == len(set(keys))  # global dedup held
    for r in rows:
        assert r["subj"].startswith("Q") and r["pred"].startswith("P")
        assert r["n_sources"] >= 1 and r["first_url"].startswith("https://")


def test_materialize_graph_salted_equals_plain(spark, pages, catalogs):
    """salt_buckets must change the shuffle shape, never the rows."""
    ents, rels = catalogs
    ents_cat, rels_cat = synth.catalogs_df(spark)
    out = extract_pipeline(spark, pages, ents, rels).cache()
    a = sorted(map(tuple, materialize_graph(out, ents_cat, rels_cat).collect()))
    b = sorted(
        map(tuple, materialize_graph(out, ents_cat, rels_cat, salt_buckets=8).collect())
    )
    assert a == b and len(a) > 0


def test_sentence_split_twins_hostile_whitespace(spark):
    """Non-ASCII and exotic whitespace must NOT break the byte-identical
    twin invariant: Python's bare \\s matches NBSP/ideographic space
    while Java's is ASCII-only, and Spark's trim removes only 0x20 — the
    Python twin is pinned to the JVM semantics (the 100 TB path is
    canonical), verified here on inputs the synthetic corpus never
    produces."""
    from genie_spark.extract import sentences_df, split_sentences

    texts = [
        "a. b.\tc.\xa0d. e",            # NBSP after a dot: Java does NOT split
        "x.　y. z",                  # ideographic space
        "tabs.\t\tonly\t. end.",
        "nb\xa0sp. multi  space.   q",
        ". . .",
        "\t. \t.",                       # tab-only units: trim vs strip
        "v\x0bt. w",                     # vertical tab IS Java \s
        "mix.\r\ncr. lf",
    ]
    df = spark.createDataFrame(
        [(f"u{i}", t) for i, t in enumerate(texts)], ["url", "text"]
    )
    got: dict = {}
    for r in sentences_df(df, "text").select("url", "sent_idx", "input").collect():
        got.setdefault(r["url"], []).append((r["sent_idx"], r["input"]))
    for i, t in enumerate(texts):
        want = list(enumerate(split_sentences(t)))
        assert sorted(got.get(f"u{i}", [])) == want, (i, t)


def test_bounded_split_byte_identical(spark):
    """Boundary-aware split: Column fold and pure-Python twin must agree
    byte-for-byte, including suppression inside boundaries, multi-
    paragraph texts, blank candidate sentences, and the paragraph-final
    blocked flush."""
    import random

    from genie_spark.extract import (
        bounded_units_pos_col,
        sentences_bounded_df,
        split_sentences_bounded,
        split_sentences_bounded_pos,
    )

    rng = random.Random(42)
    words = ["alpha", "beta", "Dr.", "gamma", "U.S.", "delta", "x."]
    rows = []
    for i in range(60):
        n = rng.randrange(3, 30)
        text = " ".join(rng.choice(words) for _ in range(n))
        if rng.random() < 0.4:  # multi-paragraph
            cut = rng.randrange(1, len(text))
            text = text[:cut] + "\n" + text[cut:]
        bounds = []
        for _ in range(rng.randrange(0, 3)):
            s = rng.randrange(0, max(1, len(text) - 5))
            bounds.append((s, s + rng.randrange(2, 15)))
        rows.append((i, text, bounds))

    df = spark.createDataFrame(
        rows, "doc_id int, text string, boundaries array<struct<s:long,e:long>>"
    )
    got = {
        (r["doc_id"], r["sent_idx"]): r["input"]
        for r in sentences_bounded_df(df).select("doc_id", "sent_idx", "input").collect()
    }
    n_local = 0
    for i, text, bounds in rows:
        units = split_sentences_bounded(text, bounds)
        n_local += len(units)
        for j, u in enumerate(units):
            assert got[(i, j)] == u, (i, j, text, bounds)
    assert len(got) == n_local

    # the span-carrying form agrees too (unit, start, end)
    from pyspark.sql import functions as F

    got_pos = {
        r["doc_id"]: [tuple(u) for u in r["units"]]
        for r in df.select(
            "doc_id",
            bounded_units_pos_col(F.col("text"), F.col("boundaries")).alias("units"),
        ).collect()
    }
    for i, text, bounds in rows:
        assert got_pos[i] == split_sentences_bounded_pos(text, bounds), (i, text)

    # no boundaries → reduces to the plain split
    for _, text, _ in rows:
        assert split_sentences_bounded(text, []) == split_sentences(text)

    # a dot inside a boundary never ends a unit: suppressed split merges
    text = "Alice met Dr. Smith today. Then she left."
    dot = text.index("Dr.") + 3  # split point would be right after 'Dr.'
    units = split_sentences_bounded(text, [(dot - 1, dot + 4)])
    assert units[0].startswith("Alice met Dr. Smith today.")


def test_extractor_accepts_trie_artifacts(spark, tmp_path):
    """GenieExtractor(trie_artifacts=...) must produce bit-identical output
    to the build-from-names path (S10: the persisted trie is the same
    trie)."""
    from genie_spark.pipeline import GenieExtractor, extract_pipeline, save_trie_artifacts

    ents = synth.unique_entity_names(synth.make_entities())
    rels = sorted(synth.RELATIONS)
    ent_path = str(tmp_path / "ent_trie")
    rel_path = str(tmp_path / "rel_trie")
    save_trie_artifacts(ents, rels, ent_path, rel_path)

    pages = synth.pages_df(spark, 12)
    base = extract_pipeline(spark, pages, ents, rels)
    loaded = extract_pipeline(
        spark, pages, [], [],
        extractor=GenieExtractor(spark, [], [], trie_artifacts=(ent_path, rel_path)),
    )
    key = lambda df: sorted(
        (r["url"], r["sent_idx"], r["prediction"],
         tuple((b["text"], b["log_prob"]) for b in r["beams"]))
        for r in df.collect()
    )
    assert key(loaded) == key(base)


def test_worker_cache_key_hashes_full_catalog(spark):
    """Two catalogs with equal ent/rel counts and identical first-100
    sorted entity names (differing only beyond position 100) must get
    DISTINCT worker-cache keys, and the second extractor's tries must
    actually reach reused Python workers — the round-3 hazard was a
    truncated cache key silently serving stale tries."""
    rels = sorted(synth.RELATIONS)
    base = [f"Aent {i:03d}" for i in range(118)]
    ents_a = base + ["Zed Alpha", "Zed Beta"]
    ents_b = base + ["Zed Alpha", "Zed Gamma"]  # differs at sorted pos 119

    ex_a = GenieExtractor(spark, ents_a, rels, num_beams=2)
    ex_b = GenieExtractor(spark, ents_b, rels, num_beams=2)
    ka, kb = ex_a._bc.value["cache_key"], ex_b._bc.value["cache_key"]
    assert ka[:2] == kb[:2], "counts are equal by construction"
    assert ka != kb, "full-catalog hash must separate the keys"

    # distributed staleness check: run A first (warms worker caches), then
    # B over a sentence only B's catalog can ground. A stale stack could
    # never emit "Zed Gamma" (not in A's trie).
    df = spark.createDataFrame(
        [("u0", 0, "Zed Gamma birthplace Zed Alpha.")],
        ["url", "sent_idx", "input"],
    ).repartition(1)
    ex_a.transform(df).collect()
    pred_b = ex_b.transform(df).collect()[0]["prediction"]
    assert pred_b is not None and "Zed Gamma" in pred_b, pred_b


def test_pipeline_partition_invariance_with_decode_knobs(spark):
    """The reference-parity decode knobs (length_penalty=1.0 + forced BOS)
    must stay partition-invariant through the distributed mapInPandas
    path, and every prediction must still parse under the grammar."""
    from genie_spark.pipeline import GenieExtractor, extract_pipeline
    from genie_spark.triples import parse_linearization

    ents = synth.unique_entity_names(synth.make_entities())
    rels = sorted(synth.RELATIONS)
    pages = synth.pages_df(spark, 16)
    ex = GenieExtractor(spark, ents, rels, num_beams=2,
                        length_penalty=1.0, bos_first=True)
    a = extract_pipeline(spark, pages, [], [], extractor=ex, partitions=2)
    b = extract_pipeline(spark, pages.repartition(13), [], [], extractor=ex,
                         partitions=7)
    key = lambda df: sorted(
        (r["url"], r["sent_idx"], r["prediction"],
         tuple((x["text"], x["log_prob"]) for x in r["beams"]))
        for r in df.collect()
    )
    ka, kb = key(a), key(b)
    assert ka == kb and len(ka) > 0
    for _, _, pred, beams in ka:
        if pred is not None:
            for s, r, o in parse_linearization(pred):
                assert s in ents and r in rels and o in ents
        for _, lp in beams:
            assert lp <= 0.0 or lp == pytest.approx(0.0)
