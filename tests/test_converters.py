"""REBEL / NRE / FewRel → KILT converter tests: hand-computed fixtures
exercising boundary suppression, entity/object ordering, first-occurrence
dedup, match-status roll-up, and the write_jsonl → read_kilt round-trip."""

import os

import pytest
from pyspark.sql import functions as F

from genie_spark.converters import (
    FEWREL_SCHEMA,
    NRE_SCHEMA,
    REBEL_SCHEMA,
    convert_fewrel,
    convert_nre,
    convert_rebel,
    rebel_units,
)
from genie_spark.sources import read_kilt, write_jsonl


@pytest.fixture(scope="module")
def catalogs(spark):
    ents = spark.createDataFrame(
        [
            ("Q1", "Alice Smith", "en_title"),
            ("Q2", "Zurich", "en_title"),
            ("Q3", "Dr. Smith", "en_label"),
            ("Q5", "was", "en_title"),
            # Q4 deliberately absent → no_match
        ],
        ["id", "name", "provenance"],
    )
    rels = spark.createDataFrame(
        [("P1", "birthplace", "en_title"), ("P2", "works at", "en_title")],
        ["id", "name", "provenance"],
    )
    return ents, rels


def _ent(uri, surface, s, e):
    return {"uri": uri, "surfaceform": surface, "boundaries": [s, e]}


def _triple(subj, pred_uri, pred_name, obj):
    return {"subject": subj, "predicate": {"uri": pred_uri, "surfaceform": pred_name}, "object": obj}


@pytest.fixture(scope="module")
def rebel_df(spark):
    text = "Alice Smith was born in Zurich. Dr. Smith works at Acme. Nothing here."
    alice = _ent("Q1", "Alice Smith", 0, 11)
    was = _ent("Q5", "was", 12, 15)
    zurich = _ent("Q2", "Zurich", 24, 30)
    dr = _ent("Q3", "Dr. Smith", 32, 41)  # spans the 'Dr.' split point at 36
    acme = _ent("Q4", "Acme", 51, 55)
    triples = [
        # listed object-reversed + duplicated to exercise sort & dedup
        _triple(alice, "P1", "birthplace", zurich),
        _triple(alice, "P2", "works at", was),
        _triple(alice, "P2", "works at", was),
        _triple(dr, "P2", "works at", acme),
    ]
    row = {"docid": "d0", "uri": "u0", "text": text,
           "entities": [alice, was, zurich, dr, acme], "triples": triples}
    return spark.createDataFrame([row], REBEL_SCHEMA)


def test_rebel_units_boundary_and_order(spark, rebel_df):
    rows = {r["id"]: r for r in rebel_units(rebel_df).collect()}
    assert set(rows) == {"u0-0", "u0-1"}  # 'Nothing here.' has no triples
    u0 = rows["u0-0"]
    assert u0["input"] == "Alice Smith was born in Zurich. "
    # object-boundary order ('was' at 12 before 'Zurich' at 24), dup dropped
    assert [tuple(t) for t in u0["id_triples"]] == [
        ("Q1", "P2", "Q5"),
        ("Q1", "P1", "Q2"),
    ]
    u1 = rows["u0-1"]
    # the 'Dr.' split point is suppressed: one merged unit
    assert u1["input"] == "Dr. Smith works at Acme. "
    assert [tuple(t) for t in u1["id_triples"]] == [("Q3", "P2", "Q4")]


def test_convert_rebel_statuses_and_roundtrip(spark, rebel_df, catalogs, tmp_path):
    ents, rels = catalogs
    out = convert_rebel(rebel_df, ents, rels)
    rows = {r["id"]: r for r in out.collect()}
    r0 = rows["u0-0"]
    assert r0["instance_matching_status"] == "title"
    assert r0["target"] == (
        " <sub> Alice Smith <rel> works at <obj> was <et>"
        " <sub> Alice Smith <rel> birthplace <obj> Zurich <et>"
    )
    assert [tuple(t) for t in r0["surface_triples"]] == [
        ("Alice Smith", "works at", "was"),
        ("Alice Smith", "birthplace", "Zurich"),
    ]
    r1 = rows["u0-1"]  # Q4 unmapped → no_match, null target
    assert r1["instance_matching_status"] == "no_match"
    assert r1["target"] is None

    path = str(tmp_path / "rebel_kilt")
    write_jsonl(out, path, mode="overwrite")
    back = {r["id"]: r for r in read_kilt(spark, path).collect()}
    assert set(back) == set(rows)
    for k in rows:
        for col in ("input", "target", "instance_matching_status"):
            assert back[k][col] == rows[k][col], (k, col)
        assert back[k]["id_triples"] == rows[k]["id_triples"]
        assert back[k]["surface_triples"] == rows[k]["surface_triples"]


def test_convert_nre(spark, catalogs):
    ents, rels = catalogs
    df = spark.createDataFrame(
        [
            (0, "alice born zurich", ["Q1", "P1", "Q2"]),
            (1, "unknown tail", ["Q1", "P1", "Q9"]),
            # en_label provenance + trailing 2-id remainder dropped
            (2, "two facts", ["Q1", "P1", "Q2", "Q3", "P1", "Q1", "Q1", "P1"]),
            (3, "no facts", []),
        ],
        NRE_SCHEMA,
    )
    rows = {r["id"]: r for r in convert_nre(df, ents, rels).collect()}
    assert rows["0"]["instance_matching_status"] == "title"
    assert rows["0"]["target"] == " <sub> Alice Smith <rel> birthplace <obj> Zurich <et>"
    assert rows["1"]["instance_matching_status"] == "no_match"
    assert rows["1"]["target"] is None
    r2 = rows["2"]
    assert r2["instance_matching_status"] == "label"  # Dr. Smith is en_label
    assert [tuple(t) for t in r2["id_triples"]] == [
        ("Q1", "P1", "Q2"),
        ("Q3", "P1", "Q1"),
    ]
    assert "Dr. Smith" in r2["target"]
    r3 = rows["3"]
    assert r3["id_triples"] == [] and r3["surface_triples"] == []
    assert r3["instance_matching_status"] == "title"
    assert r3["target"] == ""  # reference formats an empty triple list


def test_convert_nre_geo_pickle_roundtrip(spark, catalogs, tmp_path):
    """Geo-NRE composed path (convert_nre_geo_data2kilt.py:66-127): trip
    pickle → sample rows → KILT with annotation + the entity_tokens_mask
    metadata, round-tripped through write_jsonl."""
    import pickle

    from genie_spark.converters import convert_nre_geo, read_nre_geo_pickle

    ents, rels = catalogs
    dataset = [
        ("alice born zurich", ["Q1", "P1", "Q2"], [1, 0, 1]),
        ("unknown tail", ["Q1", "P1", "Q9"], [1, 0]),
        ("two facts plus label", ["Q1", "P1", "Q2", "Q3", "P1", "Q1"], [0, 0, 0, 1]),
    ]
    p = tmp_path / "trip_dataset.pickle"
    with open(p, "wb") as f:
        pickle.dump(dataset, f)

    df = read_nre_geo_pickle(spark, str(p))
    assert df.count() == 3
    rows = {r["id"]: r for r in convert_nre_geo(df, ents, rels).collect()}
    assert rows["0"]["instance_matching_status"] == "title"
    assert rows["0"]["target"] == " <sub> Alice Smith <rel> birthplace <obj> Zurich <et>"
    assert list(rows["0"]["entity_tokens_mask"]) == [1, 0, 1]
    assert rows["1"]["instance_matching_status"] == "no_match"
    assert rows["1"]["target"] is None
    assert rows["2"]["instance_matching_status"] == "label"
    assert list(rows["2"]["entity_tokens_mask"]) == [0, 0, 0, 1]

    out = str(tmp_path / "kilt_out")
    write_jsonl(convert_nre_geo(df, ents, rels), out, mode="overwrite")
    back = {r["id"]: r for r in read_kilt(spark, out).collect()}
    assert set(back) == {"0", "1", "2"}
    assert back["0"]["target"] == rows["0"]["target"]
    # the mask survives the jsonl round-trip (outside KILT_SCHEMA, so
    # re-read it with the mask column included)
    import pyspark.sql.functions as _F

    raw = spark.read.json(out)
    masks = {r["id"]: list(r["entity_tokens_mask"]) for r in raw.select("id", "entity_tokens_mask").collect()}
    assert masks["2"] == [0, 0, 0, 1]


def test_convert_fewrel(spark, catalogs):
    ents, rels = catalogs
    df = spark.createDataFrame(
        [
            (0, "P1", ["Alice", "visits", "Zurich"],
             {"name": "alice", "id": "Q1"}, {"name": "zurich", "id": "Q2"}),
            (1, "P2", ["doc", "works"],
             {"name": "dr", "id": "Q3"}, {"name": "alice", "id": "Q1"}),
        ],
        FEWREL_SCHEMA,
    )
    rows = {r["id"]: r for r in convert_fewrel(df, ents, rels).collect()}
    assert rows["0"]["input"] == "Alice visits Zurich"
    assert rows["0"]["instance_matching_status"] == "title"
    assert rows["0"]["target"] == " <sub> Alice Smith <rel> birthplace <obj> Zurich <et>"
    assert rows["1"]["instance_matching_status"] == "label"
    assert rows["1"]["target"] == " <sub> Dr. Smith <rel> works at <obj> Alice Smith <et>"


def _rebel_units_py(article):
    """Independent pure-Python twin of converters.rebel_units for the
    randomized cross-check (same reference semantics: span-complete
    entities ordered by start, per-entity triples ordered by object
    start, first-occurrence id dedup, empty units dropped)."""
    from genie_spark.extract import split_sentences_bounded_pos

    if not article["triples"]:
        return []
    bounds = [(e["boundaries"][0], e["boundaries"][1]) for e in article["entities"]]
    out = []
    count = 0
    for unit, s, e in split_sentences_bounded_pos(article["text"], bounds):
        ents_in = sorted(
            (en for en in article["entities"] if s < en["boundaries"][1] <= e),
            key=lambda en: en["boundaries"][0],
        )
        ids, seen = [], set()
        for en in ents_in:
            trips = sorted(
                (
                    t for t in article["triples"]
                    if t["subject"] == en
                    and s < t["subject"]["boundaries"][1] <= e
                    and s < t["object"]["boundaries"][1] <= e
                ),
                key=lambda t: t["object"]["boundaries"][0],
            )
            for t in trips:
                key = (t["subject"]["uri"], t["predicate"]["uri"], t["object"]["uri"])
                if key not in seen:
                    seen.add(key)
                    ids.append(key)
        if ids:
            out.append((f"{article['uri']}-{count}", unit, ids))
            count += 1
    return out


def test_rebel_units_randomized_vs_python_twin(spark):
    """Randomized articles (word entities with real boundary offsets,
    random subject/object triple wiring, entity names spanning dots) —
    the Spark HOF pipeline must agree exactly with the Python twin."""
    import random

    rng = random.Random(77)
    words = ["alpha", "beta", "Dr.", "gamma", "No.", "delta", "eps", "zeta"]
    articles = []
    for a in range(25):
        n = rng.randrange(6, 28)
        toks = [rng.choice(words) for _ in range(n)]
        text = " ".join(toks)
        # entities = random token spans (1-2 tokens) with char boundaries
        ents = []
        pos = 0
        spans = []
        for i, tk in enumerate(toks):
            spans.append((pos, pos + len(tk)))
            pos += len(tk) + 1
        for _ in range(rng.randrange(1, 6)):
            i = rng.randrange(n)
            j = min(n - 1, i + rng.randrange(0, 2))
            s_char, e_char = spans[i][0], spans[j][1]
            ents.append({"uri": f"Q{i}_{j}", "surfaceform": " ".join(toks[i:j+1]),
                         "boundaries": [s_char, e_char]})
        # dedup entity list by uri (struct equality needs unique objects)
        uniq = {e["uri"]: e for e in ents}
        ents = list(uniq.values())
        triples = []
        for _ in range(rng.randrange(0, 5)):
            if len(ents) < 2:
                break
            su, ob = rng.sample(ents, 2)
            triples.append({"subject": su,
                            "predicate": {"uri": f"P{rng.randrange(3)}", "surfaceform": "rel"},
                            "object": ob})
        articles.append({"docid": f"d{a}", "uri": f"u{a}", "text": text,
                         "entities": ents, "triples": triples})

    df = spark.createDataFrame(articles, REBEL_SCHEMA)
    got = {}
    for r in rebel_units(df).collect():
        got[r["id"]] = (r["input"], [tuple(t) for t in r["id_triples"]])
    want = {}
    for art in articles:
        for uid, unit, ids in _rebel_units_py(art):
            want[uid] = (unit, ids)
    assert got == want, (set(got) ^ set(want))
