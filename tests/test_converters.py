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
