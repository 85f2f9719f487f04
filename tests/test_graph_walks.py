"""Semantics tests for the round-5 graph completions: k-core peeling,
multi-source Bellman-Ford, deterministic random walks. The oracle suite
proves cross-engine exactness; these pin the graph-theoretic contracts
on small handcrafted graphs where the right answer is known by hand."""

import pytest
from pyspark.sql import functions as F

from genie_spark.datapipe.graph import (
    bellman_ford_fixed,
    kcore_fixed,
    random_walks_fixed,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_kcore_peels_tail_and_keeps_core(spark):
    # triangle a-b-c (the 2-core) with a pendant path c-d-e hanging off
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
    )
    out = {r.entity: r.core_deg for r in kcore_fixed(e, k=2, rounds=4).collect()}
    # the path peels in two rounds (e first, then d); the triangle stays
    assert out == {"a": 2, "b": 2, "c": 2}


def test_kcore_extra_rounds_are_noops(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    r2 = sorted(map(tuple, kcore_fixed(e, k=2, rounds=2).collect()))
    r8 = sorted(map(tuple, kcore_fixed(e, k=2, rounds=8).collect()))
    assert r2 == r8  # fixed unroll is convergence-safe


def test_kcore_empty_when_k_exceeds_graph(spark):
    e = _edges(spark, [("a", "b"), ("b", "c")])
    assert kcore_fixed(e, k=3, rounds=3).count() == 0


def test_bellman_ford_picks_cheaper_indirect_path(spark):
    # direct s->t costs 10; s->a->b->t costs 3 — BF must find 3, and a
    # 2-round cut (path too long) must report the direct 10
    e = spark.createDataFrame(
        [("s", "t", 10), ("s", "a", 1), ("a", "b", 1), ("b", "t", 1)],
        "src string, dst string, w int",
    )
    seeds = spark.createDataFrame([("s",)], "v string")
    d6 = {r.entity: r.dist for r in bellman_ford_fixed(e, seeds, 6, "w").collect()}
    assert d6 == {"s": 0, "a": 1, "b": 2, "t": 3}
    d1 = {r.entity: r.dist for r in bellman_ford_fixed(e, seeds, 1, "w").collect()}
    assert d1["t"] == 10  # only 1 relaxation: the long path not yet found


def test_bellman_ford_multi_source_takes_nearest_seed(spark):
    e = spark.createDataFrame(
        [("s1", "m", 5), ("s2", "m", 2)], "src string, dst string, w int"
    )
    seeds = spark.createDataFrame([("s1",), ("s2",)], "v string")
    d = {r.entity: r.dist for r in bellman_ford_fixed(e, seeds, 3, "w").collect()}
    assert d["m"] == 2


def test_bellman_ford_unit_weights_is_bfs(spark):
    e = _edges(spark, [("s", "a"), ("a", "b"), ("b", "c")])
    seeds = spark.createDataFrame([("s",)], "v string")
    d = {r.entity: r.dist for r in bellman_ford_fixed(e, seeds, 5).collect()}
    assert d == {"s": 0, "a": 1, "b": 2, "c": 3}


@pytest.fixture(scope="module")
def walk_graph(spark):
    # every vertex has 2+ out-neighbors so choices are non-trivial;
    # z is a dead-end
    return _edges(
        spark,
        [
            ("a", "b"), ("a", "c"),
            ("b", "c"), ("b", "d"),
            ("c", "a"), ("c", "d"), ("c", "z"),
            ("d", "a"), ("d", "b"),
        ],
    )


def test_walks_follow_real_edges(spark, walk_graph):
    seeds = spark.createDataFrame([("a",), ("b",)], "v string")
    rows = random_walks_fixed(walk_graph, seeds, steps=5).collect()
    edges = {(r.src, r.dst) for r in walk_graph.collect()}
    bywalk = {}
    for r in rows:
        bywalk.setdefault(r.walk_id, {})[r.step] = r.entity
    for wid, path in bywalk.items():
        assert path[0] == wid  # step 0 is the seed
        steps = sorted(path)
        assert steps == list(range(len(steps)))  # contiguous until stop
        for t in steps[1:]:
            assert (path[t - 1], path[t]) in edges  # every hop is an edge


def test_walks_deterministic_and_partition_invariant(spark, walk_graph):
    seeds = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "v string")
    one = sorted(map(tuple, random_walks_fixed(walk_graph, seeds, 5).collect()))
    two = sorted(
        map(
            tuple,
            random_walks_fixed(
                walk_graph.repartition(7), seeds.repartition(3), 5
            ).collect(),
        )
    )
    assert one == two


def test_walks_stop_at_dead_end(spark, walk_graph):
    # force a walk through z: seed z directly — step 0 exists, no step 1
    seeds = spark.createDataFrame([("z",)], "v string")
    rows = random_walks_fixed(walk_graph, seeds, steps=3).collect()
    assert [(r.step, r.entity) for r in rows] == [(0, "z")]
