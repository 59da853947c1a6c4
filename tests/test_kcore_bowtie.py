"""Semantic tests for the dense-core / reachability gates: k-core
peeling vs a pure-Python replay, the max_iter convergence guard,
bow-tie classification on a hand-built graph, and partitioning
invariance for the image aspect-ratio batch packer (the property a
1000-executor repack job relies on when input layout is arbitrary)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.operators.graph import bfs_layers, k_core


def _py_kcore(edges, k):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < k}
        if not drop:
            return {n: len(adj[n] & alive) for n in alive}
        alive -= drop


# a 4-clique core with a peel chain hanging off it: c-d-e peel one at
# a time (deg 1 after the previous peel), exercising >= 3 rounds
_EDGES = [
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # 4-clique
    (4, 5), (5, 6), (6, 7),                          # chain peels inward
]


def test_k_core_matches_python_replay(spark):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    got = {r.node: r.deg for r in k_core(df, k=2).collect()}
    assert got == _py_kcore(_EDGES, 2)
    # k=3 keeps exactly the clique at degree 3 each
    got3 = {r.node: r.deg for r in k_core(df, k=3).collect()}
    assert got3 == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_empty_when_over_degeneracy(spark):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    assert k_core(df, k=4).count() == 0


def test_k_core_raises_on_max_iter_exhaustion(spark):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(df, k=2, max_iter=1)


def test_k_core_partitioning_invariance(spark):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    a = sorted(map(tuple, k_core(df, k=2).collect()))
    b = sorted(map(tuple, k_core(df.repartition(7), k=2).collect()))
    assert a == b


def _bowtie_classes(spark, edges, pivot, depth):
    df = spark.createDataFrame(edges, "u long, v long").localCheckpoint()
    seeds = spark.createDataFrame([(pivot,)], "node long")
    fwd = {r.node for r in bfs_layers(df, seeds, src="u", dst="v", max_depth=depth).collect()}
    bwd = {r.node for r in bfs_layers(df, seeds, src="v", dst="u", max_depth=depth).collect()}
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    out = {}
    for n in nodes:
        if n in fwd and n in bwd:
            out[n] = "CORE"
        elif n in bwd:
            out[n] = "IN"
        elif n in fwd:
            out[n] = "OUT"
        else:
            out[n] = "OTHER"
    return out


def test_bowtie_hand_graph(spark):
    # 10 -> 1 <-> 2 <-> 3 -> 20 ; 30-40 disconnected: pivot 1
    edges = [(10, 1), (1, 2), (2, 1), (2, 3), (3, 2), (3, 20), (30, 40)]
    got = _bowtie_classes(spark, edges, pivot=1, depth=5)
    assert got == {
        1: "CORE", 2: "CORE", 3: "CORE",
        10: "IN", 20: "OUT", 30: "OTHER", 40: "OTHER",
    }


def test_bowtie_depth_cap_respected(spark):
    # chain 1 -> 2 -> 3 -> 4: at depth 1 only node 2 is OUT-reachable
    edges = [(1, 2), (2, 3), (3, 4)]
    got = _bowtie_classes(spark, edges, pivot=1, depth=1)
    assert got == {1: "CORE", 2: "OUT", 3: "OTHER", 4: "OTHER"}


def test_aspect_packing_partitioning_invariance(spark):
    from vbpl_web_crawl_spark.plans.queries import get_queries

    q = get_queries()["image_aspect_batch_packing"]
    base = sorted(map(tuple, q(spark, "/root/testdata/sf0.001").collect()))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = sorted(map(tuple, q(spark, "/root/testdata/sf0.001").collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == again
    # every batch is within budget + one image (first-fit-by-prefix bound)
    for row in base:
        d = dict(zip([f for f in q(spark, "/root/testdata/sf0.001").columns], row))
        assert d["n_batches"] >= 1
        assert d["max_batch_px"] < (1 << 22) + 1535 * 1535
