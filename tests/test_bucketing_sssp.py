"""Semantic tests for the bucketed co-located join (Exchange-free
join plan, layout-independent results) and weighted SSSP (Dijkstra
replay, parallel-edge min, convergence guard, partitioning
invariance)."""

from __future__ import annotations

import heapq

import pytest
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.operators.bucketing import (
    colocated_join,
    write_bucketed,
)
from vbpl_web_crawl_spark.operators.graph import sssp
from vbpl_web_crawl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# bucketed co-located join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed(o, "t_bkt_orders", 4, "o_orderkey")
    write_bucketed(li, "t_bkt_lineitem", 4, "l_orderkey")
    yield "t_bkt_orders", "t_bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS t_bkt_lineitem")


def test_colocated_join_plan_has_no_exchange(spark, bucketed_pair):
    ot, lt = bucketed_pair
    # force a non-broadcast join so the assertion certifies bucketing,
    # not the broadcast fallback (broadcast plans are also shuffle-free)
    joined = (
        spark.table(ot)
        .hint("merge")
        .join(
            spark.table(lt),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_colocated_join_matches_plain_join(spark, bucketed_pair):
    ot, lt = bucketed_pair
    got = (
        colocated_join(spark, ot, lt, "o_orderkey", "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .alias("cents"),
        )
    )
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    want = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .alias("cents"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_write_bucketed_overwrites_orphaned_location(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    write_bucketed(df, "t_bkt_orphan", 2, "k")
    # simulate a catalog restart that forgot the table but left the dir
    spark.catalog.dropTempView  # no-op; keep catalog API imported
    spark._jsparkSession.sessionState().catalog().dropTable(
        spark._jvm.org.apache.spark.sql.catalyst.TableIdentifier(
            "t_bkt_orphan"
        ),
        True,
        False,  # purge=False: directory survives, catalog entry gone
    )
    write_bucketed(df, "t_bkt_orphan", 2, "k")  # must not raise
    assert spark.table("t_bkt_orphan").count() == 10
    spark.sql("DROP TABLE IF EXISTS t_bkt_orphan")


# ---------------------------------------------------------------------------
# weighted SSSP
# ---------------------------------------------------------------------------

_EDGES = [
    # (u, v, w) directed; 1 -> 5 has a short expensive arc and a long
    # cheap detour, so hop-count and weight orders disagree
    (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1),
    (1, 5, 10),
    (5, 6, 2),
    (7, 1, 3),  # 7 is upstream of the seed: unreachable from 1
]


def _py_dijkstra(edges, seed):
    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    dist = {seed: 0}
    pq = [(0, seed)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_sssp_matches_dijkstra_replay(spark):
    edges = spark.createDataFrame(_EDGES, "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in sssp(edges, seeds).collect()}
    assert got == _py_dijkstra(_EDGES, 1)
    assert 7 not in got  # upstream node never reached


def test_sssp_parallel_edges_keep_cheapest(spark):
    edges = spark.createDataFrame(
        [(1, 2, 9), (1, 2, 4), (1, 2, 6)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in sssp(edges, seeds).collect()}
    assert got == {1: 0, 2: 4}


def test_sssp_raises_on_round_exhaustion(spark):
    # a 4-hop path cannot converge in 2 rounds (2 relax + 1 confirm)
    edges = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(1, 5)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(RuntimeError, match="did not converge"):
        sssp(edges, seeds, max_rounds=2)


def test_sssp_partitioning_invariance(spark):
    edges = spark.createDataFrame(_EDGES, "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    base = sorted(map(tuple, sssp(edges, seeds).collect()))
    for parts in (1, 7):
        re = sorted(
            map(tuple, sssp(edges.repartition(parts), seeds).collect())
        )
        assert re == base
