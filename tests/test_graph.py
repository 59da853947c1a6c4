"""Connected components (operators/graph.py): component structure on
known graphs, long-chain convergence, determinism across partitioning."""

import pyspark.sql.functions as F

from vbpl_web_crawl_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return {r.node: r.cluster_id for r in out.collect()}


def test_two_components_and_transitivity(spark):
    # 1-2, 2-3 (one component), 10-11 (another)
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    """A 12-node path needs ~diameter rounds of hash-min — the loop
    must iterate to fixpoint, not stop after one round."""
    edges = [(i, i + 1) for i in range(1, 12)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == 12


def test_star_and_self_loop(spark):
    got = _cc(spark, [(5, 1), (5, 2), (5, 3), (7, 7)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 7: 7}


def test_partitioning_invariance(spark):
    edges = [(i, (i * 7) % 50) for i in range(50) if i != (i * 7) % 50]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df2 = spark.createDataFrame(edges, "src long, dst long").repartition(16)
    a = {r.node: r.cluster_id for r in connected_components(df1).collect()}
    b = {r.node: r.cluster_id for r in connected_components(df2).collect()}
    assert a == b
