"""Connected components (operators/graph.py): component structure on
known graphs, long-chain convergence in O(log d) star-contraction
rounds, determinism across partitioning, fail-loud non-convergence."""

import pyspark.sql.functions as F
import pytest

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


def test_path_graph_10k_converges_logarithmically(spark):
    """Large-star/small-star must collapse a 10k-node PATH (diameter
    9999) within 15 rounds — hash-min label propagation would need
    ~10k. max_iter=15 doubles as the round-count assertion: the call
    RAISES if contraction hasn't converged by then."""
    n = 10_000
    df = spark.range(1, n).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    out = connected_components(df, max_iter=15)
    got = out.agg(
        F.countDistinct("cluster_id"), F.min("cluster_id"), F.count(F.lit(1))
    ).first()
    assert tuple(got) == (1, 1, n)


def test_nonconvergence_raises_not_wrong_labels(spark):
    """Exhausting max_iter must raise, never hand back unconverged
    cluster labels (round-3 ADVICE)."""
    edges = [(i, i + 1) for i in range(1, 200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_string_node_ids(spark):
    """Dedup pair graphs key on doc-id STRINGS; min-label semantics
    must hold for string ids too."""
    edges = [("doc_b", "doc_a"), ("doc_b", "doc_c"), ("zz", "zy")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert got == {
        "doc_a": "doc_a",
        "doc_b": "doc_a",
        "doc_c": "doc_a",
        "zz": "zy",
        "zy": "zy",
    }


def test_partitioning_invariance(spark):
    edges = [(i, (i * 7) % 50) for i in range(50) if i != (i * 7) % 50]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df2 = spark.createDataFrame(edges, "src long, dst long").repartition(16)
    a = {r.node: r.cluster_id for r in connected_components(df1).collect()}
    b = {r.node: r.cluster_id for r in connected_components(df2).collect()}
    assert a == b
