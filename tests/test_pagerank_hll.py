"""Semantic tests for the round-5 graph/sketch operators: integer-exact
PageRank (vs a pure-Python replay) and expression-only HyperLogLog
(accuracy envelope + partitioning invariance)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _py_pagerank(edges, n_iter=5, mass=1_000_000, damp=85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {n: mass for n in nodes}
    base = (100 - damp) * mass // 100
    for _ in range(n_iter):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += rank[u] // outdeg[u]
        rank = {n: base + (damp * s[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_python_replay(spark):
    from vbpl_web_crawl_spark.operators.graph import pagerank

    # undirected triangle + pendant, doubled into directed edges
    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, n_iter=5).collect()}
    assert got == _py_pagerank(edges)


def test_pagerank_authority_ordering(spark):
    """A hub with many in-links outranks leaf nodes."""
    from vbpl_web_crawl_spark.operators.graph import pagerank

    und = [(0, k) for k in range(1, 9)]  # star centered at 0
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, n_iter=5).collect()}
    assert got[0] > max(v for k, v in got.items() if k != 0)
    # leaves are symmetric -> identical integer ranks
    assert len({v for k, v in got.items() if k != 0}) == 1


def test_pagerank_partitioning_invariant(spark):
    from vbpl_web_crawl_spark.operators.graph import pagerank

    und = [(i, (i * 7 + 3) % 50) for i in range(50)]
    edges = [(a, b) for a, b in und if a != b]
    edges = edges + [(b, a) for a, b in edges]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df13 = spark.createDataFrame(edges, "src long, dst long").repartition(13)
    r1 = {r.node: r.rank for r in pagerank(df1, n_iter=4).collect()}
    r13 = {r.node: r.rank for r in pagerank(df13, n_iter=4).collect()}
    assert r1 == r13


def test_hll_gate_structure_small_range(spark):
    """On the tiny sf0.001 data (n << 2.5m) the RAW estimator is biased
    high by design (no linear-counting branch: ln() would break
    bit-parity with the oracle) — assert only the structural
    invariants there: registers bounded, estimate positive, exact
    column exact, denominator consistent with the register count."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    rows = get_queries()["hll_distinct_users_by_type"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "no event types"
    for r in rows:
        assert 0 < r.n_registers_set <= 256
        assert r.hll_estimate > 0
        # every unset register contributes exactly 2^54
        assert r.harmonic_denom >= (256 - r.n_registers_set) * (1 << 54)


def test_hll_estimate_within_error_envelope(spark):
    """256 registers -> ~6.5% standard error. At cardinalities past the
    small-range regime (n >= 2.5m) the raw estimator must land within
    4 sigma of truth."""
    from vbpl_web_crawl_spark.plans.pipeline_queries import (
        HLL_M,
        _HLL_NUMERATOR,
    )

    n = 20_000
    df = spark.range(n).select(F.col("id").cast("string").alias("u"))
    h = df.select(
        F.conv(F.substring(F.md5("u"), 1, 15), 16, 10).cast("long").alias("hv")
    )
    b = h.select(
        (F.col("hv") % HLL_M).alias("bucket"), F.expr(f"hv DIV {HLL_M}").alias("w")
    )
    regs = b.groupBy("bucket").agg(
        F.max(
            F.when(F.col("w") == 0, 53).otherwise(53 - F.length(F.bin("w")))
        ).alias("m")
    )
    agg = regs.agg(
        F.count(F.lit(1)).alias("nset"),
        F.sum(
            F.when(
                F.col("m") <= 54,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(54 - m AS INT))"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("s"),
    ).collect()[0]
    denom = agg.s + (HLL_M - agg.nset) * (1 << 54)
    est = _HLL_NUMERATOR / denom
    assert abs(est - n) / n < 4 * 1.04 / (HLL_M**0.5), est


def test_hll_register_merge_associativity(spark):
    """Registers are max-mergeable: computing them over two disjoint
    halves and max-merging equals computing over the union — the
    property that makes the sketch shuffle O(registers), not O(rows)."""
    from vbpl_web_crawl_spark.plans.pipeline_queries import HLL_M

    events = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select("user_id")

    def regs(df):
        h = df.select(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
            )
            .cast("long")
            .alias("hv")
        )
        b = h.select(
            (F.col("hv") % HLL_M).alias("bucket"),
            F.expr(f"hv DIV {HLL_M}").alias("w"),
        )
        out = b.groupBy("bucket").agg(
            F.max(
                F.when(F.col("w") == 0, 53).otherwise(53 - F.length(F.bin("w")))
            ).alias("m")
        )
        return {r.bucket: r.m for r in out.collect()}

    whole = regs(events)
    lo = regs(events.filter(F.col("user_id") % 2 == 0))
    hi = regs(events.filter(F.col("user_id") % 2 == 1))
    merged = dict(lo)
    for k, v in hi.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == whole
