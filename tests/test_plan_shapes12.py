"""Physical-plan guards for the round-5 part-12 queries: the scale
properties their docstrings claim must stay visible in the plan."""

import io
from contextlib import redirect_stdout

from vbpl_web_crawl_spark.plans.queries import get_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        get_queries()[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_mirror_sketch_no_cartesian_or_nested_loop(spark):
    """Candidate pairing must come from the inverted fp equi-join +
    union of two equi-joins — an OR-condition formulation would plan a
    BroadcastNestedLoopJoin and go quadratic in hosts."""
    plan = _plan(spark, "mirror_host_sketch_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_redirect_resolution_no_cartesian(spark):
    plan = _plan(spark, "redirect_resolution_summary")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dup_span_removal_scan_prunes_columns(spark):
    """The ranker and the rebuild must read only doc_id + text."""
    plan = _plan(spark, "dup_span_removal_docs")
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "lang" not in line and "source" not in line


def test_suffix_ranks_bounded_rounds(spark):
    """Prefix doubling must run log2(cap) rounds, each truncated by a
    localCheckpoint — the final plan should be a checkpoint scan, not
    an exponentially nested join tree."""
    from vbpl_web_crawl_spark.operators.suffix import suffix_ranks

    docs = spark.createDataFrame(
        [(0, "abcabcab"), (1, "bcabcabc")], "doc_id long, text string"
    )
    ranks = suffix_ranks(docs, cap=8, early_stop=False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        ranks.explain("formatted")
    plan = buf.getvalue()
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan
    assert "SortMergeJoin" not in plan  # lineage truncated each round
