"""Partitioning invariance for the round-5 operators: identical
results at different shuffle-partition counts (the local stand-in for
"same answer at N and 4N executors"), extending
test_query_partitioning_invariance.py to the newest machinery.

These queries exercise the paths where partition-count dependence
could realistically hide:

- suffix_rank_checksums / exact_substring_dup_spans /
  dup_span_removal_docs: prefix doubling re-ranks via
  ``global_sequence`` (range-partitioned row_number) every round — the
  dense ranks must come out identical no matter how the distinct pair
  set is split across partitions;
- redirect_resolution_summary: pointer-doubling joins whose
  intermediate frames are re-shuffled each doubling step;
- mirror_host_sketch_pairs: mapInPandas fingerprints + per-host
  bottom-k windows — the sketch must depend only on the data, never on
  which Arrow batch a document landed in;
- sssp_copurchase_cost: frontier Bellman-Ford with per-round tagged
  min-aggs (integer arithmetic, so any partitioning effect would be a
  logic bug, not float drift).
"""

import pytest

from vbpl_web_crawl_spark.plans.queries import get_queries

SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    "suffix_rank_checksums",
    "exact_substring_dup_spans",
    "dup_span_removal_docs",
    "redirect_resolution_summary",
    "mirror_host_sketch_pairs",
    "sssp_copurchase_cost",
    # miner argmax (count DESC + term tiebreak) and the postings
    # adjacency joins must agree regardless of how the token stream
    # was split
    "phrase_index_search",
    # per-level argmin + suffix-min dominance must not depend on how
    # the doc stream was split
    "pareto_quality_frontier",
    # packed-key argmax over the broadcast worker range
    "rendezvous_host_assignment",
]


def _rows(spark, name):
    df = get_queries()[name](spark, SF_DIR)
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_round5_result_invariant_under_shuffle_partitions(spark, name):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    try:
        spark.conf.set(key, "5")
        a = _rows(spark, name)
        spark.conf.set(key, "32")
        b = _rows(spark, name)
    finally:
        spark.conf.set(key, before)
    assert a == b, f"{name}: result depends on shuffle partitioning"
