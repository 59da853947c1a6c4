"""Partitioning invariance for the round-4 operators: identical
results at different shuffle-partition counts (the local stand-in for
"same answer at N and 4N executors"). Complements the crawl-level
invariance test; every query here involves multi-stage shuffles whose
row distribution changes completely with the partition count."""

import pytest

from vbpl_web_crawl_spark.plans.queries import get_queries

SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    "quality_repetition_stats",
    "dedup_corpus_keep_one",
    "dedup_winnowing_pairs",
    "exact_quantiles_price",
    "dedup_minhash_verified_pairs",
]


def _rows(spark, name):
    df = get_queries()[name](spark, SF_DIR)
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_shuffle_partitions(spark, name):
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
