"""Exact quantile via histogram refinement (operators/quantile.py):
equality with a full sort on adversarial distributions, the forced
refinement path, and heavy-duplicate buckets."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from vbpl_web_crawl_spark.operators.quantile import exact_quantile


def _check_all(spark, values, qs=(0.0, 0.01, 0.5, 0.9, 0.999, 1.0)):
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    srt = np.sort(np.array(values, dtype=np.float64))
    n = len(srt)
    for q in qs:
        want = srt[max(int(np.ceil(q * n)) - 1, 0)]
        got = exact_quantile(df, "x", q, direct_limit=50)
        assert got == want, (q, got, want)


def test_uniform_and_skewed(spark):
    rng = np.random.default_rng(3)
    _check_all(spark, rng.uniform(-1e6, 1e6, 3000))
    _check_all(spark, rng.lognormal(0, 4, 3000))  # heavy right tail


def test_heavy_duplicates_single_bucket(spark):
    """90% of mass on one value: the target bucket stays huge after
    refinement (lo == hi short-circuit must fire)."""
    vals = np.concatenate([np.full(5000, 42.0), np.arange(500, dtype=float)])
    _check_all(spark, vals, qs=(0.5, 0.9))


def test_tiny_and_exact_ranks(spark):
    _check_all(spark, [7.0], qs=(0.0, 0.5, 1.0))
    _check_all(spark, [1.0, 2.0, 3.0, 4.0], qs=(0.25, 0.5, 0.75, 1.0))


def test_matches_spark_sort_on_integers(spark):
    df = spark.range(10_001).select((F.col("id") * 37 % 9973).cast("double").alias("x"))
    want = [r.x for r in df.orderBy("x").collect()]
    for q in (0.5, 0.95):
        k = max(int(np.ceil(q * len(want))) - 1, 0)
        assert exact_quantile(df, "x", q, direct_limit=100) == want[k]
