"""Heavy hitters (operators/heavy.py): exactness vs a full groupBy on
skewed data, the Misra-Gries memory bound, and edge cases."""

import numpy as np
import pyspark.sql.functions as F

from vbpl_web_crawl_spark.operators.heavy import _mg_merge, heavy_hitters


def _exact(df, key, phi):
    n = df.count()
    return {
        (r[key], r.cnt)
        for r in df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= phi * n)
        .collect()
    }


def test_matches_exact_on_zipf_skew(spark):
    """Zipf-ish skew: a few dominant keys + a long tail; sketch+verify
    must equal the exact groupBy, at several partitionings."""
    rng = np.random.default_rng(1)
    keys = np.concatenate(
        [
            np.repeat("whale", 4000),
            np.repeat("shark", 1500),
            np.repeat("tuna", 600),
            rng.integers(0, 5000, 10000).astype(str),  # tail
        ]
    )
    rows = [(str(k),) for k in keys]
    for parts in (1, 8, 32):
        df = spark.createDataFrame(rows, "k string").repartition(parts)
        got = {
            (r.k, r.cnt)
            for r in heavy_hitters(df, "k", 1.0 / 32.0).collect()
        }
        assert got == _exact(df, "k", 1.0 / 32.0), parts
        assert ("whale", 4000) in got


def test_no_hitters_returns_empty(spark):
    df = spark.createDataFrame([(str(i),) for i in range(2000)], "k string")
    assert heavy_hitters(df, "k", 0.01).count() == 0


def test_mg_memory_bound_and_survival():
    """The per-partition summary never exceeds k counters, and an item
    with local count > rows/ (k+1)-ish slack always survives."""
    rng = np.random.default_rng(7)
    k = 16
    counters: dict[int, int] = {}
    stream = np.concatenate(
        [np.repeat(999, 3000), rng.integers(0, 10_000, 20_000)]
    )
    rng.shuffle(stream)
    for i in range(0, len(stream), 500):
        batch = stream[i : i + 500]
        uniq, cnt = np.unique(batch, return_counts=True)
        _mg_merge(counters, uniq, cnt, k)
        assert len(counters) <= k
    assert 999 in counters  # 3000/23000 >> rows/(k+1)
