"""Exact quantiles without a global sort.

Sorting 100 TB to read one row is the textbook anti-pattern; Spark's
built-in approx_percentile trades exactness away. This operator gets
the EXACT order statistic in two-and-a-bit passes:

1. one aggregation computes (min, max, n);
2. one aggregation histograms the column into 65536 equal-width
   buckets (a groupBy on an 8-byte bucket id — map-side combine does
   almost all the work, the shuffle carries <= 65536 rows);
3. the driver walks the cumulative histogram to the bucket holding the
   target rank, then only THAT bucket's rows — n/65536 on average —
   are pulled and selected exactly (recursing one more histogram level
   if a value-heavy bucket is still too big).

Exact by construction, so the DuckDB oracle is a plain
ORDER BY ... OFFSET k LIMIT 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 65536
_DIRECT_LIMIT = 200_000  # sort at most this many rows driver-side


def _rank_of(q: float, n: int) -> int:
    """0-indexed rank of the lower (discrete) q-quantile: the value at
    position ceil(q*n) in 1-indexed order, matching ORDER BY ...
    OFFSET (ceil(q*n)-1)."""
    k = int(-(-q * n // 1))  # ceil without float drift for exact q*n
    return max(k - 1, 0)


def exact_quantile(
    df: DataFrame, col: str, q: float, direct_limit: int = _DIRECT_LIMIT
) -> float:
    """Exact discrete q-quantile of a numeric column. ``direct_limit``
    is the largest row count sorted directly (smaller values force the
    histogram-refinement path — used by tests/gates to exercise it at
    small SF)."""
    n = df.count()
    assert n > 0, "quantile of empty input"
    return _kth_smallest(
        df.select(F.col(col).cast("double").alias("v")), _rank_of(q, n), 0, direct_limit
    )


def _kth_smallest(
    vals: DataFrame, k: int, depth: int = 0, direct_limit: int = _DIRECT_LIMIT
) -> float:
    n = vals.count()
    assert 0 <= k < n
    if n <= direct_limit or depth >= 3:
        return float(vals.orderBy("v").limit(k + 1).tail(1)[0].v)
    lo, hi = vals.agg(F.min("v"), F.max("v")).first()
    if lo == hi:
        return float(lo)
    width = (hi - lo) / _BUCKETS
    hist = dict(
        vals.groupBy(
            F.least(
                ((F.col("v") - F.lit(lo)) / F.lit(width)).cast("long"),
                F.lit(_BUCKETS - 1),
            ).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    bucket_expr = F.least(
        ((F.col("v") - F.lit(lo)) / F.lit(width)).cast("long"), F.lit(_BUCKETS - 1)
    )
    cum = 0
    for b in range(_BUCKETS):
        c = hist.get(b, 0)
        if cum + c > k:
            # filter with the SAME bucket expression the histogram used,
            # so float boundary rounding cannot split a bucket's rows
            sub = vals.filter(bucket_expr == F.lit(b))
            return _kth_smallest(sub, k - cum, depth + 1, direct_limit)
        cum += c
    raise AssertionError("rank walk overran the histogram")
