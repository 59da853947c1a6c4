"""Temporal operators (operators/temporal.py): as-of join semantics
(inclusive match, ties, no-match NULLs, tolerance), bucketed range
join vs a naive cross-filter reference, partitioning invariance, and
the no-nested-loop plan guarantee."""

import datetime as dt
import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F
import pytest

from vbpl_web_crawl_spark.operators.temporal import asof_join, range_join_bucketed


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),
            (2, 10, _ts("2024-01-01 12:00:00")),
            (3, 10, _ts("2024-01-01 09:00:00")),  # before any right row
            (4, 20, _ts("2024-01-01 10:30:00")),
            (5, 30, _ts("2024-01-01 10:00:00")),  # key with no right rows
        ],
        "event_id long, k long, t timestamp",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 10:00:00"), 1.5),  # == left t: matches
            (101, 10, _ts("2024-01-01 11:00:00"), 2.5),
            (102, 20, _ts("2024-01-01 10:00:00"), 3.5),
        ],
        "rid long, k long, rt timestamp, rv double",
    )


def test_asof_semantics(spark):
    got = {
        r.event_id: (r.rid, r.rv)
        for r in asof_join(
            _left(spark), _right(spark), on="k", left_time="t",
            right_time="rt", right_cols=["rid", "rv"],
        ).collect()
    }
    assert got[1] == (100, 1.5)  # equal time matches (<=)
    assert got[2] == (101, 2.5)  # latest of two priors
    assert got[3] == (None, None)  # nothing at-or-before
    assert got[4] == (102, 3.5)
    assert got[5] == (None, None)  # key absent from right


def test_asof_tie_resolves_to_greatest_tiebreak(spark):
    right = spark.createDataFrame(
        [
            (7, 10, _ts("2024-01-01 10:00:00"), 1.0),
            (9, 10, _ts("2024-01-01 10:00:00"), 2.0),  # same time, higher rid
        ],
        "rid long, k long, rt timestamp, rv double",
    )
    got = asof_join(
        _left(spark).filter("event_id = 1"), right, on="k", left_time="t",
        right_time="rt", right_cols=["rid", "rv"],
    ).collect()[0]
    assert (got.rid, got.rv) == (9, 2.0)


def test_asof_tolerance(spark):
    out = {
        r.event_id: r.rid
        for r in asof_join(
            _left(spark), _right(spark), on="k", left_time="t",
            right_time="rt", right_cols=["rid", "rv"],
            tolerance=F.expr("INTERVAL 59 MINUTES"),
        ).collect()
    }
    assert out[1] == 100
    assert out[2] is None  # 60-min-old match exceeds 59-min tolerance


def test_asof_plan_has_no_join(spark):
    df = asof_join(
        _left(spark), _right(spark), on="k", left_time="t",
        right_time="rt", right_cols=["rid", "rv"],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan  # union + window carry, not a join at all
    assert plan.count("Exchange") <= 2  # one shuffle (+AQE read)


def test_range_join_matches_naive_reference(spark):
    """Bucketed equi-join result == naive cross-filter on small data,
    across bucket widths (straddling vs containing)."""
    import random

    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    pts = [(i, base + dt.timedelta(seconds=rng.randrange(0, 86400))) for i in range(300)]
    ivs = []
    for j in range(40):
        s = base + dt.timedelta(seconds=rng.randrange(0, 86400 - 7200))
        ivs.append((1000 + j, s, s + dt.timedelta(seconds=rng.randrange(60, 7200))))
    points = spark.createDataFrame(pts, "pid long, ts timestamp")
    intervals = spark.createDataFrame(ivs, "iid long, w_start timestamp, w_end timestamp")
    naive = (
        points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .select("pid", "iid")
    )
    for bucket in (600, 3600, 7200):
        got = range_join_bucketed(
            points, intervals, "ts", "w_start", "w_end", bucket_seconds=bucket
        ).select("pid", "iid")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, naive.collect())
        ), f"bucket={bucket}"


def test_range_join_boundary_semantics(spark):
    base = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [
            (1, base),                                   # == start: in
            (2, base + dt.timedelta(seconds=3599)),      # last instant: in
            (3, base + dt.timedelta(seconds=3600)),      # == end: out
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(9, base, base + dt.timedelta(seconds=3600))],
        "iid long, w_start timestamp, w_end timestamp",
    )
    got = {
        r.pid
        for r in range_join_bucketed(
            points, intervals, "ts", "w_start", "w_end", 3600
        ).collect()
    }
    assert got == {1, 2}


def test_range_join_subsecond_precision(spark):
    """Regression (round-3 ADVICE, high): fractional timestamps. With
    second-truncated buckets the point 02:00:00.3 in interval
    [00:00:00.5, 02:00:00.5) at bucket_seconds=7200 landed one bucket
    past the interval's last exploded bucket and the match was DROPPED.
    Microsecond bucketing must keep it — and the exclusive end."""
    base = dt.datetime(2024, 1, 1)
    us = dt.timedelta(microseconds=1)
    points = spark.createDataFrame(
        [
            (1, base + dt.timedelta(hours=2, milliseconds=300)),  # in (repro)
            (2, base + dt.timedelta(milliseconds=500)),           # == start: in
            (3, base + dt.timedelta(hours=2, milliseconds=500)),  # == end: out
            (4, base + dt.timedelta(hours=2, milliseconds=500) - us),  # last us: in
            (5, base + dt.timedelta(milliseconds=499)),           # just before: out
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (
                9,
                base + dt.timedelta(milliseconds=500),
                base + dt.timedelta(hours=2, milliseconds=500),
            )
        ],
        "iid long, w_start timestamp, w_end timestamp",
    )
    for bucket in (1, 600, 7200):
        got = {
            r.pid
            for r in range_join_bucketed(
                points, intervals, "ts", "w_start", "w_end", bucket
            ).collect()
        }
        assert got == {1, 2, 4}, f"bucket={bucket}: {got}"


def test_range_join_plan_is_equi_join(spark):
    base = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame([(1, base)], "pid long, ts timestamp")
    intervals = spark.createDataFrame(
        [(9, base, base + dt.timedelta(seconds=60))],
        "iid long, w_start timestamp, w_end timestamp",
    )
    df = range_join_bucketed(points, intervals, "ts", "w_start", "w_end", 3600)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_partitioning_invariance(spark):
    l = _left(spark)
    r = _right(spark)
    one = asof_join(l.repartition(1), r.repartition(1), "k", "t", "rt", ["rid"]).collect()
    many = asof_join(l.repartition(13), r.repartition(7), "k", "t", "rt", ["rid"]).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
