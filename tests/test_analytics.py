"""Planted-data semantics for the funnel and cohort-retention gates
(oracle parity is covered by the correctness gate)."""

from __future__ import annotations

import datetime as dt

import pytest

from vbpl_web_crawl_spark.plans.queries import get_queries


def _write_events(spark, rows, tmp_path):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(sf + "/events.parquet")
    return sf


def _t(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_funnel_requires_strict_stage_order(spark, tmp_path):
    """User 1 completes signup<view<click<purchase in order; user 2 has
    all four types but the purchase PRECEDES the click, so it reaches
    stage 3 only; user 3 never signs up, so it reaches nothing."""
    rows = [
        (1, _t(1), 1, "signup", 0.0, ""),
        (2, _t(2), 1, "view", 0.0, ""),
        (3, _t(3), 1, "click", 0.0, ""),
        (4, _t(4), 1, "purchase", 0.0, ""),
        (5, _t(1), 2, "signup", 0.0, ""),
        (6, _t(2), 2, "view", 0.0, ""),
        (7, _t(3), 2, "purchase", 0.0, ""),
        (8, _t(4), 2, "click", 0.0, ""),
        (9, _t(1), 3, "view", 0.0, ""),
        (10, _t(2), 3, "click", 0.0, ""),
        (11, _t(3), 3, "purchase", 0.0, ""),
    ]
    sf = _write_events(spark, rows, tmp_path)
    got = {
        r.stage: r
        for r in get_queries()["funnel_conversion_stages"](spark, sf).collect()
    }
    assert got["signup"].n_users == 2
    assert got["view"].n_users == 2
    assert got["click"].n_users == 2
    assert got["purchase"].n_users == 1
    assert got["purchase"].conv_from_prev == pytest.approx(0.5)
    assert got["purchase"].conv_from_first == pytest.approx(0.5)


def test_cohort_retention_offsets(spark, tmp_path):
    """User 1 first active in week of Jan 1 (Monday), returns 2 weeks
    later; user 2 first active in week 2 only. Offsets and rates are
    known by construction."""
    rows = [
        (1, dt.datetime(2024, 1, 2, 10), 1, "view", 0.0, ""),
        (2, dt.datetime(2024, 1, 16, 10), 1, "view", 0.0, ""),
        (3, dt.datetime(2024, 1, 9, 10), 2, "view", 0.0, ""),
    ]
    sf = _write_events(spark, rows, tmp_path)
    out = {
        (r.cohort_week, r.week_offset): r
        for r in get_queries()["cohort_retention_weekly"](spark, sf).collect()
    }
    assert out[("2024-01-01", 0)].n_active == 1
    assert out[("2024-01-01", 2)].n_active == 1
    assert out[("2024-01-01", 2)].retention == pytest.approx(1.0)
    assert out[("2024-01-08", 0)].n_active == 1
    assert len(out) == 3


def test_rolling_hour_window_boundary_inclusive(spark, tmp_path):
    """Events at t, t+1h (inclusive boundary) and t+1h+1us: the second
    event's trailing window includes the first (exactly 1h old); the
    third drops it."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 1, "view", 0.0, ""),
        (2, t0 + dt.timedelta(hours=1), 1, "view", 0.0, ""),
        (3, t0 + dt.timedelta(hours=1, microseconds=1), 1, "view", 0.0, ""),
        (4, t0, 2, "view", 0.0, ""),
    ]
    sf = _write_events(spark, rows, tmp_path)
    out = {
        r.trailing_n: r.n_events
        for r in get_queries()["rolling_hour_rate_histogram"](spark, sf).collect()
    }
    # user1: counts 1 (first), 2 (second: first is exactly 1h old,
    # inclusive), 2 (third: first dropped, second retained); user2: 1
    assert out == {1: 2, 2: 2}


def test_ab_lift_known_counts(spark, tmp_path):
    """Hash assignment is deterministic: compute expected arms in pure
    Python (md5 parity) for 6 users, plant conversions so arm rates and
    the z statistic are known in closed form."""
    import hashlib
    import math

    users = list(range(1, 13))
    arms = {
        u: "A"
        if int(hashlib.md5(str(u).encode()).hexdigest()[:2], 16) % 2 == 0
        else "B"
        for u in users
    }
    a_users = [u for u in users if arms[u] == "A"]
    b_users = [u for u in users if arms[u] == "B"]
    assert a_users and b_users  # split actually happens for these ids
    # first user of each arm converts (one high-value purchase)
    conv = {a_users[0], b_users[0]}
    rows, eid = [], 0
    for u in users:
        eid += 1
        rows.append((eid, _t(u), u, "view", 0.0, ""))
        if u in conv:
            eid += 1
            rows.append((eid, _t(u + 30), u, "purchase", 250.0, ""))
        else:
            eid += 1
            rows.append((eid, _t(u + 30), u, "purchase", 10.0, ""))
    sf = _write_events(spark, rows, tmp_path)
    got = {r.arm: r for r in get_queries()["ab_experiment_lift"](spark, sf).collect()}
    na, nb = len(a_users), len(b_users)
    assert (got["A"].n_users, got["A"].n_converted) == (na, 1)
    assert (got["B"].n_users, got["B"].n_converted) == (nb, 1)
    pa, pb = 1.0 / na, 1.0 / nb
    pool = 2.0 / (na + nb)
    z = (pb - pa) / math.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
    assert got["A"].lift_abs == pytest.approx(round(pb - pa, 4))
    assert got["A"].z_stat == pytest.approx(round(z, 4))


def test_triangle_count_planted_graph(spark, tmp_path):
    """Orders {1,2,3}, {2,3,4} and {5,6}: co-purchase edges 12, 13,
    23, 24, 34, 56 -> exactly two triangles ({1,2,3} and {2,3,4}),
    6 nodes, 6 edges."""
    rows = []
    for ok, parts in [(1, (1, 2, 3)), (2, (2, 3, 4)), (3, (5, 6))]:
        for i, pk in enumerate(parts):
            rows.append((ok, pk, 1, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         __import__("datetime").datetime(2024, 1, 1)))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(sf + "/lineitem.parquet")
    r = get_queries()["triangle_count_copurchase"](spark, sf).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (6, 6, 2)
    spark.catalog.clearCache()


def test_event_throttle_min_gap(spark, tmp_path):
    """Three events 5 minutes apart at a 10-minute gap: first kept,
    second dropped (5 min), third dropped too (5 min since PREVIOUS
    RAW event — lag-throttle, not running-state debounce); a different
    type on the same user is independent."""
    rows = [
        (1, _t(0), 1, "view", 0.0, ""),
        (2, _t(5), 1, "view", 0.0, ""),
        (3, _t(10), 1, "view", 0.0, ""),
        (4, _t(0), 1, "click", 0.0, ""),
        (5, _t(30), 1, "click", 0.0, ""),
    ]
    sf = _write_events(spark, rows, tmp_path)
    got = {
        r.event_type: r
        for r in get_queries()["event_throttle_stats"](spark, sf).collect()
    }
    assert (got["view"].n_events, got["view"].n_kept) == (3, 1)
    assert (got["click"].n_events, got["click"].n_kept) == (2, 2)
