"""Physical-plan regression guards: the optimizations we rely on at
100 TB must stay in the plan (pushdown, broadcast, top-k, group-limit)."""

import io
from contextlib import redirect_stdout

import pytest

from vbpl_web_crawl_spark.plans.queries import get_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        get_queries()[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_point_lookup_pushes_filter(spark):
    plan = _plan(spark, "point_lookup_order")
    assert "PushedFilters" in plan and "EqualTo(o_orderkey,42)" in plan


def test_topk_plans_take_ordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "topk_recent_orders")


def test_edges_join_broadcasts_dimensions(spark):
    plan = _plan(spark, "edges_join_lineitem_part_supplier")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "GreaterThanOrEqual(l_quantity,49.0)" in plan  # pushed filter


def test_flagship_uses_window_group_limit(spark):
    plan = _plan(spark, "flagship_latest_order_dossier")
    assert "WindowGroupLimit" in plan  # rank-1 pruned before shuffle
    assert "BroadcastHashJoin" in plan


def test_fuzzy_serial_join_blocks_on_length_band(spark, tmp_path):
    """J6 scale guard: the reference-parity fuzzy join must carry the
    serial-length band as a second equi-key — doc_type alone is a
    near-cartesian block at 10^8 docs."""
    from vbpl_web_crawl_spark.plans.reference_queries import REFERENCE_QUERIES
    from vbpl_web_crawl_spark.sources.relational_gen import (
        load_reference_tables,
        write_reference_tables,
    )

    out = str(tmp_path / "ref_tables")
    import os

    os.makedirs(out, exist_ok=True)
    write_reference_tables(out)
    tables = load_reference_tables(spark, out)
    fn, _ = REFERENCE_QUERIES["fuzzy_serial_candidates"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        fn(tables).explain("formatted")
    plan = buf.getvalue()
    assert "a_band" in plan and "b_band" in plan


def test_scan_prunes_columns(spark):
    plan = _plan(spark, "point_lookup_order")
    # projection pruning: unused columns never leave the scan
    assert "o_orderpriority" not in plan.split("ReadSchema")[-1]
