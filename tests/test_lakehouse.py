"""Lakehouse seam contract (sources/lakehouse.py): ONE test suite runs
against BOTH backends — snapshot-versioned parquet (always) and real
Iceberg MERGE INTO (auto-skipped where no Iceberg runtime/catalog is
on the session, as in this sandbox). Every contract test is
backend-parameterized so the Iceberg path inherits the full suite the
moment the jars are present."""

import pytest
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.sources.lakehouse import (
    LakehouseTable,
    iceberg_catalog_ready,
)

BACKENDS = ["parquet", "iceberg"]
_N = {"n": 0}


@pytest.fixture(params=BACKENDS)
def table(request, spark, tmp_path):
    if request.param == "parquet":
        return LakehouseTable.for_path(spark, str(tmp_path / "tbl"))
    spark.conf.set(
        "spark.sql.catalog.it_lake", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it_lake.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it_lake.warehouse", str(tmp_path / "wh"))
    if not iceberg_catalog_ready(spark, "it_lake"):
        pytest.skip("no Iceberg runtime on this session (sandbox fallback)")
    _N["n"] += 1
    return LakehouseTable.for_name(spark, f"it_lake.db.t{_N['n']}")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, val string, updated_at long")


def _state(table):
    return {
        (r.k): (r.val, r.updated_at)
        for r in table.read().collect()
    }


def test_merge_creates_then_updates_and_inserts(spark, table):
    table.merge(_df(spark, [(1, "a", 10), (2, "b", 10)]), ["k"])
    assert _state(table) == {1: ("a", 10), 2: ("b", 10)}
    # update k=2, insert k=3, untouched k=1 survives
    table.merge(_df(spark, [(2, "b2", 20), (3, "c", 20)]), ["k"])
    assert _state(table) == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 20)}


def test_merge_latest_wins_inside_updates(spark, table):
    table.merge(_df(spark, [(1, "a", 1)]), ["k"])
    updates = _df(spark, [(1, "old", 5), (1, "new", 9), (2, "x", 2)])
    table.merge(updates, ["k"], recency_col="updated_at")
    assert _state(table) == {1: ("new", 9), 2: ("x", 2)}


def test_merge_idempotent_on_recrawl(spark, table):
    """T6: re-merging the same updates changes nothing."""
    updates = _df(spark, [(1, "a", 1), (2, "b", 2)])
    table.merge(updates, ["k"], recency_col="updated_at")
    before = _state(table)
    table.merge(updates, ["k"], recency_col="updated_at")
    assert _state(table) == before


def test_snapshot_history_grows_and_old_snapshot_survives(spark, table):
    table.replace(_df(spark, [(1, "a", 1)]))
    s1 = table.snapshots()
    table.merge(_df(spark, [(2, "b", 2)]), ["k"])
    s2 = table.snapshots()
    assert len(s2) == len(s1) + 1
    assert s2[: len(s1)] == s1, "history must be append-only"


def test_for_name_fails_loudly_without_iceberg(spark):
    with pytest.raises(ValueError, match="not an Iceberg catalog"):
        LakehouseTable.for_name(spark, "nosuch_catalog.db.t")


def test_parquet_pointer_flip_keeps_previous_snapshot_readable(spark, tmp_path):
    """Snapshot isolation on the fallback: after a new commit the
    previous version directory is still present and readable (a reader
    holding the old pointer is unaffected), and a crashed writer's
    data-only directory (no pointer flip) is invisible."""
    t = LakehouseTable.for_path(spark, str(tmp_path / "tbl"))
    t.replace(_df(spark, [(1, "a", 1)]))
    v1 = t._current_dir()
    t.replace(_df(spark, [(1, "a2", 2)]))
    assert t._current_dir() != v1
    assert spark.read.parquet(v1).count() == 1  # old snapshot intact
    # simulate a crash: snapshot dir written, pointer never flipped
    _df(spark, [(9, "crash", 9)]).write.parquet(str(tmp_path / "tbl" / "v-99999999"))
    assert _state(t) == {1: ("a2", 2)}
    assert "v-99999999" not in t.snapshots()


def test_fallback_no_pointerless_window_and_monotone_versions(spark, tmp_path):
    """The commit protocol must never pass through a state with zero
    committed pointers (the round-4 advice flagged the old single
    `_current` delete-then-rename flip: a crash in between left the
    table unreadable and restarted versioning at v-1 over the oldest
    snapshot). With monotone `current-<n>` pointer files: committed
    pointers are immutable, a crashed commit leaves only an orphan
    data dir, and the retry numbers PAST every committed snapshot."""
    import os

    t = LakehouseTable.for_path(spark, str(tmp_path / "tbl"))
    t.replace(_df(spark, [(1, "a", 1)]))
    t.replace(_df(spark, [(1, "a2", 2)]))
    root = str(tmp_path / "tbl")
    pointers = sorted(p for p in os.listdir(root) if p.startswith("current-"))
    assert pointers == ["current-00000001", "current-00000002"]  # both kept
    # crash AFTER the data write, BEFORE the pointer commit:
    _df(spark, [(9, "crash", 9)]).write.parquet(f"{root}/v-00000003")
    assert _state(t) == {1: ("a2", 2)}  # readers unaffected, no window
    # the retry (or any next commit) claims the orphan number, never v-1
    t.replace(_df(spark, [(2, "b", 3)]))
    assert t._current_dir().endswith("v-00000003")
    assert _state(t) == {2: ("b", 3)}
    assert spark.read.parquet(f"{root}/v-00000001").count() == 1  # intact


def test_time_travel_reads_each_snapshot(spark, table):
    """read(version=<snapshots() entry>) reproduces each committed
    state; read() with no version stays the latest (Iceberg VERSION AS
    OF / parquet v-dir, one contract)."""
    table.replace(_df(spark, [(1, "a", 1)]))
    table.merge(_df(spark, [(2, "b", 2)]), ["k"])
    table.merge(_df(spark, [(1, "a2", 3)]), ["k"])
    ids = table.snapshots()
    assert len(ids) == 3
    def at(v):
        return {r.k: (r.val, r.updated_at) for r in table.read(version=v).collect()}
    assert at(ids[0]) == {1: ("a", 1)}
    assert at(ids[1]) == {1: ("a", 1), 2: ("b", 2)}
    assert at(ids[2]) == _state(table) == {1: ("a2", 3), 2: ("b", 2)}


def test_expire_snapshots_bounds_history(spark, table):
    """expire_snapshots(keep_last=2) drops exactly the oldest data,
    keeps the latest readable, and time travel to an expired id fails
    loudly instead of returning stale bytes."""
    for i in range(4):
        table.replace(_df(spark, [(1, f"s{i}", i)]))
    ids = table.snapshots()
    expired = table.expire_snapshots(keep_last=2)
    assert expired == ids[:2]
    assert table.snapshots() == ids[2:]
    assert _state(table) == {1: ("s3", 3)}  # latest untouched
    assert {r.k for r in table.read(version=ids[2]).collect()} == {1}
    with pytest.raises(Exception):
        table.read(version=ids[0]).collect()


def test_expire_then_commit_numbers_past_history(spark, tmp_path):
    """Expiration must not roll the version counter back: pointers are
    retained, so the next commit numbers past ALL history including
    expired snapshots."""
    t = LakehouseTable.for_path(spark, str(tmp_path / "tbl"))
    for i in range(3):
        t.replace(_df(spark, [(1, f"s{i}", i)]))
    t.expire_snapshots(keep_last=1)
    t.replace(_df(spark, [(1, "s3", 3)]))
    assert t._current_dir().endswith("v-00000004")
    assert t.snapshots() == ["v-00000003", "v-00000004"]


def test_remove_orphans_reclaims_crash_debris_only(spark, tmp_path):
    """A crashed writer's uncommitted v-dir and stale .tmp pointer are
    removed; every committed snapshot and pointer survives; the next
    commit still numbers past the removed orphan's slot or reuses it
    safely (it was never committed)."""
    import os

    t = LakehouseTable.for_path(spark, str(tmp_path / "tbl"))
    t.replace(_df(spark, [(1, "a", 1)]))
    root = str(tmp_path / "tbl")
    # crash debris: data written but pointer never committed + tmp file
    _df(spark, [(9, "crash", 9)]).write.parquet(f"{root}/v-00000002")
    with open(f"{root}/current-00000002.tmp", "w") as f:
        f.write("v-00000002")
    removed = t.remove_orphans()
    assert removed == ["current-00000002.tmp", "v-00000002"]
    assert _state(t) == {1: ("a", 1)}
    assert sorted(p for p in os.listdir(root) if p.startswith("current-")) == [
        "current-00000001"
    ]
    t.replace(_df(spark, [(2, "b", 2)]))
    assert _state(t) == {2: ("b", 2)}
