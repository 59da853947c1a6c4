"""Streaming gap-sessionization (streaming/sessions.py): the
applyInPandasWithState operator must equal the batch sessionize query
after a complete replay with flush sentinels, emit sessions append-only
(a session row appears exactly once), and keep only scalar state."""

import shutil
import tempfile

import pyspark.sql.functions as F

from vbpl_web_crawl_spark.plans.queries import get_queries
from vbpl_web_crawl_spark.streaming.sessions import (
    streaming_sessionize,
    write_replay_with_sentinels,
)


def _canon(df):
    return sorted(
        (r.user_id, r.session_id, r.n_events, str(r.session_start), str(r.session_end))
        for r in df.collect()
    )


def test_streaming_equals_batch_sessionize(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "src")
    write_replay_with_sentinels(events, src)
    got = streaming_sessionize(spark, src, "sess_eq_test")
    want = get_queries()["sessionize_events_gap"](spark, sf_dir)
    assert _canon(got) == _canon(want)


def test_sessions_split_on_gap_and_flush(spark, tmp_path):
    """Two bursts 31 minutes apart -> two sessions; the open second
    session only appears after the sentinel flushes it."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, False),
        (1, "2024-01-01 10:10:00", 2, False),
        (1, "2024-01-01 10:41:01", 3, False),  # 31min 1s after event 2
        (2, "2024-01-01 09:00:00", 4, False),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, flush boolean"
    ).select(
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "event_id",
        "flush",
    )
    src = str(tmp_path / "src2")
    write_replay_with_sentinels(df.drop("flush"), src)
    got = {
        (r.user_id, r.session_id): (r.n_events, str(r.session_start))
        for r in streaming_sessionize(spark, src, "sess_gap_test").collect()
    }
    assert got == {
        (1, 1): (2, "2024-01-01 10:00:00"),
        (1, 2): (1, "2024-01-01 10:41:01"),
        (2, 1): (1, "2024-01-01 09:00:00"),
    }


def test_append_only_no_duplicate_sessions(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id") < 10
    )
    src = str(tmp_path / "src3")
    write_replay_with_sentinels(events, src)
    out = streaming_sessionize(spark, src, "sess_dup_test")
    n = out.count()
    assert out.select("user_id", "session_id").distinct().count() == n


def test_group_spanning_arrow_chunks(spark, tmp_path):
    """A user whose micro-batch rows span multiple Arrow chunks must
    still be globally event-time-sorted before gap detection: sorting
    chunks independently mis-splits sessions at chunk boundaries
    (round-4 advice). Forced here by shrinking maxRecordsPerBatch far
    below one user's row count and writing the replay file in
    event-time-interleaved order."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "40")
        # one user, 300 events 1 min apart (single session), plus a
        # second user to keep >1 group per partition; rows written in
        # REVERSED time order so each Arrow chunk is internally sorted
        # but not globally so
        rows = [
            (1, f"2024-01-01 {10 + i // 60:02d}:{i % 60:02d}:00", i, False)
            for i in range(300)
        ]
        rows = rows[::-1] + [(2, "2024-01-01 09:00:00", 999, False)]
        df = spark.createDataFrame(
            rows, "user_id long, ts string, event_id long, flush boolean"
        ).select(
            "user_id",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            "event_id",
            "flush",
        )
        src = str(tmp_path / "src_chunks")
        write_replay_with_sentinels(df.drop("flush"), src)
        got = {
            (r.user_id, r.session_id): (r.n_events, str(r.session_start), str(r.session_end))
            for r in streaming_sessionize(spark, src, "sess_chunk_test").collect()
        }
        assert got == {
            (1, 1): (300, "2024-01-01 10:00:00", "2024-01-01 14:59:00"),
            (2, 1): (1, "2024-01-01 09:00:00", "2024-01-01 09:00:00"),
        }
    finally:
        spark.conf.set(key, old)
