"""Streaming sessionization — a custom stateful operator
(``applyInPandasWithState``) that closes gap-based session windows on
a live event stream: the streaming twin of the batch
``sessionize_events_gap`` query (plans/extra_queries.py).

State per user is four scalars (last event micros, session ordinal,
event count, session start micros) — O(users) total, no event buffer —
and a session row is EMITTED exactly when a gap closes it, so output
is append-only. A ``flush`` sentinel row per user closes the final
open session; after a complete replay with sentinels the operator's
output equals the batch query row-for-row, which is exactly how the
gate verifies it: the registered streaming gate shares the BATCH
query's SQL oracle.

Ordering contract: rows for a user must arrive event-time-ordered
ACROSS micro-batches (each batch is sorted internally on
(flush, ts, event_id)); a production deployment puts a
watermark-reorder stage upstream, same as Spark's own
session_window requires.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

SRC_SCHEMA = (
    "user_id long, ts timestamp_ntz, event_id long, flush boolean"
)
OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "session_start timestamp_ntz, session_end timestamp_ntz"
)
STATE_SCHEMA = "last_us long, session_id long, n_events long, start_us long"

GAP_US = 1800 * 1_000_000


def _sessions_fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_us, sid, n, start_us = state.get
    else:
        last_us = sid = n = start_us = None
    out = []

    def close():
        out.append(
            (
                user_id,
                sid,
                n,
                pd.Timestamp(start_us, unit="us"),
                pd.Timestamp(last_us, unit="us"),
            )
        )

    for pdf in pdfs:
        pdf = pdf.sort_values(["flush", "ts", "event_id"])
        for row in pdf.itertuples(index=False):
            if bool(row.flush):
                if sid is not None:
                    close()
                    last_us = sid = n = start_us = None
                continue
            ts_us = int(pd.Timestamp(row.ts).value) // 1000
            if sid is None:
                sid, n, start_us = 1, 1, ts_us
            elif ts_us - last_us > GAP_US:
                close()
                sid, n, start_us = sid + 1, 1, ts_us
            else:
                n += 1
            last_us = ts_us
    if sid is None:
        state.remove()
    else:
        state.update((last_us, sid, n, start_us))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_id",
                "n_events",
                "session_start",
                "session_end",
            ],
        )


def streaming_sessionize(
    spark: SparkSession, src_dir: str, query_name: str
) -> DataFrame:
    """Run the stateful sessionizer over a parquet source dir
    (SRC_SCHEMA rows, sentinels included) to completion (AvailableNow)
    and return the collected session table."""
    stream = spark.readStream.schema(SRC_SCHEMA).parquet(src_dir)
    out = stream.groupBy("user_id").applyInPandasWithState(
        _sessions_fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def write_replay_with_sentinels(events: DataFrame, src_dir: str) -> None:
    """Materialize an events frame as a replay source: one parquet file
    of (user_id, ts, event_id, flush=false) rows followed by one of
    per-user flush sentinels (written second -> processed last)."""
    rows = events.select(
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "event_id",
        F.lit(False).alias("flush"),
    )
    rows.coalesce(1).write.mode("append").parquet(src_dir)
    sentinels = (
        events.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.lit(None).cast("timestamp_ntz").alias("ts"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(True).alias("flush"),
        )
    )
    sentinels.coalesce(1).write.mode("append").parquet(src_dir)
