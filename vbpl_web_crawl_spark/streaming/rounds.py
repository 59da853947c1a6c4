"""Structured Streaming equivalents of the reference's iterative
semantics (SURVEY.md §2.9).

The reference's `while True` re-crawl loop (main.py:13-20) maps to
incremental batch rounds with Trigger.AvailableNow: each invocation
drains whatever new input exists and stops — T1 semantics without a
long-lived process. Late/duplicate data is handled by the upsert layer
(T6: operators/upsert.merge_upsert = Iceberg MERGE).

`windowed_event_agg` is the streaming aggregation shape (watermark +
tumbling window). With AvailableNow over a static source it produces
exactly the batch answer — which is what makes it oracle-checkable —
while the same code handles a continuously-appended events directory on
a cluster.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_agg(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window sum/count per event_type over a (potentially
    growing) events parquet directory; AvailableNow drain into a memory
    sink; returns the result as a batch DataFrame."""
    static = spark.read.parquet(events_path)
    if os.path.isfile(events_path):
        # the streaming file source wants a directory; stage the file
        src_dir = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(os.path.abspath(events_path), os.path.join(src_dir, "part-0.parquet"))
        events_path = src_dir
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(events_path)
    )
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so exact
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    name = "streaming_windowed_agg"
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(ckpt, "wm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def incremental_round_stream(
    spark: SparkSession, frontier_dir: str, out_dir: str, ckpt_dir: str
) -> None:
    """Streaming frontier drain (the crawl's T1 loop as a stream): new
    frontier files appear -> fetch stage consumes them incrementally.
    foreachBatch keeps the batch-engine code (anti-join, politeness)
    unchanged per micro-batch — the recommended pattern for stateful
    pipelines that need full DataFrame semantics per round."""
    from vbpl_web_crawl_spark.crawl.engine import FRONTIER_SCHEMA

    stream = spark.readStream.schema(FRONTIER_SCHEMA).parquet(frontier_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
