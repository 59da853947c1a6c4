"""foreachBatch frontier drain (streaming/rounds.incremental_round_stream):
new frontier files are consumed incrementally with checkpointed progress
— a second invocation processes only files that appeared in between."""

import os

from pyspark.sql import functions as F

from vbpl_web_crawl_spark.crawl.engine import FRONTIER_SCHEMA
from vbpl_web_crawl_spark.streaming.rounds import incremental_round_stream


def _frontier_rows(spark, start, n):
    return (
        spark.range(start, start + n)
        .select(
            F.concat(F.lit("https://vbpl.vn/doc/phap_quy/"), F.col("id")).alias("url"),
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
            F.lit("vbpl.vn").alias("host"),
            F.lit(1).cast("int").alias("depth"),
            F.lit("phap_quy").alias("doc_type"),
            F.lit(1).cast("int").alias("doc_type_rank"),
            F.col("id").alias("discovery_seq"),
            F.lit(0).cast("int").alias("retry_count"),
        )
    )


def test_incremental_drain_only_new_files(spark, tmp_path):
    src = str(tmp_path / "frontier")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _frontier_rows(spark, 0, 10).coalesce(1).write.mode("append").parquet(src)
    incremental_round_stream(spark, src, out, ckpt)
    first = spark.read.option("recursiveFileLookup", "true").parquet(out)
    assert first.count() == 10

    _frontier_rows(spark, 100, 5).coalesce(1).write.mode("append").parquet(src)
    incremental_round_stream(spark, src, out, ckpt)
    all_rows = spark.read.option("recursiveFileLookup", "true").parquet(out)
    assert all_rows.count() == 15  # second drain added ONLY the 5 new rows
    assert all_rows.select("url_hash").distinct().count() == 15
    assert set(all_rows.schema.fieldNames()) == {f.name for f in FRONTIER_SCHEMA.fields}
