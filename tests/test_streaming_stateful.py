"""Stateful streaming first-seen dedup (applyInPandasWithState):
exactly-once emission per hash across micro-batches."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from vbpl_web_crawl_spark.streaming.stateful import streaming_first_seen

SRC_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SRC_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_first_seen_exactly_once_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    # three files -> three micro-batches (maxFilesPerTrigger=1) with
    # overlaps inside a batch, across batches, and across buckets
    _write_batch(spark, src, [(1, "a"), (2, "b"), (1, "a-dup-in-batch")])
    _write_batch(spark, src, [(2, "b-dup"), (3, "c"), (9, "i")])
    _write_batch(spark, src, [(3, "c-dup"), (1, "a-dup"), (17, "q")])

    out = streaming_first_seen(spark, src, SRC_SCHEMA, n_buckets=4, query_name="fs1")
    rows = out.collect()
    hashes = [r.url_hash for r in rows]
    assert sorted(hashes) == [1, 2, 3, 9, 17]
    assert len(hashes) == len(set(hashes)), "a hash must be emitted exactly once"
    # bucket assignment consistent with the seen-set partitioning
    for r in rows:
        assert r.bucket == r.url_hash % 4


def test_first_seen_matches_batch_distinct(spark, tmp_path):
    src = str(tmp_path / "src2")
    os.makedirs(src, exist_ok=True)
    rows = [(int(h), f"u{h}") for h in range(50)] + [
        (int(h), f"dup{h}") for h in range(0, 50, 3)
    ]
    _write_batch(spark, src, rows[:30])
    _write_batch(spark, src, rows[30:])
    out = streaming_first_seen(spark, src, SRC_SCHEMA, n_buckets=8, query_name="fs2")
    got = sorted(r.url_hash for r in out.collect())
    want = sorted(
        r.url_hash
        for r in spark.read.parquet(src).dropDuplicates(["url_hash"]).collect()
    )
    assert got == want
