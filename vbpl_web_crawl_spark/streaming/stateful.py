"""Custom stateful streaming operator: first-seen URL dedup as a
Structured Streaming stage (``applyInPandasWithState``).

This is the crawl's unseen gate (operators/seen.py) in continuous form:
keyed state per hash bucket holds the set of seen url_hashes; each
micro-batch emits only rows whose hash was never seen before, exactly
once across the whole stream. The reference's equivalent is the per-row
MySQL existence probe before insert (/root/reference/app/service/
vbpl.py:147-148) — here membership is a vectorized numpy check against
per-bucket state, no per-row I/O.

State format: one binary blob per bucket = sorted int64 hashes
(np.searchsorted membership). At production scale the blob becomes a
Bloom prefilter + RocksDB state store entries (Spark manages the state
store; the operator code is unchanged) — the test-scale blob keeps the
semantics bit-exact and the serialization trivial.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen_blob", T.BinaryType(), True)])


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    if state.exists:
        (blob,) = state.get
        seen = np.frombuffer(bytes(blob), dtype=np.int64)
    else:
        seen = np.empty(0, dtype=np.int64)
    for pdf in pdfs:
        arr = pdf["url_hash"].to_numpy(dtype=np.int64)
        # vectorized: not already in state AND first occurrence in batch
        in_state = seen[np.searchsorted(seen, arr).clip(max=len(seen) - 1)] == arr if len(seen) else np.zeros(len(arr), dtype=bool)
        first_in_batch = ~pd.Series(arr).duplicated().to_numpy()
        fresh = ~in_state & first_in_batch
        if fresh.any():
            out = pdf.loc[fresh, ["bucket", "url_hash", "url"]]
            seen = np.unique(np.concatenate([seen, arr[fresh]]))
            yield out
        else:
            # still merge batch-local info (none new) — nothing to emit
            pass
    state.update((seen.tobytes(),))


def streaming_first_seen(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    n_buckets: int = 8,
    query_name: str = "streaming_first_seen",
) -> DataFrame:
    """Drain ``src_dir`` (parquet files with at least url_hash/url
    columns) through the stateful dedup; returns the emitted first-seen
    rows as a batch DataFrame. AvailableNow + maxFilesPerTrigger=1 makes
    every input file its own micro-batch, so state genuinely carries
    across triggers (asserted in tests)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    tagged = stream.withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )
    deduped = tagged.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    ckpt = tempfile.mkdtemp(prefix="stateful_ckpt_")
    q = (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(ckpt, "s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
