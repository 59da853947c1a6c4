"""Scalable global sequence assignment.

`Window.orderBy(...)` with no partition key funnels every row through
ONE task — fine for a politeness-bounded scheduled set, fatal for the
frontier-expansion link stream at 10^10 scale. `global_sequence`
assigns the same dense 0..N-1 rank in parallel:

1. range-repartition + sort within partitions on the sort key
   (parallel range sort — Spark's distributed sort machinery),
2. count rows per partition (tiny job; one long per partition),
3. cumulative offsets on the driver (one number per partition),
4. per-partition local index + offset inside an Arrow batch iterator.

Deterministic whenever the sort key is a total order (callers append a
unique tiebreaker column). The result equals the single-task window's
row_number - 1 exactly — verified in tests against the window version.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


SMALL_INPUT_THRESHOLD = 100_000


def global_sequence(
    df: DataFrame,
    sort_cols: list,
    seq_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
    approx_rows: int | None = None,
    caches: list | None = None,
) -> DataFrame:
    """Append ``seq_col`` = dense global rank (start, start+1, ...) in
    ``sort_cols`` order, without a single-task global window.

    When the caller knows the input is small (``approx_rows`` below the
    threshold), a plain window is cheaper (saves the count job + cache);
    both paths produce identical output (unit-tested), so the switch is
    purely physical.

    The large path persists the range-partitioned frame (count job +
    downstream read). Pass ``caches`` (a list) to receive it for
    unpersisting once the output is consumed; with ``caches=None`` the
    cache lives until the caller clears it.
    """
    if approx_rows is not None and approx_rows <= SMALL_INPUT_THRESHOLD:
        from pyspark.sql import Window

        w = Window.orderBy(*sort_cols)
        return df.withColumn(
            seq_col, (F.row_number().over(w) + F.lit(start) - 1).cast("long")
        )
    spark = df.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, *sort_cols).sortWithinPartitions(*sort_cols)
    ranged = ranged.persist()
    if caches is not None:
        caches.append(ranged)
    counts = (
        ranged.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    sizes = {r["__pid"]: r["count"] for r in counts}
    offsets = {}
    acc = start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    out_schema = T.StructType(df.schema.fields + [T.StructField(seq_col, T.LongType(), False)])
    cols = [f.name for f in out_schema.fields]
    b_offsets = spark.sparkContext.broadcast(offsets)

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        local = 0
        base = b_offsets.value.get(pid, 0)
        for pdf in it:
            n = len(pdf)
            pdf = pdf.copy()
            pdf[seq_col] = pd.array(range(base + local, base + local + n), dtype="Int64")
            local += n
            yield pdf[cols]

    out = ranged.mapInPandas(assign, out_schema)
    return out
