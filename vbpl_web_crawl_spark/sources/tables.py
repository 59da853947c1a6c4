"""Table catalog over the driver-provided parquet directories.

The driver ships TPC-H-ish tables plus ``documents`` (text corpus) and
``embeddings`` at ``/root/testdata/sf{0.001,0.01,0.1}``; see TESTDATA.md.
At production scale these would be Iceberg tables — the reader keeps a
single entry point so the storage layer can swap without touching the
operator code (Iceberg is not available in this sandbox; parquet is the
fallback per SURVEY.md §7).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Column pruning + predicate pushdown happen
    at the parquet scan via Catalyst — never pre-select here."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame, *keys: str, factor: int = 1) -> DataFrame:
    """Rebalance a narrow scan across the cluster BEFORE expensive
    per-row compute (guide §2.4/§8: a single-row-group parquet file
    yields ONE scan task no matter the core count, serializing every
    tokenize/hash/explode that follows).

    Keyed form (``spread(df, "doc_id")``) hash-partitions on the
    downstream window/groupBy key so the one exchange both spreads the
    compute AND satisfies the downstream distribution requirement —
    no second exchange appears. Keyless form round-robins.

    Scale-adaptive, not a constant: the target is
    ``defaultParallelism * factor`` (cluster-derived), and when the
    scan already yields at least that many partitions (the real-scale
    case — many files / many row groups) this is a NO-OP, so no
    exchange is added where the layout is already parallel."""
    par = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= par:
        return df
    if keys:
        from pyspark.sql import functions as F

        return df.repartition(par, *[F.col(k) for k in keys])
    return df.repartition(par)


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every catalog table as a temp view; returns the frames."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
