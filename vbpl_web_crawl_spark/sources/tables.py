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
