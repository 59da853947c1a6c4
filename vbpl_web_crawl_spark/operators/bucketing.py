"""Bucketed-table helpers: pre-shuffle once at write time, join forever
without an Exchange.

At 100 TB the flagship dossier join (orders ⋈ customer on custkey)
re-shuffles both fact tables every run if they live as plain parquet.
Bucketing both sides by the join key into the same bucket count makes
the sort-merge join zip co-located buckets: the plan audit in
tests/test_bucketing.py asserts the join subtree contains NO Exchange.
This is the parquet stand-in for Iceberg's ``bucket(N, key)`` partition
transform — the write shape the engine's inline notes
(plans/queries.py flagship) prescribe for the 100x deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str,
) -> None:
    """Persist ``df`` as a bucketed+sorted table on ``keys`` (drops any
    previous table of that name)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
