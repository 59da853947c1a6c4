"""Hive-style bucketed table layout: the write-once, join-forever
co-location strategy for repeated fact-to-fact joins.

Reference parity: the reference stores everything in one Postgres
instance (/root/reference/app/model/*.py via SQLAlchemy), where the
B-tree on the join key makes repeated document<->section joins cheap;
the distributed analog is bucketing — hash-cluster both tables into
the same number of buckets ON THE JOIN KEY at write time, after which
every equi-join on that key is Exchange-free (Spark matches bucket i
of one side to bucket i of the other, no shuffle ever again).

Scale notes (100 TB): a fact table joined N times amortizes ONE
bucketed write against N avoided full-table shuffles — at 100 TB a
single avoided shuffle is the difference between a network-bound and
a scan-bound job. ``sortBy`` on the bucket key additionally makes the
join a zipper merge (per-partition Sort nodes are eliminated or cheap,
no spill). The bucket count is fixed at write time: choose it for the
TARGET scale (buckets ~ total-cores * small-constant at the largest
consumer), not the current one — AQE cannot re-bucket a stored table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _drop_with_location(spark: SparkSession, table: str) -> None:
    """Drop ``table`` AND its warehouse directory. A session-scoped
    catalog forgets managed tables across restarts while their
    directories persist, and saveAsTable refuses to reuse an orphaned
    location (LOCATION_ALREADY_EXISTS) — so clear both, via the Hadoop
    FileSystem API so the same code works on HDFS/object stores."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{wh}/{table.lower()}")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key: str,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a parquet datasource table hash-bucketed
    (and optionally sorted) on ``key``. Overwrites any existing table
    or orphaned location: callers never read stale buckets after
    upstream data changes."""
    _drop_with_location(df.sparkSession, table)
    # pre-cluster rows into their buckets (same murmur3-mod hash family
    # the bucketed layout uses): the write then runs `buckets`-wide with
    # ONE file per bucket, instead of inheriting the scan's task count
    # (a single-row-group input would write all buckets from one task)
    # and emitting tasks x buckets files (guide §6 small-files)
    df = df.repartition(buckets, key)
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Equi-join two tables previously written by :func:`write_bucketed`
    with the SAME bucket count on their join keys. Pinned to the
    sort-merge strategy — the fact-to-fact case bucketing exists for —
    so the plan is the bucket-i-to-bucket-i zipper at every scale: no
    Exchange on either input (asserted by tests/test_bucketing_sssp.py
    and the bench plan-shape suite); only downstream operators
    shuffle."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
