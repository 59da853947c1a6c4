"""Round-5 continuation queries, part 13: the lakehouse upsert
contract as a DRIVER gate.

The S9/T6 upsert seam (sources/lakehouse.py — the reference's
check-then-insert-or-update at /root/reference/app/service/vbpl.py:
186-252, re-expressed as Iceberg ``MERGE INTO`` / snapshot-versioned
parquet) was previously certified only by the pytest contract suite.
This gate routes the WHOLE contract through the driver's
oracle comparison: build snapshot v1 from a deterministic slice of
``orders``, MERGE a deterministic update+insert batch into it (one
new snapshot), then TIME-TRAVEL read BOTH snapshots and aggregate.
The oracle reconstructs the two versions' expected contents in pure
SQL, so any of these defects flips a value hash:

- merge dropping an insert, duplicating a matched key, or updating
  the wrong rows;
- the snapshot pointer protocol serving v2 under the v1 read (or a
  half-committed mix);
- time travel reading the wrong ``v-<n>`` directory.

Money stays integer end-to-end (floor-cents) because the driver's
compare stringifies cells: Spark ``F.floor`` on a double is LongType
and DuckDB ``CAST(floor(..) AS BIGINT)`` states the identical int64,
with no float-sum association order in either engine.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table

_LAKEHOUSE_MERGE_SQL = """
WITH v1 AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 < 7
),
v2 AS (
  -- merged state: keys 0-3 keep the base row, 4-6 are MATCHED ->
  -- UPDATE (+1000), 7-9 are NOT MATCHED -> INSERT (+1000)
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 >= 4 THEN o_totalprice + 1000
              ELSE o_totalprice END AS o_totalprice
  FROM orders
),
u AS (
  SELECT CAST(1 AS BIGINT) AS version, o_orderkey, o_totalprice FROM v1
  UNION ALL
  SELECT CAST(2 AS BIGINT), o_orderkey, o_totalprice FROM v2
)
SELECT version,
       o_orderkey % 10 AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       min(o_orderkey) AS min_key,
       max(o_orderkey) AS max_key
FROM u
GROUP BY version, o_orderkey % 10
ORDER BY version, bucket
"""


@_register("lakehouse_merge_timetravel", _LAKEHOUSE_MERGE_SQL)
def q_lakehouse_merge_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """replace -> MERGE -> time-travel both snapshots, through the
    real LakehouseTable write/commit/read path (fresh table per call)."""
    from vbpl_web_crawl_spark.sources.lakehouse import LakehouseTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = orders.filter(F.col("o_orderkey") % 10 < 7)
    delta = orders.filter(F.col("o_orderkey") % 10 >= 4).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000
    )
    t = LakehouseTable.for_path(
        spark, tempfile.mkdtemp(prefix="lh_gate_")
    )
    t.replace(base)  # snapshot v-1
    t.merge(delta, keys=["o_orderkey"])  # snapshot v-2
    assert t.snapshots() == ["v-00000001", "v-00000002"], t.snapshots()
    both = t.read(1).withColumn(
        "version", F.lit(1).cast("long")
    ).unionByName(t.read(2).withColumn("version", F.lit(2).cast("long")))
    return (
        both.groupBy("version", (F.col("o_orderkey") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100)).alias("sum_cents"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("version", "bucket")
    )
