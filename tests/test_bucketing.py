"""Bucketed co-located joins: same-key bucketed tables must sort-merge
join with NO shuffle (the pre-partitioning story for 100 TB)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from vbpl_web_crawl_spark.operators.bucketing import write_bucketed
from vbpl_web_crawl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    cust = load_table(spark, SF, "customer")
    orders = load_table(spark, SF, "orders")
    write_bucketed(cust, "b_customer", 8, "c_custkey")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "c_custkey"), "b_orders", 8, "c_custkey"
    )
    # force SMJ (broadcast would hide the bucketing effect at this SF)
    joined = (
        spark.table("b_orders")
        .hint("merge")
        .join(spark.table("b_customer").hint("merge"), "c_custkey")
        .select("c_custkey", "o_orderkey", "c_name")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # co-located buckets: zero shuffle
    # and the answer matches the plain-parquet join
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    assert joined.count() == plain
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_groupby_has_no_exchange(spark):
    orders = load_table(spark, SF, "orders")
    write_bucketed(orders, "b_orders2", 8, "o_custkey")
    agg = spark.table("b_orders2").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        agg.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan  # agg key == bucket key: no shuffle
    assert agg.count() == orders.select("o_custkey").distinct().count()
    spark.sql("DROP TABLE IF EXISTS b_orders2")
