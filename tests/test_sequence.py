"""Parallel global sequencer == single-task window row_number."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.operators.sequence import global_sequence


def test_matches_global_window(spark):
    df = spark.range(5000).select(
        (F.col("id") * 2654435761 % 100000).alias("key"), F.col("id").alias("tie")
    )
    seq = global_sequence(df, ["key", "tie"], seq_col="seq", start=100)
    w = Window.orderBy("key", "tie")
    ref = df.withColumn("seq", (F.row_number().over(w) + 99).cast("long"))
    got = {(r.key, r.tie): r.seq for r in seq.collect()}
    want = {(r.key, r.tie): r.seq for r in ref.collect()}
    assert got == want


def test_dense_and_offset(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "v int")
    out = sorted((r.v, r.seq) for r in global_sequence(df, ["v"], start=7).collect())
    assert out == [(1, 7), (2, 8), (3, 9)]


def test_small_hint_path_identical(spark):
    df = spark.range(500).select(
        (F.col("id") * 48271 % 7919).alias("key"), F.col("id").alias("tie")
    )
    a = {(r.key, r.tie): r.seq for r in global_sequence(df, ["key", "tie"], approx_rows=500).collect()}
    b = {(r.key, r.tie): r.seq for r in global_sequence(df, ["key", "tie"]).collect()}
    assert a == b


def test_empty_input(spark):
    df = spark.createDataFrame([], "v int")
    assert global_sequence(df, ["v"]).count() == 0
