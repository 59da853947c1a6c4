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


# ------------------------------------------------- global_dense_rank


def test_global_dense_rank_matches_window(spark):
    """Sort-based dense rank == dense_rank() OVER (ORDER BY keys), with
    heavy key duplication so ranks are shared across rows AND range
    partitions carry repeated keys at their interiors."""
    from vbpl_web_crawl_spark.operators.sequence import global_dense_rank

    df = spark.range(20000).select(
        ((F.col("id") * 2654435761) % 97).alias("a"),
        ((F.col("id") * 48271) % 13).alias("b"),
        F.col("id").alias("rowid"),
    )
    totals: list = []
    got = global_dense_rank(
        df, ["a", "b"], out_col="dr", start=5, num_partitions=16, total_out=totals
    )
    w = Window.orderBy("a", "b")
    ref = df.withColumn("dr", (F.dense_rank().over(w) + 4).cast("long"))
    a = {(r.a, r.b, r.rowid): r.dr for r in got.collect()}
    b = {(r.a, r.b, r.rowid): r.dr for r in ref.collect()}
    assert a == b
    # total_out reports the exact distinct-key count (the suffix
    # doubler's convergence signal)
    assert totals == [df.select("a", "b").distinct().count()]
    spark.catalog.clearCache()


def test_global_dense_rank_chunk_carry(spark):
    """A key group spanning Arrow chunk boundaries inside one partition
    must not restart the rank: force tiny batches so every partition is
    many chunks, with long runs of equal keys crossing them."""
    from vbpl_web_crawl_spark.operators.sequence import global_dense_rank

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        df = spark.range(3000).select(
            (F.col("id") / 100).cast("long").alias("k"), F.col("id").alias("rowid")
        )
        got = global_dense_rank(df, ["k"], out_col="dr", num_partitions=3)
        w = Window.orderBy("k")
        ref = df.withColumn("dr", F.dense_rank().over(w).cast("long"))
        a = {(r.k, r.rowid): r.dr for r in got.collect()}
        b = {(r.k, r.rowid): r.dr for r in ref.collect()}
        assert a == b
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    spark.catalog.clearCache()


def test_global_dense_rank_empty_input(spark):
    from vbpl_web_crawl_spark.operators.sequence import global_dense_rank

    df = spark.createDataFrame([], "v int")
    totals: list = []
    assert global_dense_rank(df, ["v"], total_out=totals).count() == 0
    assert totals == [0]
    spark.catalog.clearCache()


# ------------------------------------------------- grouped_cumsum


def test_grouped_cumsum_matches_window(spark):
    """Large path == Window.partitionBy cumsum, with few groups spread
    over many range partitions (a group spans several partitions)."""
    from vbpl_web_crawl_spark.operators.sequence import grouped_cumsum

    df = spark.range(4000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("k"),
        ((F.col("id") * 48271) % 97).alias("v"),
    )
    got = grouped_cumsum(df, ["g"], ["k"], "v", "cum", num_partitions=16)
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = df.withColumn("cum", F.sum("v").over(w).cast("long"))
    a = {(r.g, r.k): r.cum for r in got.collect()}
    b = {(r.g, r.k): r.cum for r in ref.collect()}
    assert a == b
    spark.catalog.clearCache()


def test_grouped_cumsum_small_hint_identical(spark):
    from vbpl_web_crawl_spark.operators.sequence import grouped_cumsum

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 5), ("b", 1, 7), ("a", 3, 1), ("b", 2, 2)],
        "g string, k int, v int",
    )
    small = {
        (r.g, r.k): r.cum
        for r in grouped_cumsum(df, ["g"], ["k"], "v", approx_rows=5).collect()
    }
    large = {(r.g, r.k): r.cum for r in grouped_cumsum(df, ["g"], ["k"], "v").collect()}
    assert small == large == {
        ("a", 1): 10, ("a", 2): 15, ("a", 3): 16, ("b", 1): 7, ("b", 2): 9,
    }
    spark.catalog.clearCache()


def test_grouped_cumsum_more_groups_than_partitions(spark):
    """Many tiny groups packed into few partitions (several groups per
    partition, Arrow chunking inside) still match the window result."""
    from vbpl_web_crawl_spark.operators.sequence import grouped_cumsum

    df = spark.range(30000).select(
        (F.col("id") % 500).alias("g"), F.col("id").alias("k"), F.lit(1).alias("v")
    )
    got = grouped_cumsum(df, ["g"], ["k"], "v", "cum", num_partitions=4)
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = df.withColumn("cum", F.sum("v").over(w).cast("long"))
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0
    spark.catalog.clearCache()
