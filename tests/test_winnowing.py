"""Winnowing document fingerprints (plans/pipeline_queries.py):
the SIGMOD'03 guarantee, density bounds, partitioning invariance, and
the hot-fingerprint DF cap that keeps the pairs join linear."""

import pyspark.sql.functions as F
import pytest

from vbpl_web_crawl_spark.plans.pipeline_queries import (
    WINNOW_DF_CAP,
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_substring_guarantees_shared_fingerprint(spark):
    """Any substring match of length >= k + w - 1 MUST share at least
    one fingerprint (the winnowing guarantee) — even when the rest of
    the two documents is completely different."""
    t = WINNOW_K + WINNOW_W - 1  # 23
    shared = "the quick brown fox jumps over the lazy dog"[: t + 5]
    rows = [
        (1, "aaaa bbbb cccc " + shared + " xxxx yyyy zzzz qqqq wwww"),
        (2, "1111 2222 3333 4444 " + shared + " 9999 8888 7777 6666"),
    ]
    fps = winnow_fingerprints(_docs(spark, rows))
    a = {r.fp for r in fps.filter(F.col("doc_id") == 1).collect()}
    b = {r.fp for r in fps.filter(F.col("doc_id") == 2).collect()}
    assert a & b, "winnowing guarantee violated: no shared fingerprint"


def test_disjoint_docs_share_nothing(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "0123456789 !@#$%^&*() QRSTUV WXYZ 999888777666555444333"),
    ]
    fps = winnow_fingerprints(_docs(spark, rows))
    a = {r.fp for r in fps.filter(F.col("doc_id") == 1).collect()}
    b = {r.fp for r in fps.filter(F.col("doc_id") == 2).collect()}
    assert not (a & b)


def test_density_and_bounds(spark):
    """Fingerprint count per doc is bounded by the number of full
    windows and hovers near the 2/(w+1) expected density."""
    import random

    texts = []
    for i in range(30):
        rng = random.Random(f"density{i}")
        body = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(400))
        texts.append((i, body))
    fps = winnow_fingerprints(_docs(spark, texts))
    counts = {r.doc_id: r.n for r in fps.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    n_grams = 400 - WINNOW_K + 1
    n_windows = n_grams - WINNOW_W + 1
    for d, n in counts.items():
        assert 1 <= n <= n_windows
    avg = sum(counts.values()) / len(counts)
    expect = 2.0 * n_grams / (WINNOW_W + 1)
    assert 0.4 * expect <= avg <= 2.0 * expect, (avg, expect)


def test_partitioning_invariance(spark):
    rows = [(i, f"document body number {i} with some repeated filler text "
            * 3) for i in range(20)]
    one = winnow_fingerprints(_docs(spark, rows).repartition(1)).collect()
    many = winnow_fingerprints(_docs(spark, rows).repartition(16)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_short_docs_drop_out(spark):
    rows = [(1, "tiny"), (2, "x" * (WINNOW_K + WINNOW_W - 2)), (3, "y" * 100)]
    got = {r.doc_id for r in winnow_fingerprints(_docs(spark, rows)).collect()}
    assert got == {3}


def test_boilerplate_df_cap_bounds_candidates(spark):
    """A corpus-wide boilerplate opening (same first 60 chars in every
    doc) would make every doc pair a candidate; the DF cap drops those
    fingerprints so candidate volume stays O(docs * cap), and only the
    genuinely-duplicated pair survives the shared_fps >= 3 filter."""
    from vbpl_web_crawl_spark.plans.pipeline_queries import q_winnow_pairs

    boiler = "CONG HOA XA HOI CHU NGHIA VIET NAM - Doc lap Tu do "
    rows = []
    for i in range(40):
        rows.append((i, boiler + f"unique tail {i} " + f"{i}" * 30 + chr(65 + i % 26) * 40))
    rows.append((100, boiler + "identical interesting payload body AAAA BBBB CCCC DDDD"))
    rows.append((101, boiler + "identical interesting payload body AAAA BBBB CCCC DDDD"))
    docs = _docs(spark, rows)
    fps = winnow_fingerprints(docs)
    ok = (
        fps.groupBy("fp").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= WINNOW_DF_CAP).select("fp")
    )
    capped = fps.join(ok, "fp")
    a, b = capped.alias("a"), capped.alias("b")
    candidates = a.join(
        b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).count()
    assert candidates <= len(rows) * WINNOW_DF_CAP * 8  # linear, not 42*41/2 * fps
    # and the true duplicate pair is still found by the registered query
    pairs = (
        fps.join(ok, "fp").alias("a")
        .join(
            fps.join(ok, "fp").alias("b"),
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 3)
        .collect()
    )
    assert (100, 101) in {(r.doc_a, r.doc_b) for r in pairs}
