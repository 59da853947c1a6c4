"""Semantic tests for the round-5 retrieval + LM-scoring operators:
BM25 top-k and bigram-LM fluency bucketing. Oracle parity of the full
queries is covered by the correctness gate; these pin the SEMANTICS on
planted data where the right answer is known by construction."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _write(spark, rows, tmp_path):
    sf = str(tmp_path / "sf")
    _docs(spark, rows).write.parquet(sf + "/documents.parquet")
    return sf


def test_bm25_matches_only_and_coverage_order(spark, tmp_path):
    """Docs with no query term never appear; a doc matching all three
    probe terms outranks a same-length doc matching one."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    rows = [
        (1, "spark join window", "en", "s"),
        (2, "spark alpha beta", "en", "s"),
        (3, "alpha beta gamma", "en", "s"),
    ]
    sf = _write(spark, rows, tmp_path)
    got = get_queries()["bm25_topk_docs"](spark, sf).collect()
    assert [r.doc_id for r in got] == [1, 2]
    assert got[0].bm25 > got[1].bm25 > 0.0


def test_bm25_length_normalization(spark, tmp_path):
    """Same tf, longer doc -> lower score (the b*dl/avgdl term)."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    rows = [
        (1, "spark alpha", "en", "s"),
        (2, "spark alpha alpha alpha alpha alpha", "en", "s"),
    ]
    sf = _write(spark, rows, tmp_path)
    got = {r.doc_id: r.bm25 for r in get_queries()["bm25_topk_docs"](spark, sf).collect()}
    assert got[1] > got[2] > 0.0


def test_bm25_tf_saturation(spark, tmp_path):
    """Doubling tf at fixed dl raises the score sublinearly (k1 cap):
    score(tf=4) < 2 * score(tf=2)."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    rows = [
        (1, "spark spark pad1 pad2 pad3 pad4 pad5 pad6", "en", "s"),
        (2, "spark spark spark spark pad1 pad2 pad3 pad4", "en", "s"),
    ]
    sf = _write(spark, rows, tmp_path)
    got = {r.doc_id: r.bm25 for r in get_queries()["bm25_topk_docs"](spark, sf).collect()}
    assert got[2] > got[1]
    assert got[2] < 2 * got[1]


def test_bm25_partitioning_invariant(spark, tmp_path):
    """Bit-identical result at 1 and 13 input partitions — integer
    numerators/denominators and a fixed-order 3-term float sum leave
    no accumulation-order dependence."""
    from vbpl_web_crawl_spark.plans.queries import get_queries
    from vbpl_web_crawl_spark.sources import tables as TBL

    rows = [
        (i, t, "en", "s")
        for i, t in enumerate(
            [
                "spark join window alpha",
                "spark spark beta gamma delta",
                "join window window epsilon",
                "zeta eta theta",
                "window spark join join join",
            ]
        )
    ]
    sf = _write(spark, rows, tmp_path)
    q = get_queries()["bm25_topk_docs"]
    base = [tuple(r) for r in q(spark, sf).collect()]

    orig = TBL.load_table

    def repart(spark_, sf_dir, name):
        return orig(spark_, sf_dir, name).repartition(13)

    TBL.load_table = repart
    try:
        import vbpl_web_crawl_spark.plans.pipeline_queries as PQ

        PQ.load_table = repart
        got = [tuple(r) for r in q(spark, sf).collect()]
    finally:
        TBL.load_table = orig
        PQ.load_table = orig
    assert got == base


def test_bigram_fluency_deterministic_vs_branching(spark, tmp_path):
    """A perfectly predictable token stream ('a b c a b c': after each
    token the successor is nearly forced) scores lower mean surprise
    than a branching stream ('x y x z': after x the LM splits 50/50).
    Hand-computed: doc1 mean = 6000 div 5 = 1200; doc2 = 5000 div 3
    = 1666."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    rows = [
        (1, "a b c a b c", "aa", "s"),
        (2, "x y x z", "bb", "s"),
    ]
    sf = _write(spark, rows, tmp_path)
    got = {
        (r.lang, r.bucket): (r.n_docs, r.avg_fluency)
        for r in get_queries()["lm_bigram_fluency_buckets"](spark, sf).collect()
    }
    assert got == {("aa", "head"): (1, 1200.0), ("bb", "head"): (1, 1666.0)}


def test_bigram_fluency_single_token_doc_drops(spark, tmp_path):
    """A one-token doc has no bigram -> contributes no row (identical
    drop semantics to the DuckDB oracle's inner join)."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    rows = [
        (1, "solo", "aa", "s"),
        (2, "p q p q", "bb", "s"),
    ]
    sf = _write(spark, rows, tmp_path)
    got = get_queries()["lm_bigram_fluency_buckets"](spark, sf).collect()
    assert [r.lang for r in got] == ["bb"]
