"""Semantic tests for the corpus-quality operators added in round 5:
duplicated-span coverage, unigram-rarity scoring, and tf-idf top terms.
The oracle parity of the full queries is covered by the correctness
gate; these tests pin the SEMANTICS on planted data where the right
answer is known by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_dup_span_coverage_planted_duplicate(spark, tmp_path):
    """A 5-word span planted verbatim in two docs counts as duplicated
    at every one of its positions in BOTH docs; unique text counts 0."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    span = "alpha bravo charlie delta echo"
    rows = [
        (1, span + " unique tail one", "en", "s"),
        (2, "other head " + span, "en", "s"),
        (3, "completely different words here now today", "en", "s"),
    ]
    sf = str(tmp_path / "sf")
    _docs(spark, rows).write.parquet(sf + "/documents.parquet")
    out = (
        get_queries()["dup_span_coverage"](spark, sf)
        .collect()[0]
        .asDict()
    )
    # doc1: 8 tokens -> 4 spans, doc2: 7 tokens -> 3 spans, doc3: 6 -> 2
    assert out["n_docs"] == 3
    assert out["total_spans"] == 9
    # only the planted span (position 0 in doc1, position 2 in doc2)
    # appears in >= 2 docs -> exactly 2 duplicated positions
    assert out["dup_spans"] == 2
    assert out["half_dup_docs"] == 0


def test_dup_span_within_doc_repeat_not_cross_doc(spark, tmp_path):
    """A span repeated twice INSIDE one doc but present in no other doc
    has doc-frequency 1 -> not duplicated (the signal is cross-doc)."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    span = "one two three four five"
    rows = [(1, span + " glue " + span, "en", "s")]
    sf = str(tmp_path / "sf")
    _docs(spark, rows).write.parquet(sf + "/documents.parquet")
    out = get_queries()["dup_span_coverage"](spark, sf).collect()[0].asDict()
    assert out["dup_spans"] == 0


def test_lm_unigram_rarity_orders_rare_vocab_first(spark, tmp_path):
    """A doc made of hapax tokens scores mean_freq == 1.0 and ranks
    above a doc made of corpus-dominant tokens."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    rows = [(i, "common common common", "en", "s") for i in range(10)]
    rows.append((99, "zyzzyva qwertyuiop hapaxlegomenon", "en", "s"))
    sf = str(tmp_path / "sf")
    _docs(spark, rows).write.parquet(sf + "/documents.parquet")
    got = get_queries()["lm_unigram_rarity_topk"](spark, sf).collect()
    assert got[0]["doc_id"] == 99
    assert got[0]["mean_freq"] == 1.0  # every token is a hapax
    # the common docs: every token has global count 30
    assert got[1]["mean_freq"] == 30.0


def test_lm_unigram_rarity_partitioning_invariant(spark, tmp_path):
    """Same result at 1 and 13 input partitions (exact integer sums +
    deterministic tiebreak — no float-accumulation order dependence)."""
    from vbpl_web_crawl_spark.plans.queries import get_queries
    from vbpl_web_crawl_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    q = get_queries()["lm_unigram_rarity_topk"]
    base = [r.asDict() for r in q(spark, sf).collect()]
    docs = load_table(spark, sf, "documents").repartition(13)
    docs.write.mode("overwrite").parquet(str(tmp_path / "sf13") + "/documents.parquet")
    got = [r.asDict() for r in q(spark, str(tmp_path / "sf13")).collect()]
    assert got == base


def test_tfidf_top_terms_hand_computed(spark, tmp_path):
    """3 docs, 2 sources: a term exclusive to one source with high tf
    beats ubiquitous terms (idf = N/df damps df=N terms to score=tf)."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    rows = [
        (1, "shared shared rare rare rare", "en", "a"),
        (2, "shared shared shared other", "en", "b"),
        (3, "shared other other", "en", "b"),
    ]
    sf = str(tmp_path / "sf")
    _docs(spark, rows).write.parquet(sf + "/documents.parquet")
    got = get_queries()["tfidf_top_terms_by_source"](spark, sf).collect()
    by_source = {}
    for r in got:
        by_source.setdefault(r["source"], []).append(r)
    a = by_source["a"]
    # source a: rare tf=3 df=1 N=3 -> score 9.0; shared tf=2 df=3 -> 2.0
    assert a[0]["term"] == "rare" and a[0]["score"] == 9.0
    assert a[1]["term"] == "shared" and a[1]["score"] == 2.0
    b = by_source["b"]
    # source b: shared tf=4 df=3 -> 4.0; other tf=3 df=2 -> 4.5 wins
    assert b[0]["term"] == "other" and b[0]["score"] == 4.5
    assert b[1]["term"] == "shared" and b[1]["score"] == 4.0
    # top-3 cap holds per source
    assert all(len(v) <= 3 for v in by_source.values())


def test_tfidf_no_cartesian_blowup(spark):
    """The doc-count crossJoin must be a broadcast of ONE row — the
    physical plan may not contain a non-broadcast cartesian product."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    df = get_queries()["tfidf_top_terms_by_source"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_decontaminate_planted_overlap(spark, tmp_path):
    """A training doc that quotes an 8-word span from an eval doc
    (doc_id % 97 == 0) is flagged; clean training docs are not."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    quote = "q1 q2 q3 q4 q5 q6 q7 q8"
    rows = [
        (97, "eval doc starts " + quote + " eval tail", "en", "s"),  # eval
        (1, "training head " + quote + " training tail", "en", "s"),  # hit
        (2, "totally unrelated training words with no overlap at all here", "en", "s"),
        (3, "another clean training document body entirely fresh tokens", "en", "s"),
    ]
    sf = str(tmp_path / "sf")
    _docs(spark, rows).write.parquet(sf + "/documents.parquet")
    out = get_queries()["decontaminate_eval_overlap"](spark, sf).collect()[0].asDict()
    assert out["n_train"] == 3
    assert out["n_contaminated"] == 1
    # the quote is the only hit span and occurs at exactly 1 position
    assert out["total_hit_spans"] == 1
