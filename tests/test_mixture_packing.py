"""Semantic tests for the corpus-mixture sampling weights and the
concat-and-chunk sequence packing stats, on planted data where the
right answer is known by construction. Oracle parity of the full
queries is covered by the correctness gate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import get_queries


def _write_docs(spark, rows, tmp_path):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    sf = str(tmp_path / "sf")
    df.write.parquet(sf + "/documents.parquet")
    return sf


def test_mixture_weights_cap_binds_on_tiny_stream(spark, tmp_path):
    """Two streams, 100 vs 4 tokens: sqrt temperature gives the tiny
    stream weight sqrt(4)/(sqrt(100)+sqrt(4)) = 1/6, implying
    104/6 / 4 = 4.33 epochs — above the 2.0 cap, so its draws clamp to
    8 tokens and the final share renormalizes."""
    rows = [
        (1, " ".join(f"w{i}" for i in range(100)), "en", "big"),
        (2, "a b c d", "en", "small"),
    ]
    sf = _write_docs(spark, rows, tmp_path)
    got = {
        r.source: r
        for r in get_queries()["mixture_sampling_weights"](spark, sf).collect()
    }
    big, small = got["big"], got["small"]
    assert small.total_tokens == 4 and big.total_tokens == 100
    assert small.capped and not big.capped
    assert small.weight_raw == pytest.approx(2.0 / 12.0, abs=1e-6)
    assert small.epochs_uncapped == pytest.approx(104.0 / 6.0 / 4.0, abs=1e-4)
    assert small.draws_tokens == pytest.approx(8.0)  # 2.0 epochs * 4 tokens
    big_draws = (10.0 / 12.0) * 104.0
    assert big.draws_tokens == pytest.approx(round(big_draws, 2))
    assert small.share_final == pytest.approx(8.0 / (8.0 + big_draws), abs=1e-6)
    assert big.share_final + small.share_final == pytest.approx(1.0, abs=1e-5)


def test_mixture_weights_shares_sum_to_one(spark, tmp_path):
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(5 + 7 * (i % 4))), "en", f"s{i % 5}")
        for i in range(40)
    ]
    sf = _write_docs(spark, rows, tmp_path)
    out = get_queries()["mixture_sampling_weights"](spark, sf).collect()
    assert sum(r.share_final for r in out) == pytest.approx(1.0, abs=1e-4)
    # no stream may exceed the epoch cap after clamping
    for r in out:
        assert r.draws_tokens <= 2.0 * r.total_tokens + 1e-6


def test_sequence_packing_boundary_docs(spark, tmp_path):
    """One source with token counts 400, 200, 424: concatenated stream
    offsets are [0,400), [400,600), [600,1024) at ctx=512 — doc 2
    straddles the first boundary, doc 3 ends exactly at bin edge 1024
    and straddles the 512 boundary. 1024 tokens = exactly 2 bins,
    fill ratio 1.0."""
    rows = [
        (1, " ".join(f"a{i}" for i in range(400)), "en", "s0"),
        (2, " ".join(f"b{i}" for i in range(200)), "en", "s0"),
        (3, " ".join(f"c{i}" for i in range(424)), "en", "s0"),
    ]
    sf = _write_docs(spark, rows, tmp_path)
    row = get_queries()["sequence_packing_stats"](spark, sf).collect()[0]
    assert row.n_docs == 3
    assert row.total_tokens == 1024
    assert row.n_bins == 2
    assert row.fill_ratio == pytest.approx(1.0)
    # doc1 [0,400) inside bin 0; doc2 [400,600) crosses 512; doc3
    # [600,1024) stays inside bin 1 (ends exactly at the edge)
    assert row.n_boundary_docs == 1
    spark.catalog.clearCache()


def test_sequence_packing_empty_and_exact_fit(spark, tmp_path):
    """Empty docs contribute 0 tokens and never count as boundary
    docs; a source totalling an exact multiple of ctx has fill 1.0."""
    rows = [
        (1, " ".join(f"x{i}" for i in range(512)), "en", "s0"),
        (2, "", "en", "s0"),
        (3, " ".join(f"y{i}" for i in range(512)), "en", "s0"),
        (4, " ".join(f"z{i}" for i in range(10)), "en", "s1"),
    ]
    sf = _write_docs(spark, rows, tmp_path)
    got = {
        r.source: r
        for r in get_queries()["sequence_packing_stats"](spark, sf).collect()
    }
    assert got["s0"].total_tokens == 1024
    assert got["s0"].n_bins == 2
    assert got["s0"].fill_ratio == pytest.approx(1.0)
    assert got["s0"].n_boundary_docs == 0
    assert got["s1"].n_bins == 1
    assert got["s1"].fill_ratio == pytest.approx(10.0 / 512.0, abs=1e-6)
    spark.catalog.clearCache()


def test_incremental_dedup_crosses_split_only(spark, tmp_path):
    """Planted corpus where the right pairs are known by construction:
    doc 4 (incoming, id % 4 == 0) duplicates corpus doc 5 -> the one
    expected pair; docs 8 and 12 duplicate each other but are BOTH
    incoming, and docs 1/2 duplicate each other but are BOTH corpus —
    neither may pair, because dedup-on-ingest only compares the new
    batch against the existing corpus."""
    dup_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(8))
    dup_b = " ".join(f"delta{i} eps{i} zeta{i}" for i in range(8))
    rows = [
        (1, dup_b, "en", "s0"),
        (2, dup_b, "en", "s0"),
        (3, " ".join(f"lone{i}" for i in range(24)), "en", "s0"),
        (4, dup_a, "en", "s0"),
        (5, dup_a, "en", "s0"),
        (8, " ".join(f"ing{i} est{i}" for i in range(12)), "en", "s0"),
        (12, " ".join(f"ing{i} est{i}" for i in range(12)), "en", "s0"),
    ]
    sf = _write_docs(spark, rows, tmp_path)
    out = get_queries()["dedup_incremental_pairs"](spark, sf).collect()
    assert [(r.inc_id, r.corpus_id, r.jaccard) for r in out] == [(4, 5, 1.0)]


def test_mixture_materialize_hash_order_prefix(spark, tmp_path):
    """Two streams with known budgets: the selected set must be exactly
    the md5(doc_id)-ordered prefix that fills each stream's one-epoch
    budget, straddler included. Expected sets computed independently
    in pure Python."""
    import hashlib

    rows = [
        (i, " ".join(f"b{i}_{j}" for j in range(10)), "en", "big")
        for i in range(1, 11)
    ] + [(100 + i, " ".join(f"s{i}_{j}" for j in range(5)), "en", "small")
         for i in range(2)]
    sf = _write_docs(spark, rows, tmp_path)
    got = {
        r.source: r
        for r in get_queries()["mixture_materialize_stats"](spark, sf).collect()
    }
    # totals: big=100, small=10; z = 10+sqrt(10); budgets:
    # big: min(sqrt(100)/z*110, 200, 100); small: min(sqrt(10)/z*110, 20, 10)
    z = 10.0 + math.sqrt(10.0)
    b_big = min(10.0 / z * 110.0, 100.0)
    b_small = min(math.sqrt(10.0) / z * 110.0, 20.0, 10.0)
    # expected selection: hash-order docs, take while cum_before < budget
    def expect(ids, tok, budget):
        order = sorted(ids, key=lambda d: hashlib.md5(str(d).encode()).hexdigest())
        cum, n, t = 0, 0, 0
        for d in order:
            if cum < budget:
                n += 1
                t += tok
            cum += tok
        return n, t
    n_big, t_big = expect(list(range(1, 11)), 10, b_big)
    n_small, t_small = expect([100, 101], 5, b_small)
    assert (got["big"].n_docs_selected, got["big"].tokens_selected) == (n_big, t_big)
    assert (got["small"].n_docs_selected, got["small"].tokens_selected) == (
        n_small,
        t_small,
    )
    assert got["big"].budget_tokens == pytest.approx(round(b_big, 2))
    assert got["small"].budget_tokens == pytest.approx(round(b_small, 2))
    # overshoot only ever comes from the straddling doc
    assert got["big"].tokens_selected - b_big < 10
    spark.catalog.clearCache()


def test_alignment_funnel_planted_geometry(spark, tmp_path):
    """Label 0: anchor (min vec_id) e0, one identical vector (cos 1.0),
    one orthogonal (cos 0.0), one opposite (cos -1.0) — thresholds and
    the integer-summed mean are known exactly."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [2.0, 0.0, 0.0, 0.0], 0),
        (2, [0.0, 3.0, 0.0, 0.0], 0),
        (3, [-1.0, 0.0, 0.0, 0.0], 0),
        (10, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(sf + "/embeddings.parquet")
    got = {
        r.label: r
        for r in get_queries()["multimodal_alignment_funnel"](spark, sf).collect()
    }
    l0 = got[0]
    assert (l0.n_pairs, l0.keep_t00, l0.keep_t20, l0.keep_t40) == (4, 3, 2, 2)
    assert l0.avg_score == pytest.approx((1.0 + 1.0 + 0.0 - 1.0) / 4.0)
    l1 = got[1]
    assert (l1.n_pairs, l1.keep_t40, l1.avg_score) == (1, 1, 1.0)


def test_keep_best_quality_prefers_quality_over_id(spark, tmp_path):
    """Docs 1 and 2 are near-identical (Jaccard > 0.9) but doc 2 ends
    with stopwords, earning the extra quality quarter — the cluster
    representative must be doc 2 even though doc 1 has the lower id."""
    body = " ".join(f"tok{i} mid{i} end{i}" for i in range(20))
    rows = [
        (1, body, "en", "s0"),
        (2, body + " the of", "en", "s0"),
        (3, " ".join(f"other{i}" for i in range(30)), "en", "s0"),
    ]
    sf = _write_docs(spark, rows, tmp_path)
    out = get_queries()["dedup_keep_best_quality"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.kept_doc == 2
    assert r.kept_quality == pytest.approx(1.0)
    assert (r.n_members, r.n_dropped) == (2, 1)
    spark.catalog.clearCache()
