"""Semantic tests for the round-5 scrub/funnel/image-dedup operators:
perceptual-hash near-dup pairs, PII redaction stats, and the
quality-filter funnel. Oracle parity of the full queries is covered by
the correctness gate; these pin SEMANTICS on planted data where the
right answer is known by construction."""

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


# ---------------------------------------------------------------- phash


def test_phash_pairs_find_planted_family(spark, tmp_path):
    """Docs sharing a 40-char normalized prefix model re-encodes of one
    source image: every such pair differs by at most the two planted
    flip bits -> Hamming <= 2 -> reported; unrelated docs (~Hamming 30)
    are not."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    prefix = "alpha bravo charlie delta echo foxtrot xx "  # first 40 shared
    rows = [
        (1, prefix + "golf unique tail", "en", "s"),
        (2, prefix + "hotel different tail", "en", "s"),
        (3, prefix + "india third member", "en", "s"),
        (4, "completely unrelated words all over here", "en", "s"),
        (5, "another disjoint document with other text", "en", "s"),
    ]
    sf = _write(spark, rows, tmp_path)
    got = {
        (r.image_a, r.image_b): r.hamming
        for r in get_queries()["dedup_phash_hamming_pairs"](spark, sf).collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert all(h <= 2 for h in got.values())


def test_phash_same_doc_keyed_flip_gives_hamming_zero_or_two(spark, tmp_path):
    """Two family members whose doc-keyed flips land on the SAME bit
    have identical phash (Hamming 0); distinct flip bits give exactly
    Hamming 2 — never 1 (both differ from base by one bit each)."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    prefix = "x" * 45
    rows = [(i, prefix + f" tail{i}", "en", "s") for i in range(1, 9)]
    sf = _write(spark, rows, tmp_path)
    hams = [
        r.hamming
        for r in get_queries()["dedup_phash_hamming_pairs"](spark, sf).collect()
    ]
    assert hams and all(h in (0, 2) for h in hams)


# ------------------------------------------------------------------ PII


def test_pii_redaction_masks_planted_and_text_pii(spark, tmp_path):
    """Each row plants one email + one phone; a doc whose TEXT also
    contains an email-shaped token is counted twice and fully masked —
    no '@' or '+1-555-' survives in any redacted string."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    rows = [
        (1, "plain words only here", "en", "s"),
        (2, "contact leaked.addr@corp.example in body", "en", "s"),
    ]
    sf = _write(spark, rows, tmp_path)
    out = get_queries()["pii_redaction_stats"](spark, sf).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["n_docs"] == 2
    assert r["total_emails"] == 3  # 2 planted + 1 in-text
    assert r["total_phones"] == 2
    assert "@" not in r["first_redacted"]
    assert "<EMAIL>" in r["first_redacted"] and "<PHONE>" in r["first_redacted"]


# --------------------------------------------------------------- funnel


def test_funnel_stages_drop_expected_docs(spark, tmp_path):
    """One doc engineered to fail each stage, one passing all four:
    survivors are strictly attributed to the FIRST failing stage."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    good_words = [f"w{i:02d}x" for i in range(30)]  # 30 distinct 4-char
    rows = [
        (1, " ".join(good_words), "en", "s"),  # passes all
        (2, "too short", "en", "s"),  # fails length (n=2)
        # 30 tokens but mean word len 2 -> fails stage 2
        (3, " ".join(f"a{i % 9}" for i in range(30)), "en", "s"),
        # 30 tokens, one token 60% of mass -> fails repetition
        (4, " ".join(["dup"] * 18 + [f"u{i:03d}q" for i in range(12)]), "en", "s"),
        # 40 tokens from 8 distinct -> distinct ratio 0.2, top 5/40 ok
        (5, " ".join([f"v{i}wx" for i in range(8)] * 5), "en", "s"),
    ]
    sf = _write(spark, rows, tmp_path)
    out = {
        r.stage: (r.survivors, r.dropped)
        for r in get_queries()["quality_filter_funnel"](spark, sf).collect()
    }
    assert out["length"] == (4, 1)
    assert out["mean_word_len"] == (3, 1)
    assert out["repetition"] == (2, 1)
    assert out["lexical_diversity"] == (1, 1)


def test_funnel_monotone_on_real_data(spark):
    """On the sf0.001 corpus: survivors are non-increasing, drops are
    non-negative, and the funnel keeps a non-trivial fraction."""
    import tests.conftest as C
    from vbpl_web_crawl_spark.plans.queries import get_queries

    rows = sorted(
        get_queries()["quality_filter_funnel"](spark, C.SF_DIR).collect(),
        key=lambda r: r.stage_id,
    )
    surv = [r.survivors for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(r.dropped >= 0 for r in rows)
    assert surv[-1] > 0
