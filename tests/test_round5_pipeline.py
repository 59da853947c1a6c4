"""Semantic tests for the round-5 pipeline operators: boilerplate
segment removal, SemDeDup, recrawl CDC delta, image-dedup keep-one,
and the compaction file planner. Oracle parity of the full queries is
covered by the correctness gate; these pin SEMANTICS on planted data
where the right answer is known by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import get_queries


def _write_docs(spark, rows, tmp_path, n_chars=False):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    if n_chars:
        df = df.withColumn("n_chars", F.length("text"))
    sf = str(tmp_path / "sf")
    df.write.parquet(sf + "/documents.parquet")
    return sf


# ------------------------------------------------------- boilerplate


def test_boilerplate_segments_flag_shared_prefix(spark, tmp_path):
    """Three docs share their first aligned 8-token segment (a planted
    nav-bar); each doc's tail segment is unique. Exactly one segment
    instance per sharing doc is dropped, none elsewhere."""
    nav = "home about contact login search cart help news"  # 8 tokens
    rows = [
        (1, nav + " alpha beta gamma delta one two three four", "en", "s0"),
        (2, nav + " epsilon zeta eta theta five six seven eight", "en", "s0"),
        (3, nav + " iota kappa lambda mu nine ten eleven twelve", "en", "s0"),
        (4, "totally unique words that never repeat anywhere else at all", "en", "s1"),
    ]
    sf = _write_docs(spark, rows, tmp_path)
    got = {
        r.source: r
        for r in get_queries()["boilerplate_segment_stats"](spark, sf).collect()
    }
    assert got["s0"].n_dropped_segments == 3
    assert got["s0"].n_docs_affected == 3
    assert got["s1"].n_dropped_segments == 0
    # each s0 doc = 16 tokens -> 2 segments; only the nav segment drops
    assert got["s0"].n_segments == 6
    assert got["s0"].drop_ratio == pytest.approx(0.5)


def test_boilerplate_partial_tail_segment_counted(spark, tmp_path):
    """A 10-token doc yields 2 segments (8 + a 2-token tail) — the tail
    is a segment of its own, not silently dropped."""
    rows = [(1, "a b c d e f g h tail1 tail2", "en", "s")]
    sf = _write_docs(spark, rows, tmp_path)
    row = get_queries()["boilerplate_segment_stats"](spark, sf).collect()[0]
    assert row.n_segments == 2
    assert row.n_dropped_segments == 0


# ----------------------------------------------------------- semdedup


def test_semantic_dedup_drops_near_identical_vectors(spark, tmp_path):
    """Plant an exact-duplicate embedding pair plus orthogonal-ish
    singletons: exactly one member of the pair (the larger vec_id) is
    dropped; total kept = n - 1."""
    from vbpl_web_crawl_spark.plans.pipeline_queries import _DIM

    def unit(axis):
        return [1.0 if d == axis else 0.0 for d in range(_DIM)]

    rows = [
        (0, unit(0), 0),
        (1, unit(0), 0),  # exact dup of vec 0 -> dropped
        (2, unit(7), 0),
        (3, unit(19), 0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    sf = str(tmp_path / "sf")
    df.write.parquet(sf + "/embeddings.parquet")
    got = get_queries()["semantic_dedup_keep_one"](spark, sf).collect()
    assert sum(r.n_dropped for r in got) == 1
    assert sum(r.n_kept for r in got) == 3
    assert all(r.n_kept + r.n_dropped == r.n_vectors for r in got)


# ---------------------------------------------------------------- cdc


def test_recrawl_cdc_classifies_by_residue(spark, tmp_path):
    """doc_ids picked to hit each residue class exactly once: 3 (added),
    5 (deleted), 7 (changed), 1 (unchanged)."""
    rows = [
        (3, "added later", "en", "s"),      # %11 == 3 -> not in old
        (5, "soon deleted", "en", "s"),     # %13 == 5 -> not in new
        (7, "gets revised", "en", "s"),     # %7 == 0 -> changed
        (1, "stays the same", "en", "s"),
    ]
    sf = _write_docs(spark, rows, tmp_path)
    got = {
        r.change_type: r.n_docs
        for r in get_queries()["recrawl_cdc_delta"](spark, sf).collect()
    }
    assert got == {"added": 1, "deleted": 1, "changed": 1, "unchanged": 1}


def test_recrawl_cdc_doc_absent_from_both_snapshots_excluded(spark, tmp_path):
    """doc_id 135 = 3 mod 11 AND 5 mod 13: in neither snapshot, so it
    must not appear in the delta at all."""
    rows = [(135, "ghost", "en", "s"), (1, "real", "en", "s")]
    sf = _write_docs(spark, rows, tmp_path)
    got = get_queries()["recrawl_cdc_delta"](spark, sf).collect()
    assert sum(r.n_docs for r in got) == 1


# ------------------------------------------------- image keep-one


def test_phash_keep_one_drops_all_but_representative(spark, tmp_path):
    """A 3-member phash family keeps its min-id member: 2 dropped in
    that source, none in the unrelated source."""
    prefix = "alpha bravo charlie delta echo foxtrot xx "  # 40-char family key
    rows = [
        (1, prefix + "golf unique tail", "en", "cam0"),
        (2, prefix + "hotel different tail", "en", "cam0"),
        (3, prefix + "india third member", "en", "cam0"),
        (4, "completely unrelated words all over here", "en", "cam1"),
    ]
    sf = _write_docs(spark, rows, tmp_path)
    got = {
        r.source: r for r in get_queries()["dedup_phash_keep_one"](spark, sf).collect()
    }
    assert got["cam0"].n_in_clusters == 3
    assert got["cam0"].n_dropped == 2
    assert got["cam1"].n_in_clusters == 0
    assert got["cam1"].n_dropped == 0


# ----------------------------------------------------- compaction


def test_compaction_plan_packs_by_leading_edge(spark, tmp_path):
    """Docs of 3000 chars against a 4096 target: file boundaries fall
    where the PRECEDING bytes cross a 4096 multiple (next-fit), so
    docs 1-2 -> files 0,0? no: doc1 before=0 -> f0, doc2 before=3000
    -> f0, doc3 before=6000 -> f1, doc4 before=9000 -> f2."""
    rows = [(i, "x" * 10, "en", "s") for i in range(1, 5)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.lit(3000))
    sf = str(tmp_path / "sf")
    df.write.parquet(sf + "/documents.parquet")
    got = sorted(
        get_queries()["compaction_file_plan"](spark, sf).collect(),
        key=lambda r: r.file_id,
    )
    assert [(r.file_id, r.n_docs, r.first_doc_id, r.last_doc_id) for r in got] == [
        (0, 2, 1, 2),
        (1, 1, 3, 3),
        (2, 1, 4, 4),
    ]


def test_compaction_plan_partitioning_invariant(spark, tmp_path):
    """The plan is a pure function of (source, doc_id, n_chars): a
    repartitioned read produces the identical plan rows."""
    import random

    rng = random.Random(7)
    rows = [
        (i, "t", "en", f"s{i % 3}") for i in range(1, 60)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", (F.col("doc_id") * 997 % 1500 + 100).cast("long"))
    sf = str(tmp_path / "sf")
    df.write.parquet(sf + "/documents.parquet")
    q = get_queries()["compaction_file_plan"]
    a = sorted(map(tuple, q(spark, sf).collect()))
    sf2 = str(tmp_path / "sf2")
    spark.read.parquet(sf + "/documents.parquet").repartition(13).write.parquet(
        sf2 + "/documents.parquet"
    )
    b = sorted(map(tuple, q(spark, sf2).collect()))
    assert a == b


# ------------------------------------------------------------- dsir


def test_dsir_target_lookalikes_score_above_divergent_docs(spark, tmp_path):
    """Docs sharing the target slice's bigrams must out-score docs made
    of bigrams the target never uses: every doc_id%5==0 doc is 'quality
    prose', lookalikes copy it, divergent docs use disjoint vocab."""
    quality = "the quick brown fox jumps over the lazy dog again and again"
    divergent = "zz yy xx ww vv uu tt ss rr qq pp oo"
    rows = (
        [(i * 5, quality, "en", "s") for i in range(1, 4)]  # target slice
        + [(7, quality, "en", "s"), (11, quality, "en", "s")]  # lookalikes
        + [(13, divergent, "en", "s"), (17, divergent, "en", "s")]
    )
    sf = _write_docs(spark, rows, tmp_path)
    got = get_queries()["dsir_importance_buckets"](spark, sf).collect()
    # reconstruct per-bin membership: lookalike bins must all sit above
    # every divergent bin (scores are per-bin min/max of member docs)
    assert len(got) >= 2
    hi = [r for r in got if r.max_score == max(x.max_score for x in got)]
    lo = [r for r in got if r.min_score == min(x.min_score for x in got)]
    assert hi[0].min_score > lo[0].max_score
    # target + lookalikes (5 docs) land in the top bin(s), divergent in
    # the bottom
    assert sum(r.n_docs for r in hi) == 5
    assert sum(r.n_docs for r in lo) == 2


# --------------------------------------------------------- chunking


def test_chunking_counts_and_overlap_volume(spark, tmp_path):
    """33 tokens with C=32/O=8 -> 2 chunks (starts 0 and 24), chunk
    tokens 32 + 9 = 41 = n + (k-1)*O; a 10-token doc -> 1 chunk of 10."""
    rows = [
        (1, " ".join(f"t{i}" for i in range(33)), "en", "s"),
        (2, " ".join(f"u{i}" for i in range(10)), "en", "s"),
    ]
    sf = _write_docs(spark, rows, tmp_path)
    row = get_queries()["chunking_overlap_stats"](spark, sf).collect()[0]
    assert row.n_docs == 2
    assert row.total_tokens == 43
    assert row.total_chunks == 3
    assert row.total_chunk_tokens == 41 + 10


def test_chunking_exact_stride_boundary(spark, tmp_path):
    """n = C + stride = 56 tokens -> exactly 2 full chunks, no ragged
    tail: starts 0,24 cover [0,32) and [24,56)."""
    rows = [(1, " ".join(f"t{i}" for i in range(56)), "en", "s")]
    sf = _write_docs(spark, rows, tmp_path)
    row = get_queries()["chunking_overlap_stats"](spark, sf).collect()[0]
    assert row.total_chunks == 2
    assert row.total_chunk_tokens == 64  # both chunks full C=32
