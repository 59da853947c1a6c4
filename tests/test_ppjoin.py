"""Prefix-filtered exact set-similarity join (plans/pipeline_queries8):
result equality vs the naive all-pairs join, inclusive behavior at the
exact tau boundary, and the pruning evidence — hot boilerplate
shingles never reach the candidate shuffle."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.pipeline_queries import capped_shingles
from vbpl_web_crawl_spark.plans.pipeline_queries8 import (
    ppjoin_candidates,
    ppjoin_pairs,
)

_UNCAPPED = 1 << 62


def _corpus(spark):
    """Handcrafted docs: one high-sim pair, one pair at EXACTLY
    jaccard 3/5, one sub-threshold pair, and 10 docs pairwise related
    ONLY through a shared boilerplate footer run (the hot-shingle skew
    case the DF-capped path solves by dropping recall)."""
    rows = []
    # near-dup pair (ids 1,2): 12 tokens, last differs ->
    # 10 shingles each, 9 common, jaccard 9/11
    base = " ".join(f"w{i}" for i in range(11))
    rows.append((1, base + " endA"))
    rows.append((2, base + " endB"))
    # boundary pair (ids 3,4): 4 shingles each, 3 common ->
    # jaccard exactly 3/5 (must be INCLUDED: integer predicate is >=)
    run = "b1 b2 b3 b4 b5"
    rows.append((3, run + " tailC"))
    rows.append((4, run + " tailD"))
    # sub-threshold pair (ids 5,6): shared 5-token run inside longer
    # distinct docs -> 3 common of 9+9 shingles, jaccard 3/15 < 3/5
    mid = "m1 m2 m3 m4 m5"
    rows.append((5, "x1 x2 x3 " + mid + " x4 x5 x6"))
    rows.append((6, "y1 y2 y3 " + mid + " y4 y5 y6"))
    # boilerplate cohort (ids 100..109): unique bodies + shared footer
    for d in range(10):
        body = " ".join(f"u{d}_{i}" for i in range(8))
        rows.append((100 + d, body + " footer legal text"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _naive_pairs(sh, tau_num=3, tau_den=5):
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")),
            "doc_a",
        ).join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")),
            "doc_b",
        )
        .withColumn("n_union", F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
    )
    return j


def test_ppjoin_matches_naive_and_includes_boundary(spark):
    docs = _corpus(spark)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ppjoin_pairs(docs).collect()
    }
    naive = _naive_pairs(capped_shingles(docs, df_cap=_UNCAPPED))
    want = {
        (r.doc_a, r.doc_b): round(r.n_common / r.n_union, 4)
        for r in naive.filter(
            F.col("n_common") * 5 >= F.col("n_union") * 3
        ).collect()
    }
    assert got == want
    assert got[(1, 2)] == round(9 / 11, 4)
    assert got[(3, 4)] == 0.6  # exact-boundary pair included
    assert (5, 6) not in got
    assert not any(a >= 100 for a, _ in got), "boilerplate-only pairs excluded"


def test_prefix_filter_prunes_hot_shingles(spark):
    """The boilerplate footer shingle relates all C(10,2)=45 cohort
    pairs in the naive join, but it is every cohort doc's most
    frequent shingle, so it never enters a prefix: no cohort pair pays
    a verify. The sub-threshold pair (5,6) is pruned too — its prefix
    slots all go to rarer df=1 boundary shingles, exactly the
    rarest-first ordering working as designed — leaving only the two
    pairs that can actually reach tau."""
    docs = _corpus(spark)
    sh = capped_shingles(docs, df_cap=_UNCAPPED)
    naive_pairs = _naive_pairs(sh).count()
    cands = {(r.doc_a, r.doc_b) for r in ppjoin_candidates(sh).collect()}
    assert naive_pairs >= 45 + 3
    assert cands == {(1, 2), (3, 4)}


def test_positional_filter_prunes_deep_prefix_collisions(spark):
    """A pair whose only common shingle sits at the LAST slot of both
    prefixes: prefix + length filters alone admit it (collision
    exists, sizes equal), but the earliest-common-token upper bound
    1 + min(sz-pos) = 5 < minov = ceil(3*16/8) = 6 proves it can never
    reach tau, so the positional filter drops it before verify.

    Construction (shingle table built directly — ppjoin_candidates
    takes any (doc_id, shingle) set table): docs 1 and 2 have 8
    shingles each, every shingle df=2 (each non-shared shingle is
    duplicated into a sz=1 helper doc so no df=1 shingle outranks the
    shared one), the shared shingle 'm_s' sorts 4th by (df, shingle)
    in both docs — in-prefix (len 8-5+1=4) but as deep as possible.
    Helper pairs are killed by the length filter (5*1 < 3*8), so the
    positional filter is the ONLY thing standing between (1,2) and a
    wasted verify probe."""
    rows = []
    for d, names in (
        (1, ["a1", "a2", "a3", "m_s", "x5", "x6", "x7", "x8"]),
        (2, ["b1", "b2", "b3", "m_s", "y5", "y6", "y7", "y8"]),
    ):
        for s in names:
            rows.append((d, s))
            if s != "m_s":  # helper doc gives every private shingle df=2
                rows.append((100 + len(rows), s))
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    assert {(r.doc_a, r.doc_b) for r in ppjoin_candidates(sh).collect()} == set()
    # sanity: with the positional test removed the collision IS there —
    # the prefix of each doc really does contain m_s at pos 4
    w = Window.partitionBy("doc_id")
    ranked = (
        sh.join(sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")), "shingle")
        .withColumn("sz", F.count(F.lit(1)).over(w))
        .withColumn("pos", F.row_number().over(w.orderBy("df", "shingle")))
    )
    got = {
        (r.doc_id, r.pos)
        for r in ranked.filter(
            (F.col("shingle") == "m_s") & F.col("doc_id").isin(1, 2)
        ).collect()
    }
    assert got == {(1, 4), (2, 4)}


def test_ppjoin_gate_nonempty_at_sf0001(spark):
    from vbpl_web_crawl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = ppjoin_pairs(docs)
    rows = out.collect()
    assert out.columns == ["doc_a", "doc_b", "jaccard"]
    assert all(r.jaccard >= 0.6 for r in rows)
