"""Distributed suffix ranking by prefix doubling — the exact-substring
dedup machinery of Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better"), re-expressed for Spark.

A suffix array over the concatenated corpus is how the reference
technique finds byte-identical spans without quadratic comparisons.
Single-node constructions (SA-IS, DC3) are pointer-chasing algorithms
that do not distribute; the classic distributed formulation is
prefix doubling (Manber-Myers; Flick & Aluru's MPI variant): after
round i every suffix holds the dense rank of its first 2^i characters,
and round i+1 re-ranks by the pair (rank[pos], rank[pos + 2^i]) — the
rank of the first 2^(i+1) characters. log2(cap) rounds total.

Spark mapping — every step is a built-in relational op:

- base ranks: one ``posexplode(split(text, ''))`` producing
  (doc_id, pos, codepoint), then the first d codepoints packed into
  one int64 as fixed-width bit fields (width = observed max codepoint;
  Flick & Aluru likewise seed the doubling with whole machine words) —
  an order-preserving depth-d key with no ranking job; ASCII corpora
  start at depth 8, halving the round count vs a depth-1 start.
- rank[pos + k] without a self-join: positions are dense per doc, so
  ``lead(rank, k) OVER (PARTITION BY doc_id ORDER BY pos)`` delivers
  the partner rank with one doc-keyed shuffle. Missing partner
  (suffix shorter than 2k) maps to -1, which sorts BEFORE every real
  rank — exactly the "shorter string that is a prefix sorts first"
  rule of string comparison.
- dense re-rank of pairs: ``global_dense_rank`` (operators/sequence.py)
  range-sorts the positions by (r1, r2) and assigns the dense rank in
  place — rank increments exactly where the sorted key changes, with
  per-partition change counts prefix-summed on the driver. No
  single-task global window anywhere, and no distinct frame or
  rank-join: the new rank rides the same rows.

Scale: every round is (window shuffle on doc_id) + (ONE range shuffle
on the 16-byte pair) + two scans of the range-sorted cache (a
no-shuffle change-count summary, then the assignment). Rounds are
log2(cap); state per row is 3 longs — document text never moves after
the base explode. Rounds stop early once all ranks are distinct
(every suffix separated — the common case long before depth cap on
natural text).

``cap`` bounds the ranking depth: ranks group suffixes by their first
``cap`` characters (ties beyond that depth stay tied, matching
``substr(text, pos+1, cap)`` comparison semantics). Exact-substring
dedup needs depth = the minimum duplicated-span length, not full
suffix order, so a small power-of-two cap is the working
configuration, and it keeps the round count fixed.

Reference analog: /root/reference stores raw page text with no dedup
(app/service/vbpl.py upserts overwrite by id); this operator is the
corpus-hygiene pass a training pipeline runs over the crawl output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from vbpl_web_crawl_spark.operators.sequence import global_dense_rank


def remove_dup_spans(docs: DataFrame, cap: int, text_col: str = "text") -> DataFrame:
    """Exact-substring duplicate SPAN REMOVAL (Lee et al. 2022 §4):
    cut from every document each span whose first ``cap`` characters
    recur in ANOTHER document.

    Returns (doc_id, n_spans, removed_chars, retained_chars, cleaned)
    — ``cleaned`` is the document text with every duplicated span
    excised; ``n_spans`` counts merged (non-overlapping) intervals.

    Pipeline: suffix_ranks gives each position an 8-byte equality
    class for its first ``cap`` chars; classes spanning >= 2 docs mark
    span starts; starts merge to intervals per doc (gaps-and-islands,
    one doc-keyed window); the cleaned text is rebuilt JVM-side with a
    Catalyst ``aggregate`` fold over the interval array — no Python
    anywhere, and no per-character rows past the ranker."""
    docs = docs.select("doc_id", F.col(text_col).alias("text"))
    lens = docs.select("doc_id", F.length("text").alias("len"))
    ranks = suffix_ranks(docs, cap=cap)
    cls = ranks.groupBy("rank").agg(F.countDistinct("doc_id").alias("nd"))
    spans = (
        ranks.join(cls.filter(F.col("nd") >= 2).select("rank"), "rank")
        .join(lens, "doc_id")
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("s"),
            F.least(F.col("pos") + 1 + cap, F.col("len") + 1).alias("e"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    merged = (
        spans.withColumn(
            "brk", (F.col("s") > F.coalesce(prev_max_e, F.lit(0))).cast("int")
        )
        .withColumn(
            "g", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("doc_id", "g")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    ivs = merged.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("ivs")
    )
    out = docs.join(ivs, "doc_id", "left").withColumn(
        "ivs",
        F.coalesce(F.col("ivs"), F.array().cast("array<struct<s:int,e:int>>")),
    )
    cleaned = F.expr(
        "aggregate(ivs, struct(0 AS p, '' AS acc), "
        "  (a, iv) -> struct(iv.e - 1 AS p, "
        "              concat(a.acc, substr(text, a.p + 1, iv.s - 1 - a.p)) AS acc), "
        "  a -> concat(a.acc, substr(text, a.p + 1, length(text) - a.p)))"
    )
    removed = F.expr("aggregate(ivs, 0, (a, iv) -> a + iv.e - iv.s)")
    return out.select(
        "doc_id",
        F.size("ivs").cast("long").alias("n_spans"),
        removed.cast("long").alias("removed_chars"),
        (F.length("text") - removed).cast("long").alias("retained_chars"),
        cleaned.alias("cleaned"),
    )


def suffix_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, c) for every character position; empty documents
    contribute no positions (split('', '') yields [''], which the
    empty-token guard drops — matching generate_series(1, 0))."""
    return (
        docs.select(
            "doc_id", F.posexplode(F.split(F.col(text_col), "")).alias("pos", "c")
        )
        .filter(F.col("c") != "")
    )


def suffix_ranks(
    docs: DataFrame,
    cap: int = 64,
    text_col: str = "text",
    early_stop: bool = True,
) -> DataFrame:
    """(doc_id, pos, rank): dense rank (1-based) of every suffix among
    ALL suffixes of the corpus, ordered by the first ``cap``
    characters (binary/codepoint order; suffixes equal through
    ``cap`` share a rank). Equal to
    ``dense_rank() OVER (ORDER BY substr(text, pos+1, cap))``.

    ``cap`` must be a power of two (the doubling schedule).
    """
    if cap < 2 or cap & (cap - 1):
        # cap 1 would return raw codepoints (ordered but not dense)
        raise ValueError(f"cap must be a power of two >= 2, got {cap}")

    chars = suffix_positions(docs, text_col).select(
        "doc_id", "pos", F.ascii("c").cast("long").alias("rank")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")

    # Packed k-mer base ranks (Flick & Aluru start doubling from whole
    # machine words, not single characters): when every codepoint fits
    # ``bits`` bits and none is 0, the first d codepoints pack into one
    # int64 as d fixed-width fields — an order-preserving depth-d
    # ordinal for free, with 0-padding past the suffix end sorting
    # shorter prefixes first (real codepoints are >= 1). ASCII text
    # packs d = 8, so cap 64 runs 3 doubling rounds instead of 6; the
    # width derives from the OBSERVED codepoint range, so any alphabet
    # degrades gracefully (astral-plane text packs d = 2; a codepoint 0
    # anywhere falls back to the unpacked depth-1 base). d stays a
    # power of two so the doubling schedule lands exactly on ``cap``.
    mm = chars.agg(F.min("rank").alias("mn"), F.max("rank").alias("mx")).first()
    d, bits = 1, 0
    if mm["mn"] is not None and mm["mn"] >= 1:
        bits = int(mm["mx"]).bit_length()
        m = min(63 // bits, cap)
        while d * 2 <= m:
            d *= 2
    if d > 1:
        packed = F.col("rank")
        for j in range(1, d):
            packed = packed * (1 << bits) + F.coalesce(
                F.lead("rank", j).over(w), F.lit(0)
            )
        cur = chars.select("doc_id", "pos", packed.alias("rank"))
    else:
        cur = chars
    cur = cur.localCheckpoint(eager=True)
    n_total = cur.count() if early_stop else None

    k = d
    dense = False
    while k < cap:
        paired = cur.withColumn(
            "r2", F.coalesce(F.lead("rank", k).over(w), F.lit(-1))
        )
        # fused sort-based re-rank: dense rank of (rank, r2) attached
        # directly to every position. The former formulation (distinct
        # pairs -> global_sequence -> pair join back) paid three extra
        # corpus-sized exchanges per round — the distinct, the
        # sequencer's range partition, and both join sides; dense rank
        # over the sorted positions themselves needs only ONE range
        # exchange, and row_number over distinct pairs == dense_rank
        # over all pairs by definition, so the rank values are
        # identical (oracle- and property-test-pinned).
        caches: list = []
        totals: list = []
        nxt = global_dense_rank(
            paired,
            ["rank", "r2"],
            out_col="new_rank",
            start=1,
            caches=caches,
            total_out=totals,
        ).select("doc_id", "pos", F.col("new_rank").alias("rank"))
        # truncate lineage each round (iterative plans otherwise grow
        # exponentially in analysis cost) and free the ranker cache
        nxt = nxt.localCheckpoint(eager=True)
        for c in caches:
            c.unpersist()
        cur = nxt
        dense = True
        k *= 2
        if early_stop and k < cap:
            # all suffixes separated -> further rounds are identity.
            # The distinct-key count IS the post-round distinct-rank
            # count, and the ranker already collected it per
            # partition — the check costs no extra job.
            if totals and totals[0] == n_total:
                break
    if not dense:
        # the packed base alone reached depth ``cap`` (d == cap):
        # ordinals are order-correct but sparse — one densify pass
        caches = []
        out = (
            global_dense_rank(
                cur, ["rank"], out_col="new_rank", start=1, caches=caches
            )
            .select("doc_id", "pos", F.col("new_rank").alias("rank"))
            .localCheckpoint(eager=True)
        )
        for c in caches:
            c.unpersist()
        cur = out
    return cur
