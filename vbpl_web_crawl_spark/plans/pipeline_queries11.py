"""Distributed suffix-array gates (operators/suffix.py): exact
suffix ranking by prefix doubling, and the exact-substring duplicated
-span signal built on it (Lee et al. 2022 — character-level, the
companion to the word-level ``dup_span_coverage`` gate).

Both oracles are pure SQL over the same parquet: DuckDB ranks every
suffix with ``dense_rank() OVER (ORDER BY substr(text, pos+1, cap))``
— the sequential definition the distributed doubling must reproduce
exactly. All compared values are BIGINT checksums/counts, so the
value hash cannot drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table

_RANK_CAP = 64
_DUP_CAP = 32


# ---------------------------------------------------------------------------
# Gate 1 — the ranking itself: per-document BIGINT checksums over the
# (pos, rank) table pin every rank value AND its position binding
# (sum(rank) alone would permute; the position-weighted sum cannot).
# ---------------------------------------------------------------------------


@_register(
    "suffix_rank_checksums",
    f"""
WITH pos AS (
  SELECT doc_id, unnest(generate_series(1, length(text))) AS i, text
  FROM documents
),
r AS (
  SELECT doc_id, i - 1 AS pos,
         dense_rank() OVER (ORDER BY substr(text, i, {_RANK_CAP})) AS rank
  FROM pos
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_pos,
       CAST(sum(rank) AS BIGINT) AS rank_sum,
       CAST(sum(rank * i) AS BIGINT) AS rank_wsum,
       CAST(max(rank) AS BIGINT) AS rank_max
FROM (SELECT doc_id, pos, pos + 1 AS i, rank FROM r) t
GROUP BY doc_id
""",
)
def q_suffix_rank_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global suffix ranks (first {cap} chars, binary order) via
    distributed prefix doubling, reduced to per-doc checksums.

    Scale: log2(cap) rounds of window + distinct + range-partitioned
    sequence + pair join; text never shuffles after the base explode
    (see operators/suffix.py docstring)."""
    from vbpl_web_crawl_spark.operators.suffix import suffix_ranks

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ranks = suffix_ranks(docs, cap=_RANK_CAP)
    return ranks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum("rank").alias("rank_sum"),
        F.sum(F.col("rank") * (F.col("pos") + 1)).alias("rank_wsum"),
        F.max("rank").alias("rank_max"),
    )


# ---------------------------------------------------------------------------
# Gate 2 — exact-substring duplicated spans: a position is duplicated
# iff its first-{_DUP_CAP}-chars equality class spans >= 2 distinct
# documents. The class IS the depth-{_DUP_CAP} suffix rank, so the
# doubling output feeds the dedup decision directly — no span strings
# are ever grouped or shuffled on the Spark side (the oracle, free of
# scale constraints, groups the substrings themselves).
# ---------------------------------------------------------------------------


@_register(
    "exact_substring_dup_spans",
    f"""
WITH pos AS (
  SELECT doc_id, lang, unnest(generate_series(1, length(text))) AS i, text
  FROM documents
),
cls AS (
  SELECT doc_id, lang, substr(text, i, {_DUP_CAP}) AS cls FROM pos
),
df AS (
  SELECT cls, count(DISTINCT doc_id) AS ndocs FROM cls GROUP BY cls
),
pd AS (
  SELECT doc_id, lang,
         CAST(count(*) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM cls JOIN df USING (cls) GROUP BY doc_id, lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_pos) AS BIGINT) AS total_positions,
       CAST(sum(n_dup) AS BIGINT) AS dup_positions,
       CAST(sum(CASE WHEN 2 * n_dup >= n_pos THEN 1 ELSE 0 END) AS BIGINT)
         AS half_dup_docs
FROM pd GROUP BY lang
""",
)
def q_exact_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact-substring duplication coverage at
    character granularity: positions whose {cap}-char span recurs in
    another document, and docs that are >= 50% duplicated text
    (integer cross-multiplication — no float threshold)."""
    from vbpl_web_crawl_spark.operators.suffix import suffix_ranks

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    ranks = suffix_ranks(docs.select("doc_id", "text"), cap=_DUP_CAP)
    # distinct-doc frequency per equality class: ranks are the class
    # ids — an 8-byte groupBy, never the span strings
    cls_df = ranks.groupBy("rank").agg(F.countDistinct("doc_id").alias("ndocs"))
    per_doc = (
        ranks.join(cls_df, "rank")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .join(docs.select("doc_id", "lang"), "doc_id")  # doc-keyed join: dims-at-scale, AQE broadcasts when small
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_pos").alias("total_positions"),
        F.sum("n_dup").alias("dup_positions"),
        F.sum(
            F.when(2 * F.col("n_dup") >= F.col("n_pos"), 1).otherwise(0)
        ).alias("half_dup_docs"),
    )
