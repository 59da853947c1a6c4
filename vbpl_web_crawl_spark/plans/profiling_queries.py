"""Corpus/table introspection operators: single-pass column profiling
and PMI collocation mining.

Two operator classes the registry did not yet cover:

- ``table_profile_stats`` — the ANALYZE-style statistics pass every
  100 TB lakehouse runs before planning (null fractions, distinct
  cardinalities, numeric ranges, string lengths). One GLOBAL
  aggregation computes every per-column measure in a single scan, then
  a pure Catalyst ``inline`` pivots the one wide row to the long
  (per-column) report — no second pass, no driver-side loop.
- ``pmi_top_bigrams`` — phrase/collocation mining over the corpus
  (the word2vec phrase-detection step a tokenizer/vocab pipeline runs
  before training): rank adjacent word pairs by pointwise mutual
  information. Complements ``lm_bigram_fluency_buckets`` (which scores
  DOCUMENTS with the bigram LM) by ranking the PAIRS themselves.

Reference parity: the reference crawler's monitoring dumps row counts
and per-field coverage of its scraped tables before exporting
(/root/reference/app/service/vbpl.py progress logging); the profile
operator is that coverage check as a first-class query.

Scale notes (100 TB):

- Profile: the global agg is map-side partial everywhere with one
  single-partition final reduce; the exact ``count_distinct`` columns
  add one Expand (xN columns) before the shuffle — the honest exact
  form the DuckDB oracle can certify. At 100 TB swap the exact
  distincts for ``approx_count_distinct`` (HLL, one pass, no Expand):
  the surrounding shape is unchanged, which is why the gate pins the
  exact variant.
- PMI: ONE posexplode feeds the unigram table, the bigram table
  (lead() window per doc — the same single-shuffle shingle shape the
  minhash family uses), and nothing else; counts are token-keyed
  aggregates with map-side combine (Zipf-bounded); the scoring join is
  bigram-keyed against the two unigram sides. The score is the
  integer-scaled PMI numerator ``c2 * T * 1000 // (c1(w1) * c1(w2))``
  (monotone in PMI for a fixed corpus, 64-bit safe to ~10^7.5 tokens a
  side), so Spark and DuckDB agree bit-for-bit; at true 100 TB scale
  you'd switch the final ranking column to float ``log`` PMI and keep
  everything upstream identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.pipeline_queries import _TOKENS_SQL, _tokens
from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table, spread

# (name, kind) in report order; kind drives which measures are numeric.
_PROFILE_COLS = (
    ("event_id", "num"),
    ("ts", "ts"),
    ("user_id", "num"),
    ("event_type", "str"),
    ("value", "num"),
    ("props", "str"),
)

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{c}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {
        f"CAST(min(epoch_us({c})) AS DOUBLE)"
        if kind == "ts"
        else f"CAST(min({c}) AS DOUBLE)"
        if kind == "num"
        else "CAST(NULL AS DOUBLE)"
    } AS min_num,
       {
        f"CAST(max(epoch_us({c})) AS DOUBLE)"
        if kind == "ts"
        else f"CAST(max({c}) AS DOUBLE)"
        if kind == "num"
        else "CAST(NULL AS DOUBLE)"
    } AS max_num,
       {f"min({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"} AS min_str,
       {f"max({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"} AS max_str,
       {
        f"CAST(sum(length({c})) AS DOUBLE) / count({c})"
        if kind == "str"
        else "CAST(NULL AS DOUBLE)"
    } AS avg_len
FROM events"""
    for c, kind in _PROFILE_COLS
)


def _num_expr(c: str, kind: str):
    if kind == "ts":
        # parquet reads ts as TIMESTAMP_NTZ, which unix_micros rejects;
        # the cast is the same session-UTC trick the range-join gate uses
        # (operators/temporal.py)
        return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
    return F.col(c).cast("double")


@_register("table_profile_stats", _PROFILE_SQL)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the events table from ONE global
    aggregation: row/null/distinct counts, numeric min/max (timestamps
    as epoch microseconds — integer-exact in both engines), string
    min/max and mean length. The wide single-row result is pivoted to
    the long per-column report with a Catalyst ``inline`` — the whole
    query is one scan plus one single-partition reduce."""
    # spread: the exact-distinct aggregation expands every row ~7x
    # (one replica per count_distinct column) and partially aggregates
    # the expanded stream BEFORE the exchange; with a single-row-group
    # scan all of that ran on ONE task (guide §2.4, 16.5 s at sf1.0 in
    # BENCH_r05). One round-robin exchange of the raw rows spreads it.
    from vbpl_web_crawl_spark.sources.tables import spread

    ev = spread(load_table(spark, sf_dir, "events"))
    aggs = []
    for c, kind in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
        ]
        if kind in ("num", "ts"):
            aggs += [
                F.min(_num_expr(c, kind)).alias(f"{c}__min_num"),
                F.max(_num_expr(c, kind)).alias(f"{c}__max_num"),
            ]
        else:
            aggs += [
                F.min(c).alias(f"{c}__min_str"),
                F.max(c).alias(f"{c}__max_str"),
                (F.sum(F.length(c)).cast("double") / F.count(c)).alias(
                    f"{c}__avg_len"
                ),
            ]
    wide = ev.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            (F.col(f"{c}__min_num") if kind != "str" else null_d).alias("min_num"),
            (F.col(f"{c}__max_num") if kind != "str" else null_d).alias("max_num"),
            (F.col(f"{c}__min_str") if kind == "str" else null_s).alias("min_str"),
            (F.col(f"{c}__max_str") if kind == "str" else null_s).alias("max_str"),
            (F.col(f"{c}__avg_len") if kind == "str" else null_d).alias("avg_len"),
        )
        for c, kind in _PROFILE_COLS
    ]
    return wide.select(F.inline(F.array(*structs)))


# ---------------------------------------------------------------------------
# PMI collocation mining.
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOPK = 20

_PMI_SQL = f"""
WITH base AS (
  SELECT doc_id, {_TOKENS_SQL} AS w FROM documents
),
big AS (
  SELECT unnest([w[i] for i in generate_series(1, len(w) - 1)]) AS w1,
         unnest([w[i + 1] for i in generate_series(1, len(w) - 1)]) AS w2
  FROM base
),
cnt1 AS (
  SELECT g, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(w) AS g FROM base) GROUP BY g
),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t FROM cnt1),
cnt2 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
  FROM big GROUP BY w1, w2
  HAVING count(*) >= {_PMI_MIN_COUNT}
)
SELECT p.w1, p.w2, p.c2 AS pair_count,
       u1.c1 AS w1_count, u2.c1 AS w2_count,
       CAST(p.c2 * t.t * 1000 // (u1.c1 * u2.c1) AS BIGINT) AS pmi_milli
FROM cnt2 p
JOIN cnt1 u1 ON p.w1 = u1.g
JOIN cnt1 u2 ON p.w2 = u2.g
CROSS JOIN tot t
ORDER BY pmi_milli DESC, p.w1, p.w2
LIMIT {_PMI_TOPK}
"""


@_register("pmi_top_bigrams", _PMI_SQL)
def q_pmi_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} adjacent word pairs by integer-scaled PMI
    (``c2 * T * 1000 // (c1(w1) * c1(w2))``, min pair count
    {m}) — the phrase-detection ranking a vocab/tokenizer pipeline
    runs corpus-wide. One posexplode feeds both count tables; the
    final top-k is a TakeOrderedAndProject over the Zipf-bounded
    filtered pair table."""
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    tok = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "w")
    )
    from pyspark.sql import Window

    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        tok.withColumn("w2", F.lead("w").over(wdoc))
        .filter(F.col("w2").isNotNull())
        .select(F.col("w").alias("w1"), "w2")
    )
    # materialize the vocab-sized unigram table ONCE: it feeds both join
    # sides and the total, which would otherwise re-tokenize the whole
    # corpus three more times (the plan went from 4 parquet scans to 2)
    cnt1 = (
        tok.groupBy(F.col("w").alias("g"))
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint(eager=True)
    )
    tot = cnt1.agg(F.sum("c1").alias("t"))
    cnt2 = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= _PMI_MIN_COUNT)
    )
    scored = (
        cnt2.join(cnt1.select(F.col("g").alias("w1"), F.col("c1").alias("u1")), "w1")
        .join(cnt1.select(F.col("g").alias("w2"), F.col("c1").alias("u2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c2").alias("pair_count"),
            F.col("u1").alias("w1_count"),
            F.col("u2").alias("w2_count"),
            # `div` = exact 64-bit integer division (matches DuckDB's
            # `//` on BIGINT); a float `/` + cast could round across an
            # integer boundary and break the bit-exact oracle match
            F.expr("(c2 * t * 1000L) div (u1 * u2)").alias("pmi_milli"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_milli"), F.asc("w1"), F.asc("w2")
    ).limit(_PMI_TOPK)


q_pmi_top_bigrams.__doc__ = q_pmi_top_bigrams.__doc__.format(
    k=_PMI_TOPK, m=_PMI_MIN_COUNT
)
