"""Round-5 continuation queries, part 8: prefix-filtered exact
set-similarity self-join (the All-Pairs / PPJoin family, Bayardo et
al. WWW'07, Xiao et al. WWW'08) over document shingle sets.

Contrast with the repo's other near-dup paths: the DF-capped shingle
join (``dedup_ngram_jaccard_pairs``) bounds skew by DROPPING hot
shingles (recall traded for boundedness) and MinHash-LSH bounds it by
sketching (probabilistic recall). Prefix filtering is the EXACT
answer with neither trade: order every document's shingles by
ascending global document frequency under one total order, emit only
the first ``|r| - ceil(tau*|r|) + 1`` of them, and join on those.
Completeness: Jaccard(x,y) >= tau forces an overlap of at least
ceil(tau*max(|x|,|y|)) elements, more than either record's omitted
suffix holds, so two matching records MUST collide on a prefix
element. Rarest-first ordering makes the join key a LOW-frequency
shingle by construction — the hot-key skew the DF cap fought never
reaches the shuffle.

Scale notes (100 TB): exploded join input shrinks from every shingle
to ~(1-tau) of them, and each surviving key's bucket is small because
prefixes hold the RAREST shingles (a shingle in d docs contributes at
most d^2 candidate checks only if it survives into prefixes — hot
shingles almost never do). The verify stage touches candidate pairs
only. All thresholds are exact integer arithmetic (tau = 3/5:
``5*common >= 3*union``), so pruning can never diverge from the
verify predicate by a float ulp, and the naive SQL oracle certifies
completeness: a pair wrongly pruned would surface as a missing row.

Reference parity: the reference dedups by exact ItemID only
(/root/reference/app/service/vbpl.py upsert key); near-identical
revisions of the same legal document under different ids are the case
this operator catches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.pipeline_queries import _SHINGLES_SQL, capped_shingles
from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table

# tau = TAU_NUM / TAU_DEN; integer-exact ceil(tau*n) = (TAU_NUM*n + TAU_DEN-1) div TAU_DEN
_TAU_NUM, _TAU_DEN = 3, 5


def ppjoin_pairs(docs: DataFrame, tau_num: int = _TAU_NUM, tau_den: int = _TAU_DEN) -> DataFrame:
    """All (doc_a < doc_b, jaccard) pairs with shingle-set Jaccard >=
    tau_num/tau_den — exact, via prefix-filtered candidate generation.

    Stages: (1) distinct 3-gram shingles per doc (lead()-window, no
    per-element lambda); (2) global df per shingle; (3) rank each
    doc's shingles rarest-first under the total order (df, shingle)
    and keep the first sz - ceil(tau*sz) + 1; (4) equi-join prefixes,
    length-filter (tau*max <= min), distinct candidate pairs; (5)
    verify with a common-count restricted to candidates. Only prefix
    rows enter the self-join shuffle."""
    # uncapped: exact algorithm. Checkpoint the shingle table ONCE —
    # it feeds five consumers (df agg, ranking, both verify sides,
    # sizes); without the boundary the tokenizer + per-doc window
    # re-run per consumer (measured 16 parquet scans / 86 exchanges in
    # the un-checkpointed plan)
    sh = capped_shingles(docs, df_cap=1 << 62).localCheckpoint(eager=False)
    cand = ppjoin_candidates(sh, tau_num, tau_den)
    common = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    out = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")),
            "doc_b",
        )
        .withColumn("n_union", F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
        .filter(F.col("n_common") * tau_den >= F.col("n_union") * tau_num)
    )
    return out.select(
        "doc_a",
        "doc_b",
        F.round(F.col("n_common").cast("double") / F.col("n_union"), 4).alias(
            "jaccard"
        ),
    )


def ppjoin_candidates(
    sh: DataFrame, tau_num: int = _TAU_NUM, tau_den: int = _TAU_DEN
) -> DataFrame:
    """Distinct (doc_a < doc_b) candidate pairs from the prefix,
    length, AND positional filters over a (doc_id, shingle) set table
    — a SUPERSET of the true result (completeness is what the oracle
    certifies); its size vs the all-shingles join's is the pruning
    evidence (tests/test_ppjoin.py).

    Positional filter (the PPJoin refinement over plain All-Pairs,
    Xiao et al. WWW'08 §3.1): for a pair whose overlap O satisfies
    Jaccard >= tau, O >= minov = ceil(tau/(1+tau) * (sz_a+sz_b)), and
    the EARLIEST common shingle e* under the global (df, shingle)
    order must sit inside both prefixes (if it sat past x's prefix,
    all O common shingles would fit in x's suffix of ceil(tau*sz_x)-1
    slots < minov — contradiction). No common shingle precedes e*, so
    O <= 1 + min(sz_a - pos_a*, sz_b - pos_b*). Taking, per colliding
    pair, the collision that is minimal in (df, shingle) — which for a
    true pair IS e* — and requiring that upper bound >= minov prunes
    collisions that happen too deep in both prefixes to reach tau,
    without ever dropping a true pair. All integer arithmetic, so the
    bound can't diverge from the verify predicate by a float ulp. The
    groupBy replaces the plain ``distinct()`` — same single shuffle on
    the pair key, strictly fewer verify probes out."""
    w_doc = Window.partitionBy("doc_id")
    ranked = (
        sh.join(sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")), "shingle")
        .withColumn("sz", F.count(F.lit(1)).over(w_doc))
        .withColumn(
            "pos", F.row_number().over(w_doc.orderBy("df", "shingle"))
        )
    )
    ceil_tau_sz = F.expr(f"(({tau_num} * sz + {tau_den - 1}) div {tau_den})")
    # checkpoint: the prefix table is both self-join sides
    prefix = (
        ranked.filter(F.col("pos") <= F.col("sz") - ceil_tau_sz + 1)
        .select("doc_id", "shingle", "df", "sz", "pos")
        .localCheckpoint(eager=False)
    )
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "shingle",
        "df",
        F.col("sz").alias("sz_a"),
        F.col("pos").alias("pos_a"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"),
        "shingle",
        F.col("sz").alias("sz_b"),
        F.col("pos").alias("pos_b"),
    )
    first_hit = (
        pa.join(pb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(  # length filter: tau * max(sz) <= min(sz)
            F.least("sz_a", "sz_b") * tau_den
            >= F.greatest("sz_a", "sz_b") * tau_num
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.min_by(
                F.struct("pos_a", "pos_b", "sz_a", "sz_b"),
                F.struct("df", "shingle"),
            ).alias("m")
        )
    )
    # minov = ceil(tau/(1+tau) * (sz_a+sz_b)), integer-exact
    minov = F.expr(
        f"(({tau_num} * (m.sz_a + m.sz_b) + {tau_num + tau_den - 1})"
        f" div {tau_num + tau_den})"
    )
    cand = first_hit.filter(
        1 + F.least(F.col("m.sz_a") - F.col("m.pos_a"), F.col("m.sz_b") - F.col("m.pos_b"))
        >= minov
    ).select("doc_a", "doc_b")
    return cand


@_register(
    "dedup_ppjoin_exact_pairs",
    f"""
WITH sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.doc_a, c.doc_b,
       round(CAST(c.n_common AS DOUBLE)
             / (sa.sz + sb.sz - c.n_common), 4) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE c.n_common * {_TAU_DEN} >= (sa.sz + sb.sz - c.n_common) * {_TAU_NUM}
""",
)
def q_ppjoin_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 3/5 near-dup pairs via prefix filtering; the
    oracle is the NAIVE all-shingles join, so a completeness bug in
    the prefix/length pruning shows up as missing rows, not just a
    slow plan."""
    return ppjoin_pairs(load_table(spark, sf_dir, "documents"))
