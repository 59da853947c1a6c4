"""Round-5 continuation queries, part 14: positional inverted index +
phrase search — the IR primitive the retrieval gates (bm25_topk_docs,
tfidf_top_terms_by_source) score with but never materialize: postings
of (term, doc, position) and an exact phrase query answered by
adjacency joins over them.

The reference crawls and stores legal-document fulltext
(/root/reference/app/service/vbpl.py:996-1011 fulltext fetch;
app/model/vbpl.py toan_van storage); phrase lookup over that corpus is
the canonical downstream consumer. The gate is self-contained at any
scale factor: stage 1 MINES the most frequent trigram in the corpus
(deterministic tiebreak: count DESC, then the three terms ascending),
stage 2 answers it as a phrase query through the postings — so the
result always has matches (at least the mined occurrences) and no
fixed probe string has to exist in the synthetic text.

Scale design — why postings joins and not the lead()-window trigram
stream used by the miner:

- the MINER is a one-off O(corpus tokens) pass (the same single
  doc-keyed window shuffle shape as the minhash shingles / pmi gates);
  at 100 TB you run it once (or read the phrase from the user);
- the SEARCH shuffles only df(t1)+df(t2)+df(t3) posting rows —
  postings are filtered to the query's terms BEFORE any exchange
  (Catalyst pushes the isin() into the explode stage), then two
  (doc_id, pos)-keyed equi-joins align positions pos/pos+1/pos+2.
  A window-based scan would re-shuffle EVERY corpus token per query;
  the index path is invariant in corpus size for fixed term
  frequencies — which is the entire point of an inverted index.
- a persisted deployment writes the full (term, doc_id, pos) table
  bucketed by term (operators/bucketing.py), making the per-query
  filter a bucket-pruned scan with no shuffle at all; the gate keeps
  the build inline so the driver's oracle can see one deterministic
  pipeline.

The one bounded driver collect is the mined 1-row trigram (the same
fit-table pattern as the IVF centroids, operators/ann.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.pipeline_queries import _TOKENS_SQL, _tokens
from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table

_PHRASE_SQL = f"""
WITH base AS (
  SELECT doc_id, {_TOKENS_SQL} AS w FROM documents
),
pos AS (
  SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM base
),
tok AS (SELECT doc_id, i, w[i] AS t FROM pos),
tri AS (
  SELECT t AS w1,
         lead(t, 1) OVER (PARTITION BY doc_id ORDER BY i) AS w2,
         lead(t, 2) OVER (PARTITION BY doc_id ORDER BY i) AS w3
  FROM tok
),
top AS (
  SELECT w1, w2, w3 FROM tri
  WHERE w2 IS NOT NULL AND w3 IS NOT NULL
  GROUP BY w1, w2, w3
  ORDER BY count(*) DESC, w1 ASC, w2 ASC, w3 ASC
  LIMIT 1
),
m AS (
  SELECT a.doc_id, a.i
  FROM tok a
  JOIN top ON a.t = top.w1
  JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1 AND b.t = top.w2
  JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2 AND c.t = top.w3
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(i) AS BIGINT) AS first_pos,
       CAST(max(i) AS BIGINT) AS last_pos,
       (SELECT w1 || ' ' || w2 || ' ' || w3 FROM top) AS phrase
FROM m GROUP BY doc_id
"""


@_register("phrase_index_search", _PHRASE_SQL)
def q_phrase_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine the corpus's most frequent trigram, then answer it as an
    exact phrase query via positional-postings adjacency joins:
    (doc_id, n_matches, first_pos, last_pos, phrase), positions
    1-based. Only the three query terms' postings ever shuffle."""
    from vbpl_web_crawl_spark.sources.tables import spread

    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    # localCheckpoint: the token stream feeds the trigram miner AND the
    # three postings branches of the phrase join — four consumers that
    # would each re-tokenize the corpus
    tok = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("p0", "t")
    ).localCheckpoint(eager=False)
    # stage 1 — miner: one doc-keyed window pass over the token stream
    # (the shingle shape shared with the minhash/pmi gates)
    w = Window.partitionBy("doc_id").orderBy("p0")
    top = (
        tok.select(
            "t",
            F.lead("t", 1).over(w).alias("w2"),
            F.lead("t", 2).over(w).alias("w3"),
        )
        .filter(F.col("w2").isNotNull() & F.col("w3").isNotNull())
        .groupBy("t", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(
            F.desc("c"), F.asc("t"), F.asc("w2"), F.asc("w3")
        )
        .limit(1)
        .collect()[0]  # bounded: exactly one row (the fit-table pattern)
    )
    t1, t2, t3 = top["t"], top["w2"], top["w3"]
    # stage 2 — search: postings restricted to the query terms before
    # any shuffle; adjacency = two (doc_id, pos)-keyed equi-joins
    p = tok.filter(F.col("t").isin(t1, t2, t3)).select(
        "doc_id", (F.col("p0") + 1).alias("i"), "t"
    )
    p1 = p.filter(F.col("t") == t1).select("doc_id", "i")
    p2 = p.filter(F.col("t") == t2).select("doc_id", (F.col("i") - 1).alias("i"))
    p3 = p.filter(F.col("t") == t3).select("doc_id", (F.col("i") - 2).alias("i"))
    m = p1.join(p2, ["doc_id", "i"]).join(p3, ["doc_id", "i"])
    return (
        m.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("i").alias("first_pos"),
            F.max("i").alias("last_pos"),
        )
        .withColumn("phrase", F.lit(f"{t1} {t2} {t3}"))
    )


# ---------------------------------------------------------------------------
# Pareto (skyline) document selection — the multi-criteria "best docs
# for the budget" pick a data-selection pass makes: a document is on
# the frontier iff no other document of its language is at least as
# good on BOTH axes (quality higher-is-better, token cost
# lower-is-better) and strictly better on one (Börzsönyi et al. 2001,
# "The Skyline Operator"). Quality is the corpus's pinned 4-step score
# (functions/text.py::quality_score, already oracle-parity-verified by
# quality_score_histogram), scaled x4 to an exact INTEGER lane so no
# float ever enters a comparison or the value hash.
#
# Scale design: dominance is NOT a self-join over documents (the naive
# skyline is O(n^2)). Because the quality axis is discrete, the
# frontier factors through a per-(lang, q4) argmin: (1) one
# map-side-combinable groupBy collapses the corpus to <= 5 levels per
# language; (2) a ROWS-frame suffix-min over that TINY level table
# marks levels dominated by a higher-quality level with <= tokens;
# (3) one broadcast join back tags each doc. Document bodies stream
# through exactly one aggregate; nothing quadratic anywhere. With a
# continuous quality axis the same shape holds after bucketing (the
# standard block-skyline refinement).
# ---------------------------------------------------------------------------

_NTOK_SQL = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKENS_SQL}) END"
_Q4_SQL = f"""(CASE WHEN ({_NTOK_SQL}) BETWEEN 10 AND 5000 THEN 2 ELSE 0 END)
 + (CASE WHEN (CASE WHEN length(text) > 0
          THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / length(text) ELSE 0.0 END) < 0.2 THEN 1 ELSE 0 END)
 + (CASE WHEN len(list_filter({_TOKENS_SQL},
       x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'to')) > 0
    THEN 1 ELSE 0 END)"""

_PARETO_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, {_NTOK_SQL} AS nt, {_Q4_SQL} AS q4 FROM documents
),
lvl AS (SELECT lang, q4, min(nt) AS min_t FROM t GROUP BY lang, q4),
dom AS (
  SELECT lang, q4, min_t,
         min(min_t) OVER (PARTITION BY lang ORDER BY q4 DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
  FROM lvl
),
fr AS (SELECT lang, q4, min_t FROM dom WHERE m1 IS NULL OR min_t < m1)
SELECT f.lang, CAST(f.q4 AS INTEGER) AS quality_q4,
       CAST(f.min_t AS BIGINT) AS frontier_tokens,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(d.doc_id) AS BIGINT) AS min_doc_id,
       CAST(sum(d.doc_id) AS BIGINT) AS sum_doc_id
FROM fr f JOIN t d ON d.lang = f.lang AND d.q4 = f.q4 AND d.nt = f.min_t
GROUP BY f.lang, f.q4, f.min_t
"""


@_register("pareto_quality_frontier", _PARETO_SQL)
def q_pareto_quality_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Pareto frontier over (quality x4 as int, token
    count): the undominated (quality, tokens) levels with every doc
    sitting on them. quality_score x 4 is exact (0.25 and 0.5 are
    binary powers), so the integer lane carries no float rounding."""
    from vbpl_web_crawl_spark.functions import text as TX

    from vbpl_web_crawl_spark.sources.tables import spread

    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )
    # localCheckpoint: t feeds the level table AND the tag-back join —
    # without it the 4-step quality score + tokenization runs twice;
    # the materialized frame is 4 narrow columns per doc
    t = docs.select(
        "doc_id",
        "lang",
        TX.token_count_ws(F.col("text")).cast("long").alias("nt"),
        F.round(TX.quality_score(F.col("text")) * 4).cast("int").alias("q4"),
    ).localCheckpoint(eager=False)
    lvl = t.groupBy("lang", "q4").agg(F.min("nt").alias("min_t"))
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("q4"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fr = (
        lvl.withColumn("m1", F.min("min_t").over(w))
        .filter(F.col("m1").isNull() | (F.col("min_t") < F.col("m1")))
        .select("lang", "q4", "min_t")
    )
    fr = fr.select(
        F.col("lang").alias("f_lang"),
        F.col("q4").alias("f_q4"),
        F.col("min_t").alias("min_t"),
    )
    return (
        t.join(
            F.broadcast(fr),
            (t.lang == fr.f_lang) & (t.q4 == fr.f_q4) & (t.nt == fr.min_t),
        )
        .groupBy("lang", "q4", "min_t")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .select(
            "lang",
            F.col("q4").alias("quality_q4"),
            F.col("min_t").alias("frontier_tokens"),
            "n_docs",
            "min_doc_id",
            "sum_doc_id",
        )
    )


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) host -> fetch-worker assignment vs
# modulo, with the resize-movement property measured: when the fleet
# grows W -> W+1, rendezvous reassigns ~1/(W+1) of hosts while modulo
# reassigns ~W/(W+1) (Thaler & Ravishankar 1998). This is the sticky
# host-affinity a politeness scheduler needs — per-host token/delay
# state (crawl/politeness.py) survives an executor-count change only if
# the host's worker does — and the reason that state is NOT keyed by
# shuffle-partition modulo.
#
# Determinism: worker weights are the md5-prefix integer lane
# (tests/test_md5_lane_parity.py pins the Spark<->DuckDB identity);
# argmax tiebreak is (lane DESC, worker ASC). Everything downstream is
# int64 counts.
#
# Scale: candidates = hosts x (W+1) rows with W a small constant (the
# fleet size), built from a broadcast range — linear in hosts, one
# host-keyed window for the argmax, no shuffle carries anything but
# (host, worker, lane). At 10^10 hosts the same plan holds.
# ---------------------------------------------------------------------------

_RDV_W = 16
# 14 hex chars = 56 bits, so lane * 32 + (17 - k) stays < 2^62: one
# packed int64 ordering key with the worker-ascending tiebreak built in
# (DuckDB's arg_max takes no composite ordering key)
_RDV_LANE = "CAST(('0x' || substr(md5(host || ':' || k), 1, 14)) AS BIGINT)"
_RDV_LANE0 = "CAST(('0x' || substr(md5(host), 1, 14)) AS BIGINT)"

_RDV_SQL = f"""
WITH hosts AS (
  SELECT 'h' || o_custkey AS host, count(*) AS load FROM orders GROUP BY o_custkey
),
cand AS (
  SELECT h.host, h.load, k.k,
         ({_RDV_LANE}) * 32 + ({_RDV_W} + 1 - k.k) AS key
  FROM hosts h CROSS JOIN range(0, {_RDV_W} + 1) k(k)
),
rdv AS (
  SELECT host, load,
         arg_max(k, key) FILTER (WHERE k < {_RDV_W}) AS a16,
         arg_max(k, key) AS a17
  FROM cand GROUP BY host, load
),
modu AS (
  SELECT host, {_RDV_LANE0} % {_RDV_W} AS m16, {_RDV_LANE0} % ({_RDV_W} + 1) AS m17
  FROM hosts
),
j AS (SELECT r.host, r.load, r.a16, r.a17, m.m16, m.m17
      FROM rdv r JOIN modu m USING (host)),
per AS (
  SELECT 'rendezvous' AS method, a16 AS w, load,
         CASE WHEN a16 <> a17 THEN 1 ELSE 0 END AS mv FROM j
  UNION ALL
  SELECT 'modulo', m16, load, CASE WHEN m16 <> m17 THEN 1 ELSE 0 END FROM j
),
wl AS (SELECT method, w, sum(load) AS wload, count(*) AS nh, sum(mv) AS mvd
       FROM per GROUP BY method, w)
SELECT method,
       CAST(sum(nh) AS BIGINT) AS n_hosts,
       CAST(sum(mvd) AS BIGINT) AS n_moved_on_resize,
       CAST(max(wload) AS BIGINT) AS max_worker_load,
       CAST(min(wload) AS BIGINT) AS min_worker_load,
       CAST(sum(wload * wload) AS BIGINT) AS sum_sq_worker_load
FROM wl GROUP BY method
"""


@_register("rendezvous_host_assignment", _RDV_SQL)
def q_rendezvous_host_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every host (order-count load) to one of {w} fetch workers
    by rendezvous hashing AND by modulo; report per-method worker-load
    balance and how many hosts move when the fleet resizes to {w}+1."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    hosts = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("load"))
        .select(F.concat(F.lit("h"), F.col("o_custkey")).alias("host"), "load")
    )
    workers = F.broadcast(
        hosts.sparkSession.range(0, _RDV_W + 1).select(F.col("id").cast("int").alias("k"))
    )
    lane = F.conv(
        F.substring(F.md5(F.concat(F.col("host"), F.lit(":"), F.col("k"))), 1, 14),
        16,
        10,
    ).cast("long")
    key = lane * 32 + (_RDV_W + 1 - F.col("k"))
    cand = hosts.crossJoin(workers).select("host", "load", "k", key.alias("key"))
    rdv = cand.groupBy("host", "load").agg(
        F.max_by(
            F.when(F.col("k") < _RDV_W, F.col("k")),
            F.when(F.col("k") < _RDV_W, F.col("key")),
        ).alias("a16"),
        F.max_by("k", F.col("key")).alias("a17"),
    )
    lane0 = F.conv(F.substring(F.md5(F.col("host")), 1, 14), 16, 10).cast("long")
    modu = hosts.select(
        "host", (lane0 % _RDV_W).alias("m16"), (lane0 % (_RDV_W + 1)).alias("m17")
    )
    j = rdv.join(modu, "host")
    per = j.select(
        F.lit("rendezvous").alias("method"),
        F.col("a16").alias("w"),
        "load",
        (F.col("a16") != F.col("a17")).cast("int").alias("mv"),
    ).unionByName(
        j.select(
            F.lit("modulo").alias("method"),
            F.col("m16").cast("int").alias("w"),
            "load",
            (F.col("m16") != F.col("m17")).cast("int").alias("mv"),
        )
    )
    wl = per.groupBy("method", "w").agg(
        F.sum("load").alias("wload"),
        F.count(F.lit(1)).alias("nh"),
        F.sum("mv").alias("mvd"),
    )
    return wl.groupBy("method").agg(
        F.sum("nh").alias("n_hosts"),
        F.sum("mvd").alias("n_moved_on_resize"),
        F.max("wload").alias("max_worker_load"),
        F.min("wload").alias("min_worker_load"),
        F.sum(F.col("wload") * F.col("wload")).alias("sum_sq_worker_load"),
    )
