"""Round-5 continuation queries, part 10: the WARC archive container
gate and the sitemap-protocol frontier-seed gate.

``sources/warc.py`` writes the corpus into real WARC/1.1 segment blobs
and parses them back (digest-verified). The gate round-trips the
documents table through the PHYSICAL container — build records, frame
segments, parse the bytes — and emits the CDX index (the standard
byte-offset index next to any WARC archive). The DuckDB oracle
reconstructs the byte-exact CDX from the source table alone using the
record-length closed form (fixed overhead + URI length +
content-length digits + payload octets) and a window cumsum for
offsets — it shares no code with the writer, so a single byte of
drift anywhere in the container layout (header framing, separator,
digest stamping, segment ordering) surfaces as a value-hash mismatch,
and payload corruption raises inside the parser before the gate even
compares.

Scale note (100 TB): the gate's shape is the production export path —
segments are the write-parallel unit (repartition by segment key, 1 GB
blobs at production scale per Common Crawl convention), the CDX is a
normal table enabling point reads as (equi-join -> ranged read). The
encode and decode stages touch payload bytes only inside Arrow
batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table
from vbpl_web_crawl_spark.sources.warc import (
    FIXED_OVERHEAD,
    decode_segments,
    encode_segments,
)

_N_SEGMENTS = 16

_CDX_SQL = f"""
WITH base AS (
  SELECT doc_id,
         'https://vbpl.vn/' || source || '/' || doc_id AS url,
         CAST(doc_id % {_N_SEGMENTS} AS INTEGER) AS segment,
         octet_length(encode(coalesce(text, ''))) AS n,
         sha256(coalesce(text, '')) AS digest
  FROM documents
),
rec AS (
  SELECT doc_id, url, segment, digest,
         -- URI width in UTF-8 BYTES (octet_length), matching the
         -- writer's header encoding; length() would undercount any
         -- non-ASCII URI
         {FIXED_OVERHEAD} + octet_length(encode(url))
           + length(CAST(n AS VARCHAR)) + n AS record_len
  FROM base
)
SELECT doc_id, url, segment,
       CAST(COALESCE(sum(record_len) OVER (
              PARTITION BY segment ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS byte_offset,
       CAST(record_len AS BIGINT) AS record_len,
       digest
FROM rec
"""


@_register("warc_cdx_index", _CDX_SQL)
def q_warc_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX index parsed back out of real WARC segment blobs; the
    oracle re-derives every byte offset closed-form from the source
    table, certifying the container layout end-to-end."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://vbpl.vn/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("payload"),
    )
    cdx = decode_segments(encode_segments(docs, _N_SEGMENTS))
    return cdx.select(
        "doc_id",
        "url",
        "segment",
        F.col("offset").alias("byte_offset"),
        "record_len",
        "digest",
    )


_SITEMAP_SQL = """
SELECT source || '.vbpl.vn' AS host,
       'https://' || source || '.vbpl.vn/doc/' || doc_id AS url,
       CAST(DATE '2026-01-01' + CAST(doc_id % 365 AS INTEGER) AS VARCHAR)
         AS lastmod,
       (doc_id % 10) / 10.0 AS priority
FROM documents
"""


@_register("sitemap_frontier_seed", _SITEMAP_SQL)
def q_sitemap_frontier_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier seed rows recovered by PARSING real per-host sitemap
    XML the engine rendered (crawl/sitemaps.py): documents -> spec-
    shaped chunked urlsets -> xpath parse -> (host, url, lastmod,
    priority). The oracle emits the seed rows directly, so the gate
    certifies render∘parse = identity — entity escaping, chunk
    assignment, field alignment, and priority formatting included.
    Entirely Catalyst-side: string agg + built-in xpath, no Python."""
    from vbpl_web_crawl_spark.crawl.sitemaps import parse_sitemaps, render_sitemaps

    urls = load_table(spark, sf_dir, "documents").select(
        F.concat(F.col("source"), F.lit(".vbpl.vn")).alias("host"),
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".vbpl.vn/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.date_format(
            F.date_add(
                F.to_date(F.lit("2026-01-01")),
                F.pmod(F.col("doc_id"), F.lit(365)).cast("int"),
            ),
            "yyyy-MM-dd",
        ).alias("lastmod"),
        (F.pmod(F.col("doc_id"), F.lit(10)) / F.lit(10.0)).alias("priority"),
        # 0-based per-host position stand-in: exercises multi-chunk
        # rendering (chunk = seq div chunk_size) deterministically
        F.pmod(F.col("doc_id"), F.lit(1000)).alias("seq"),
    )
    return parse_sitemaps(render_sitemaps(urls, chunk_size=100))


# ---------------------------------------------------------------------------
# Sitemap-lastmod delta recrawl: the NO-FETCH freshness signal. A real
# crawler refetches a host's sitemap (bytes ~ 1/1000th of the pages it
# indexes) and diffs lastmod against the previous generation to decide
# what to revisit — complementing recrawl_cdc_delta, which diffs
# CONTENT after fetching. Generation B is a deterministic mutation of
# A: docs with doc_id % 13 == 0 disappear (removed), doc_id % 5 == 0
# get lastmod + 1 day (changed), everything else is untouched. BOTH
# generations round-trip through real rendered XML and the xpath
# parser before the diff, so the gate certifies the full
# parse-diff-classify pipeline; the oracle re-derives the classes
# straight from the arithmetic. FULL OUTER join on the url key only —
# at 10^10 URLs the diff shuffles (url, lastmod), never page bodies.
# ---------------------------------------------------------------------------

_SITEMAP_DELTA_SQL = """
WITH a AS (
  SELECT source || '.vbpl.vn' AS host,
         'https://' || source || '.vbpl.vn/doc/' || doc_id AS url,
         CAST(DATE '2026-01-01' + CAST(doc_id % 365 AS INTEGER) AS VARCHAR)
           AS lastmod
  FROM documents
),
b AS (
  SELECT source || '.vbpl.vn' AS host,
         'https://' || source || '.vbpl.vn/doc/' || doc_id AS url,
         CAST(DATE '2026-01-01'
              + CAST(doc_id % 365 AS INTEGER)
              + CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS INTEGER)
              AS VARCHAR) AS lastmod
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  -- generation-B-only pages (the 'added' class): revision-2 URLs
  SELECT source || '.vbpl.vn',
         'https://' || source || '.vbpl.vn/doc/' || doc_id || '-rev2',
         CAST(DATE '2026-06-01' AS VARCHAR)
  FROM documents WHERE doc_id % 11 = 0
),
d AS (
  SELECT COALESCE(a.host, b.host) AS host,
         CASE WHEN a.url IS NULL THEN 'added'
              WHEN b.url IS NULL THEN 'removed'
              WHEN a.lastmod <> b.lastmod THEN 'changed'
              ELSE 'unchanged' END AS change,
         COALESCE(a.url, b.url) AS url
  FROM a FULL OUTER JOIN b ON a.url = b.url
)
SELECT host, change,
       CAST(count(*) AS BIGINT) AS n_urls,
       min(url) AS min_url, max(url) AS max_url
FROM d GROUP BY host, change
"""


@_register("sitemap_delta_revisit", _SITEMAP_DELTA_SQL)
def q_sitemap_delta_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host added/removed/changed/unchanged classification of two
    sitemap generations, both parsed out of real rendered XML."""
    from vbpl_web_crawl_spark.crawl.sitemaps import parse_sitemaps, render_sitemaps

    def gen(docs: DataFrame, shift_changed: bool) -> DataFrame:
        lastmod_days = F.pmod(F.col("doc_id"), F.lit(365)).cast("int")
        if shift_changed:
            lastmod_days = lastmod_days + F.when(
                F.pmod(F.col("doc_id"), F.lit(5)) == 0, F.lit(1)
            ).otherwise(F.lit(0))
        return docs.select(
            F.concat(F.col("source"), F.lit(".vbpl.vn")).alias("host"),
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".vbpl.vn/doc/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            F.date_format(
                F.date_add(F.to_date(F.lit("2026-01-01")), lastmod_days),
                "yyyy-MM-dd",
            ).alias("lastmod"),
            F.lit(0.5).alias("priority"),
        )

    docs = load_table(spark, sf_dir, "documents")
    added = docs.filter(F.pmod("doc_id", F.lit(11)) == 0).select(
        F.concat(F.col("source"), F.lit(".vbpl.vn")).alias("host"),
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".vbpl.vn/doc/"),
            F.col("doc_id").cast("string"),
            F.lit("-rev2"),
        ).alias("url"),
        F.lit("2026-06-01").alias("lastmod"),
        F.lit(0.5).alias("priority"),
    )
    a = parse_sitemaps(render_sitemaps(gen(docs, False)))
    b = parse_sitemaps(
        render_sitemaps(
            gen(docs.filter(F.pmod("doc_id", F.lit(13)) != 0), True).unionByName(
                added
            )
        )
    )
    d = a.select("host", "url", "lastmod").alias("a").join(
        b.select("host", "url", "lastmod").alias("b"),
        F.col("a.url") == F.col("b.url"),
        "full_outer",
    )
    classified = d.select(
        F.coalesce(F.col("a.host"), F.col("b.host")).alias("host"),
        F.when(F.col("a.url").isNull(), F.lit("added"))
        .when(F.col("b.url").isNull(), F.lit("removed"))
        .when(F.col("a.lastmod") != F.col("b.lastmod"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
        F.coalesce(F.col("a.url"), F.col("b.url")).alias("url"),
    )
    return classified.groupBy("host", "change").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.min("url").alias("min_url"),
        F.max("url").alias("max_url"),
    )


# ---------------------------------------------------------------------------
# Crawl-trap detection: URL templating + query-explosion flags. A trap
# (calendar pages, session ids, faceted-search grids) shows up as ONE
# path template fanning out into unbounded query variants — the
# classic way a frontier balloons to 10^10 "URLs" of no new content.
# Collapse digit runs to 'N' to form the template, then per (host,
# template) compare total URL count against distinct PATHS: a
# variants-per-path ratio >= 10 (integer cross-multiplication) flags
# the template, and the frontier admission gate would cap or drop it.
# The reference has no trap defense (its universe is the fixed
# 1000-page listing walk, app/service/vbpl.py:96-97); at open-web
# scale this filter is what keeps the seen-set honest. Pure Catalyst
# string ops; shuffle carries (host, template) keys only.
# ---------------------------------------------------------------------------

_TRAP_URLS_SQL = """
  SELECT source || '.vbpl.vn' AS host,
         '/doc/' || doc_id AS pq
  FROM documents
  UNION ALL
  SELECT source || '.vbpl.vn',
         '/calendar?y=2026&m=' || (doc_id % 12 + 1) || '&d=' || (doc_id % 28 + 1)
  FROM documents
"""

_TRAP_SQL = f"""
WITH u AS ({_TRAP_URLS_SQL}),
t AS (
  SELECT host,
         regexp_replace(pq, '[0-9]+', 'N', 'g') AS template,
         CASE WHEN strpos(pq, '?') > 0
              THEN substr(pq, 1, strpos(pq, '?') - 1) ELSE pq END AS path
  FROM u
)
SELECT host, template,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
       count(*) >= 10 * count(DISTINCT path) AS is_trap
FROM t GROUP BY host, template
"""


@_register("url_trap_templates", _TRAP_SQL)
def q_url_trap_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(host, template) URL counts, distinct-path counts, and the
    variants-per-path trap flag over a universe of detail pages plus a
    planted calendar trap."""
    docs = load_table(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".vbpl.vn")).alias("host")
    detail = docs.select(
        host, F.concat(F.lit("/doc/"), F.col("doc_id").cast("string")).alias("pq")
    )
    calendar = docs.select(
        host,
        F.concat(
            F.lit("/calendar?y=2026&m="),
            (F.pmod("doc_id", F.lit(12)) + 1).cast("string"),
            F.lit("&d="),
            (F.pmod("doc_id", F.lit(28)) + 1).cast("string"),
        ).alias("pq"),
    )
    u = detail.unionByName(calendar)
    q_at = F.instr(F.col("pq"), "?")
    t = u.select(
        "host",
        F.regexp_replace(F.col("pq"), "[0-9]+", "N").alias("template"),
        F.when(q_at > 0, F.substring_index(F.col("pq"), "?", 1))
        .otherwise(F.col("pq"))
        .alias("path"),
    )
    return t.groupBy("host", "template").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("path").alias("n_paths"),
        (F.count(F.lit(1)) >= F.lit(10) * F.countDistinct("path")).alias("is_trap"),
    )
