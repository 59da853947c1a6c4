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
         {FIXED_OVERHEAD} + length(url) + length(CAST(n AS VARCHAR)) + n
           AS record_len
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
