"""The reference's own query surface (SURVEY.md §3.3 + §2 read paths)
over the reference-schema tables, each with a DuckDB-equivalent oracle
verified in pytest (tests/test_reference_queries.py).

These are the queries a user of /root/reference runs today — the parity
suite ("switch and run every query"). Cites per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.functions import scalars as S

# Each entry: name -> (fn(tables) -> DataFrame, duckdb_sql)
REFERENCE_QUERIES: dict = {}


def _register(name: str, sql: str):
    def deco(fn):
        REFERENCE_QUERIES[name] = (fn, sql)
        return fn

    return deco


# --- fetch_vbpl_by_id Q1 (app/service/vbpl.py:1075-1091): 15-col
# projection, key filter, soft-delete filter, latest-by-updated_at ---


@_register(
    "vbpl_by_id",
    """
SELECT id, file_link, title, sub_title, doc_type, serial_number,
       strftime(issuance_date, '%Y-%m-%d') AS issuance_date,
       strftime(effective_date, '%Y-%m-%d') AS effective_date,
       state, issuing_authority, sector
FROM vbpl
WHERE id = 42 AND deleted_at IS NULL
ORDER BY updated_at DESC
LIMIT 1
""",
)
def q_vbpl_by_id(t) -> DataFrame:
    return (
        t["vbpl"]
        .filter((F.col("id") == 42) & S.not_deleted(F.col("deleted_at")))
        .orderBy(F.desc("updated_at"))
        .limit(1)
        .select(
            "id",
            "file_link",
            "title",
            "sub_title",
            "doc_type",
            "serial_number",
            S.iso_date_string(F.col("issuance_date")).alias("issuance_date"),
            S.iso_date_string(F.col("effective_date")).alias("effective_date"),
            "state",
            "issuing_authority",
            "sector",
        )
    )


# --- fetch_vbpl_by_id Q2+Q3 (vbpl.py:1093-1101): edges->nodes joins,
# soft-delete-aware (primaryjoin deleted_at filter, app/model/vbpl.py:95) ---


@_register(
    "vbpl_dossier_links",
    """
SELECT 'related' AS edge_kind, r.source_id, r.related_id AS other_id,
       v.title AS other_title, r.doc_type AS edge_type
FROM vbpl_related_document r
JOIN vbpl v ON v.id = r.related_id AND v.deleted_at IS NULL
WHERE r.source_id = 42
UNION ALL
SELECT 'doc_map' AS edge_kind, m.source_id, m.doc_map_id AS other_id,
       v.title AS other_title, m.doc_map_type AS edge_type
FROM vbpl_doc_map m
JOIN vbpl v ON v.id = m.doc_map_id AND v.deleted_at IS NULL
WHERE m.source_id = 42
""",
)
def q_vbpl_dossier_links(t) -> DataFrame:
    vbpl = t["vbpl"].filter(S.not_deleted(F.col("deleted_at"))).select(
        F.col("id").alias("node_id"), F.col("title").alias("other_title")
    )
    rel = (
        t["vbpl_related_document"]
        .filter(F.col("source_id") == 42)
        .select(
            "source_id",
            F.col("related_id").alias("other_id"),
            F.col("doc_type").alias("edge_type"),
            F.lit("related").alias("edge_kind"),
        )
    )
    dm = (
        t["vbpl_doc_map"]
        .filter(F.col("source_id") == 42)
        .select(
            "source_id",
            F.col("doc_map_id").alias("other_id"),
            F.col("doc_map_type").alias("edge_type"),
            F.lit("doc_map").alias("edge_kind"),
        )
    )
    edges = rel.unionByName(dm)
    return edges.join(vbpl, edges.other_id == vbpl.node_id).select(
        "edge_kind", "source_id", "other_id", "other_title", "edge_type"
    )


# --- get_vbpl_preview (vbpl.py:1142-1147): date filter + sort + limit ---


@_register(
    "vbpl_preview_recent",
    """
SELECT id, title, serial_number, strftime(issuance_date, '%Y-%m-%d') AS issuance_date
FROM vbpl
WHERE deleted_at IS NULL AND issuance_date IS NOT NULL
ORDER BY issuance_date DESC, id DESC
LIMIT 20
""",
)
def q_vbpl_preview(t) -> DataFrame:
    return (
        t["vbpl"]
        .filter(S.not_deleted(F.col("deleted_at")) & F.col("issuance_date").isNotNull())
        .orderBy(F.desc("issuance_date"), F.desc("id"))
        .limit(20)
        .select(
            "id",
            "title",
            "serial_number",
            S.iso_date_string(F.col("issuance_date")).alias("issuance_date"),
        )
    )


# --- fetch_anle_by_id (anle.py:282-304): latest-wins on business key ---


@_register(
    "anle_latest_by_doc_id",
    """
SELECT doc_id, id AS latest_id, title, state
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY updated_at DESC, id DESC) AS rn
  FROM anle WHERE deleted_at IS NULL
) WHERE rn = 1
""",
)
def q_anle_latest(t) -> DataFrame:
    w = Window.partitionBy("doc_id").orderBy(F.desc("updated_at"), F.desc("id"))
    return (
        t["anle"]
        .filter(S.not_deleted(F.col("deleted_at")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("id").alias("latest_id"), "title", "state")
    )


# --- full-text join: sections of a doc (vbpl.py:215-218 composite key) ---


@_register(
    "toan_van_sections_of_doc",
    """
SELECT tv.vbpl_id, tv.section_number, tv.section_name, tv.chapter_number
FROM vbpl_toan_van tv
JOIN vbpl v ON v.id = tv.vbpl_id AND v.deleted_at IS NULL
WHERE tv.vbpl_id = 7
""",
)
def q_sections_of_doc(t) -> DataFrame:
    vbpl = t["vbpl"].filter(S.not_deleted(F.col("deleted_at"))).select(F.col("id"))
    return (
        t["vbpl_toan_van"]
        .filter(F.col("vbpl_id") == 7)
        .join(vbpl, F.col("vbpl_id") == F.col("id"), "inner")
        .select("vbpl_id", "section_number", "section_name", "chapter_number")
    )


# --- A2: max scalar aggregate (app/model/base.py:46-66) ---


@_register(
    "max_vbpl_id",
    "SELECT max(id) AS max_id, count(*) AS n FROM vbpl WHERE deleted_at IS NULL",
)
def q_max_id(t) -> DataFrame:
    return (
        t["vbpl"]
        .filter(S.not_deleted(F.col("deleted_at")))
        .agg(F.max("id").alias("max_id"), F.count(F.lit(1)).alias("n"))
    )


# --- A3: sector group-concat (vbpl.py:1253) ---


@_register(
    "sectors_per_authority",
    """
SELECT issuing_authority,
       string_agg(DISTINCT sector, ' - ' ORDER BY sector) AS sectors,
       count(*) AS n_docs
FROM vbpl WHERE deleted_at IS NULL
GROUP BY issuing_authority
""",
)
def q_sectors_concat(t) -> DataFrame:
    return (
        t["vbpl"]
        .filter(S.not_deleted(F.col("deleted_at")))
        .groupBy("issuing_authority")
        .agg(
            S.sorted_concat(F.collect_set("sector"), " - ").alias("sectors"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


# --- J6/F15: fuzzy match against a candidate set (vbpl.py:869-873,
# fields include serial_number): blocked by doc_type, ratio >= 0.8.
# serial_number (ASCII) is the oracle-checked field: DuckDB's
# levenshtein counts BYTES while Spark's counts CHARACTERS, so the two
# agree only on ASCII; the engine-side operator (S.levenshtein_ratio)
# is character-correct on Vietnamese titles too. ---


@_register(
    "fuzzy_serial_candidates",
    """
SELECT a.id AS left_id, b.id AS right_id,
       round(1.0 - CAST(levenshtein(a.serial_number, b.serial_number) AS DOUBLE)
             / greatest(length(a.serial_number), length(b.serial_number), 1), 4) AS ratio
FROM vbpl a JOIN vbpl b
  ON a.doc_type = b.doc_type AND a.id < b.id
WHERE a.deleted_at IS NULL AND b.deleted_at IS NULL
  AND 1.0 - CAST(levenshtein(a.serial_number, b.serial_number) AS DOUBLE)
      / greatest(length(a.serial_number), length(b.serial_number), 1) >= 0.8
""",
)
def q_fuzzy_serials(t) -> DataFrame:
    """Blocking is (doc_type, serial-length log-band): doc_type alone has
    a handful of distinct values (app/helper/enum.py:20-22), so at 10^8
    docs a doc_type-only block degenerates near-quadratic. ratio >= 0.8
    implies lev <= 0.2*max(len), and |len(a)-len(b)| <= lev, so any
    qualifying pair satisfies len(b) in [0.8*len(a), 1.25*len(a)] — i.e.
    |ln(len)/ln(1.3) difference| <= ln(1.25)/ln(1.3) < 1. Exploding the
    left side to its ±1 neighbor buckets therefore covers EVERY
    qualifying pair (exact, not approximate — same answer as the
    unblocked join, verified against the unblocked DuckDB oracle), while
    the equi-key (doc_type, band) keeps each shuffle bucket ~O(docs of
    one length class). Each pair joins exactly once: the three exploded
    bucket values are distinct and the right side carries one."""
    import math

    live = t["vbpl"].filter(S.not_deleted(F.col("deleted_at")))
    band = F.floor(
        F.log(F.greatest(F.length(F.col("serial_number")), F.lit(1)).cast("double"))
        / F.lit(math.log(1.3))
    ).cast("int")
    a = live.select(
        F.col("id").alias("left_id"),
        F.col("serial_number").alias("a_sn"),
        F.col("doc_type").alias("a_dt"),
        F.explode(
            F.array(band - F.lit(1), band, band + F.lit(1))
        ).alias("a_band"),
    )
    b = live.select(
        F.col("id").alias("right_id"),
        F.col("serial_number").alias("b_sn"),
        F.col("doc_type").alias("b_dt"),
        band.alias("b_band"),
    )
    ratio = S.levenshtein_ratio(F.col("a_sn"), F.col("b_sn"))
    return (
        a.join(
            b,
            (F.col("a_dt") == F.col("b_dt"))
            & (F.col("a_band") == F.col("b_band"))
            & (F.col("left_id") < F.col("right_id")),
        )
        .filter(ratio >= 0.8)
        .select("left_id", "right_id", F.round(ratio, 4).alias("ratio"))
    )


# --- F11: effectivity state recomputation at a fixed as_of ---


@_register(
    "recomputed_state_counts",
    """
SELECT CASE WHEN effective_date IS NOT NULL AND effective_date > TIMESTAMP '2020-01-01'
              THEN 'Chưa có hiệu lực'
            WHEN expiration_date IS NOT NULL AND expiration_date < TIMESTAMP '2020-01-01'
              THEN 'Hết hiệu lực'
            ELSE 'Có hiệu lực' END AS recomputed_state,
       count(*) AS n
FROM vbpl WHERE deleted_at IS NULL
GROUP BY 1
""",
)
def q_state_recompute(t) -> DataFrame:
    as_of = F.lit("2020-01-01").cast("timestamp")
    return (
        t["vbpl"]
        .filter(S.not_deleted(F.col("deleted_at")))
        .groupBy(
            S.effectivity_state(
                F.col("effective_date"), F.col("expiration_date"), as_of
            ).alias("recomputed_state")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- anle sections join (anle.py:264-273 existence + read path) ---


@_register(
    "anle_with_sections",
    """
SELECT a.doc_id, s.context, s.solution
FROM anle a JOIN anle_section s ON s.anle_id = a.id
WHERE a.deleted_at IS NULL AND a.state = 'Có hiệu lực'
""",
)
def q_anle_sections(t) -> DataFrame:
    a = t["anle"].filter(S.not_deleted(F.col("deleted_at")) & (F.col("state") == "Có hiệu lực"))
    return a.join(t["anle_section"], t["anle_section"].anle_id == a.id).select(
        "doc_id", "context", "solution"
    )


# --- dangling-edge audit (FK consistency; exercises anti-join) ---


@_register(
    "dangling_doc_map_edges",
    """
SELECT m.source_id, m.doc_map_id
FROM vbpl_doc_map m
WHERE NOT EXISTS (SELECT 1 FROM vbpl v WHERE v.id = m.doc_map_id)
""",
)
def q_dangling_edges(t) -> DataFrame:
    ids = t["vbpl"].select(F.col("id"))
    return t["vbpl_doc_map"].join(
        ids, t["vbpl_doc_map"].doc_map_id == ids.id, "left_anti"
    ).select("source_id", "doc_map_id")
