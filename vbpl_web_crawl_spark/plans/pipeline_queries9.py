"""Round-5 continuation queries, part 9: the Python DataSource scan
gates.

``sources/spark_datasource.py`` exposes the synthetic listing universe
(the reference's paginated listing scan, /root/reference/app/service/
vbpl.py:96-131) as a registered Spark Python Data Source with
partition-per-page planning, pushFilters partition pruning, and
Arrow-batch reads. These gates pin its OUTPUT against a from-scratch
DuckDB SQL reconstruction of the link arithmetic — the oracle shares
no code with the source (it re-derives ``doc_id_for``'s integer rules
inline), so a drift in either the generator or the DataSource plumbing
(a dropped partition, a mis-pruned filter, an Arrow column swap)
surfaces as a hash mismatch.

Both gates are sf-independent (the listing universe is config-keyed,
not data-keyed); the fixed config below (6 pages x 130 docs x 2
classes x 2 mirrors = 3,120 link rows) matches the pytest suite's.

Scale note: the scan's parallelism is the (mirror, doc_class, page)
grid — at the reference's real shape (1000 pages/class) one crawl
sweep plans 2000+ independent partitions with zero shuffle, and a
``WHERE page = k`` point re-crawl prunes to 2 partitions at PLANNING
time via the pushed filter, not a post-scan Spark filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vbpl_web_crawl_spark.plans.queries import _register

_PAGES, _DPP, _MIRRORS = 6, 130, 2

# Pure-SQL reconstruction of synth_site.doc_id_for + fetch()'s listing
# branch (synth_site.py:149-156,216-227): cls_idx*1e6 + (page-1)*dpp +
# pos, back-linked every 10th slot past page 1, every 50th slot under
# /private/, mirrors k>0 prefixed m<k>.
_LINKS_SQL_BODY = f"""
WITH classes(doc_class, cls_idx) AS (VALUES ('phap_quy', 1), ('hop_nhat', 2)),
grid AS (
  SELECT m.mirror, c.doc_class, c.cls_idx, p.page, s.pos
  FROM range(0, {_MIRRORS}) m(mirror)
  CROSS JOIN classes c
  CROSS JOIN range(1, {_PAGES} + 1) p(page)
  CROSS JOIN range(0, {_DPP}) s(pos)
),
calc AS (
  SELECT mirror, doc_class, page, pos,
    cls_idx * 1000000 + (page - 1) * {_DPP} + pos
      - CASE WHEN pos % 10 = 9 AND page > 1 THEN {_DPP} ELSE 0 END AS did,
    CASE WHEN mirror = 0 THEN '' ELSE 'm' || mirror || '.' END AS pref,
    CASE WHEN pos % 50 = 49 THEN 'private/doc' ELSE 'doc' END AS path
  FROM grid
)
SELECT CAST(mirror AS INTEGER) AS mirror, doc_class,
       CAST(page AS INTEGER) AS page, CAST(pos AS INTEGER) AS pos,
       'https://' || pref || 'vbpl.vn/' || path || '/' || doc_class || '/' || did AS url,
       doc_class AS doc_type
FROM calc
"""


def _read(spark: SparkSession) -> DataFrame:
    from vbpl_web_crawl_spark.sources import spark_datasource

    # runtime SQL conf; Spark refuses a pushFilters-implementing reader
    # outright while this is false (DATA_SOURCE_PUSHDOWN_DISABLED)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark_datasource.register(spark)
    return (
        spark.read.format("synthsite")
        .option("pages", _PAGES)
        .option("docs_per_page", _DPP)
        .option("mirrors", _MIRRORS)
        .load()
    )


@_register("datasource_listing_links", _LINKS_SQL_BODY)
def q_datasource_listing_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-universe scan through the registered Python DataSource —
    one Arrow batch per (mirror, doc_class, page) partition."""
    return _read(spark)


@_register(
    "datasource_point_page",
    f"SELECT * FROM ({_LINKS_SQL_BODY}) WHERE page = 3 AND doc_class = 'phap_quy'",
)
def q_datasource_point_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point re-crawl of one listing page: the WHERE is pushed through
    ``pushFilters`` and prunes the plan to {_MIRRORS} partitions out of
    the full grid (pruning itself is asserted at the planning level in
    tests/test_spark_datasource.py; THIS gate certifies the pruned scan
    still returns exactly the right rows)."""
    df = _read(spark)
    return df.where((df.page == 3) & (df.doc_class == "phap_quy"))
