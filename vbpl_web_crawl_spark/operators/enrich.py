"""External-enrichment lookup-joins (S6-S8, SURVEY.md §2.1).

The reference enriches each document from three external sites:
- concetti JSON API (app/service/vbpl.py:807-920): search by key params,
  <=2 pages x 5 items, fuzzy-match (Levenshtein ratio >= 0.8) over 3
  candidate fields, first match wins
- tvpl HTML fallback (vbpl.py:923-988): used when the portal's full
  text is missing -> coalesce of two fetch results
- luatvietnam sector scrape (vbpl.py:1179-1263): search by serial
  number/sub_title; default 'Lĩnh vực khác' when nothing matches
  (vbpl.py:1262-1263)

Spark shape (identical for all three): candidate keys DF -> batched
"HTTP" lookup inside mapInPandas (one session per partition; here a
deterministic synthetic function of the key, no network) -> explode
candidate hits -> fuzzy-ratio predicate -> rank-1 per document
(deterministic first-match, A6) -> left join back -> coalesce default.
At scale the lookup stage is bounded by the candidate budget
(<=10/doc), so the join fan-out is constant per document.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vbpl_web_crawl_spark.functions.scalars import levenshtein_ratio
from vbpl_web_crawl_spark.sources.images import splitmix64

HITS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("candidate_rank", T.IntegerType(), False),
        T.StructField("hit_title", T.StringType(), False),
        T.StructField("hit_sector", T.StringType(), False),
    ]
)

SECTORS = ("Đất đai", "Thuế", "Môi trường", "Giao thông", "Lao động")
DEFAULT_SECTOR = "Lĩnh vực khác"  # vbpl.py:1262-1263


def synthetic_external_search(doc_id: int, query: str, max_hits: int = 5) -> list[dict]:
    """Deterministic stand-in for the external search API: ~70% of docs
    get one exact-title hit (somewhere in the ranked list) + noise hits;
    the rest get only noise (exercising the default fallback)."""
    h = int(splitmix64(doc_id * 7919 + 13))
    hits = []
    exact_pos = h % max_hits if h % 10 < 7 else -1
    for rank in range(max_hits):
        if rank == exact_pos:
            title = query  # ratio 1.0
        elif rank == (exact_pos + 1) % max_hits and h % 3 == 0:
            title = query[:-1] + "~"  # near-match just above 0.8
        else:
            title = f"văn bản khác {h % 1000}-{rank}"
        hits.append(
            {
                "doc_id": doc_id,
                "candidate_rank": rank,
                "hit_title": title,
                "hit_sector": SECTORS[(h + rank) % len(SECTORS)],
            }
        )
    return hits


def lookup_join_enrich(
    docs: DataFrame,
    key_col: str = "doc_id",
    query_col: str = "title",
    search_fn: Callable = synthetic_external_search,
    threshold: float = 0.8,
    default_sector: str = DEFAULT_SECTOR,
) -> DataFrame:
    """docs(doc_id, title, ...) -> docs + (matched_sector, match_ratio).

    First match wins = lowest candidate_rank among hits whose fuzzy
    ratio clears the threshold (reference `found` short-circuit,
    vbpl.py:828-849, expressed as rank-1 selection)."""
    keys = docs.select(key_col, query_col)

    def fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                rows.extend(search_fn(int(getattr(r, key_col)), str(getattr(r, query_col))))
            yield pd.DataFrame(rows, columns=[f.name for f in HITS_SCHEMA.fields])

    hits = keys.mapInPandas(fetch, HITS_SCHEMA)
    ratio = levenshtein_ratio(F.col(query_col), F.col("hit_title"))
    scored = (
        hits.join(keys.withColumnRenamed(key_col, "k_id"), F.col("doc_id") == F.col("k_id"))
        .withColumn("ratio", ratio)
        .filter(F.col("ratio") >= threshold)
    )
    w = Window.partitionBy("doc_id").orderBy("candidate_rank")
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("doc_id").alias("m_id"),
            F.col("hit_sector").alias("matched_sector_raw"),
            F.round("ratio", 4).alias("match_ratio"),
        )
    )
    return (
        docs.join(best, docs[key_col] == best.m_id, "left")
        .withColumn(
            "matched_sector",
            F.coalesce(F.col("matched_sector_raw"), F.lit(default_sector)),
        )
        .drop("m_id", "matched_sector_raw")
    )


def coalesce_fallback_fetch(primary: DataFrame, fallback: DataFrame, key: str, col: str) -> DataFrame:
    """S7 (tvpl fallback): primary content when present, else the
    fallback source's — coalesce of two fetch results (vbpl.py:456,464)."""
    p = primary.select(key, F.col(col).alias("p_val"))
    f = fallback.select(F.col(key).alias("f_key"), F.col(col).alias("f_val"))
    return p.join(f, p[key] == f.f_key, "left").select(
        key, F.coalesce(F.col("p_val"), F.col("f_val")).alias(col)
    )
