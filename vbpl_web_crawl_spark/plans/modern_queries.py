"""Spark-4 API-surface gates: the VARIANT semi-structured type and a
registered Python UDTF invoked laterally from SQL.

The reference accesses JSON fields imperatively
(/root/reference/app/service/vbpl.py:864-907, ``json.loads`` +  dict
access per row); the repo already gates the Catalyst regexp form
(``json_prop_extract``). These two gates pin the remaining modern
surfaces a user of a Spark engine expects:

- ``variant_props_extract`` — ``parse_json`` into the binary VARIANT
  type, typed path access via ``variant_get`` (and the NULL-vs-missing
  distinction via ``try_variant_get``). At 100 TB VARIANT beats
  per-query string re-parsing: the cast happens once at ingest, paths
  read a binary-encoded tree, and shredding pushes field access into
  the scan.
- ``udtf_token_explode_topk`` — a Python UDTF (``@udtf``) registered
  on the session and called in SQL as a LATERAL table function: the
  row-generating "page parse -> rows" shape (SURVEY §2 X2) as the
  modern API. The UDTF here is deliberately the API-surface gate, not
  the scale path — the engine's hot paths use posexplode(split(...))
  (pure Catalyst, see pipeline_queries.py) or Arrow-batched
  mapInPandas; the docstring-level rule "UDFs are the slow path"
  stands. The oracle certifies the lateral-join semantics (per-row
  expansion joined back to its input row) match plain SQL unnesting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# VARIANT: typed path access over events.props
# ---------------------------------------------------------------------------


@_register(
    "variant_props_extract",
    """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n,
       round(sum(value), 4) AS total_value,
       count(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                  THEN 1 END) AS n_missing_path
FROM events
GROUP BY 1
ORDER BY k_bucket
""",
)
def q_variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props parsed ONCE into VARIANT; the k path read with a typed
    ``variant_get`` (no regexp, no string re-scan), and a
    known-missing path probed with ``try_variant_get`` (NULL, not an
    error — the count pins that semantics)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.parse_json("props")
    )
    k = F.variant_get("v", "$.k", "bigint")
    missing = F.try_variant_get("v", "$.missing", "bigint")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.count(F.when(missing.isNull(), 1)).alias("n_missing_path"),
        )
        .orderBy("k_bucket")
    )


# ---------------------------------------------------------------------------
# Python UDTF: lateral row expansion registered as a SQL table function
# ---------------------------------------------------------------------------

_TOPK = 20


def _register_tokens_udtf(spark: SparkSession) -> None:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class DocTokens:
        def eval(self, text: str):
            if text is None:
                return
            # split(' ') exactly — the oracle's string_split(text, ' ')
            # keeps empty tokens on runs of spaces, so mirror it
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("doc_tokens", DocTokens)


@_register(
    "udtf_token_explode_topk",
    f"""
WITH exploded AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
)
SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs,
       min(pos) AS first_pos
FROM exploded
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT {_TOPK}
""",
)
def q_udtf_token_explode_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token top-{_TOPK} through the registered UDTF: each
    document row lateral-joins to its (pos, token) expansion, then a
    plain Catalyst aggregation runs on top — the UDTF emits rows, the
    engine still owns the shuffle/agg/top-k."""
    _register_tokens_udtf(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_docs_v"
    )
    return spark.sql(
        f"""
        SELECT t.token, count(*) AS n, count(DISTINCT d.doc_id) AS n_docs,
               min(t.pos) AS first_pos
        FROM udtf_docs_v d, LATERAL doc_tokens(d.text) t
        GROUP BY t.token
        ORDER BY n DESC, t.token ASC
        LIMIT {_TOPK}
        """
    )
