"""VARIANT and Python-UDTF gates (plans/modern_queries.py): semantic
cross-checks against the Catalyst formulations the engine's hot paths
use."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vbpl_web_crawl_spark.sources.tables import load_table


def test_variant_get_matches_regexp_path(spark):
    """Typed variant_get('$.k') == the regexp string extraction the
    json_prop_extract gate uses — same rows, same values."""
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "v", F.parse_json("props")
    )
    mismatch = ev.filter(
        F.variant_get("v", "$.k", "bigint")
        != F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    ).count()
    assert mismatch == 0


def test_try_variant_get_missing_path_is_null_not_error(spark):
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "v", F.parse_json("props")
    )
    n = ev.count()
    n_null = ev.filter(
        F.try_variant_get("v", "$.missing", "bigint").isNull()
    ).count()
    assert n_null == n


def test_udtf_lateral_equals_catalyst_posexplode(spark):
    """The UDTF lateral expansion must be row-identical to the pure
    Catalyst posexplode(split(...)) form — the engine's scale path."""
    from vbpl_web_crawl_spark.plans.modern_queries import (
        _register_tokens_udtf,
    )

    _register_tokens_udtf(spark)
    docs = load_table(spark, SF_DIR, "documents")
    docs.createOrReplaceTempView("udtf_docs_t")
    via_udtf = spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM udtf_docs_t d, LATERAL doc_tokens(d.text) t"
    )
    via_catalyst = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    assert via_udtf.exceptAll(via_catalyst).count() == 0
    assert via_catalyst.exceptAll(via_udtf).count() == 0


def test_gates_match_duckdb_oracle(spark):
    import duckdb
    import pandas as pd

    from vbpl_web_crawl_spark.plans.queries import get_oracles, get_queries

    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    for name in ("variant_props_extract", "udtf_token_explode_topk"):
        got = get_queries()[name](spark, SF_DIR).toPandas()
        want = con.execute(get_oracles()[name]).df()
        key = got.columns[0]
        got = got.sort_values(key).reset_index(drop=True)
        want = want.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[want.columns], want, check_dtype=False
        )
