"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §3.3 shape) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the training-data pipeline layer; the
driver cross-checks each against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Make the package importable inside Spark python workers even when
    the driver session was created from a foreign cwd: ship
    dist/pyfiles.zip via addPyFile (idempotent per session)."""
    key = id(spark)
    if key in _SHIPPED:
        return
    zip_path = os.path.join(_REPO_ROOT, "dist", "pyfiles.zip")
    pkg = os.path.join(_REPO_ROOT, "vbpl_web_crawl_spark")
    newest_src = max(
        (
            os.path.getmtime(os.path.join(r, f))
            for r, _d, fs in os.walk(pkg)
            for f in fs
            if f.endswith(".py")
        ),
        default=0.0,
    )
    # rebuild when missing OR stale — a stale zip would shadow newer
    # source on the workers' import path
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest_src:
        sys.path.insert(0, os.path.join(_REPO_ROOT, "tools"))
        import make_pyfiles

        zip_path = make_pyfiles.main()
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from vbpl_web_crawl_spark.plans.queries import get_queries

    _ensure_shipped(spark)
    return get_queries()["flagship_latest_order_dossier"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 —
    consolidated (subsumed gates certified via their superset query)
    and rotation-ordered so the driver's bounded artifact window
    re-certifies every gate across rounds (plans/gate_registry.py;
    committed map in GATE_COVERAGE.md)."""
    from vbpl_web_crawl_spark.plans.gate_registry import gate_queries

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in gate_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omissions are rows-only checks
    (non-SQL-expressible ops: crawl rounds, sketch state, image decode)."""
    from vbpl_web_crawl_spark.plans.gate_registry import gate_oracles

    return gate_oracles()
