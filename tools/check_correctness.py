"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against its
``oracle_sql()`` in DuckDB: row count, column names (sorted), and an
order-insensitive value comparison. Usage:

    python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


STRICT = os.environ.get("SPARK_GRAFT_STRICT", "1") == "1"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if STRICT:
            # mimic the driver's value-hash: every cell stringified, so a
            # DuckDB HUGEINT->float64 '0.0' vs Spark bigint '0' is a FAIL
            df[c] = df[c].map(lambda v: repr(v))
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    # the FULL internal registry, not the driver-facing consolidated
    # view (__spark_entry__): subsumed gates stay locally verified
    # even while the driver certifies them via their superset query
    # (plans/gate_registry.py, GATE_COVERAGE.md)
    from vbpl_web_crawl_spark.plans.queries import get_oracles, get_queries
    from vbpl_web_crawl_spark.session import get_spark

    # overridable so the robustness sweep can re-run the whole registry at
    # an unusual parallelism (e.g. cpus=5 / shuffle=7) and prove results
    # are partitioning-invariant — any query whose output depends on task
    # count or partition boundaries fails loudly here before it fails at
    # 1000 executors
    cpus = int(os.environ.get("SPARK_GRAFT_CHECK_CPUS", "16"))
    shuffle = os.environ.get("SPARK_GRAFT_CHECK_SHUFFLE")
    spark = get_spark(
        "correctness_check",
        cpus=cpus,
        shuffle_partitions=int(shuffle) if shuffle else None,
    )
    qs = get_queries()
    oracles = get_oracles()
    only = set(sys.argv[1:])

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows  ({spark_s:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        a, b = _canon(sdf), _canon(odf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            print(f"OK    {name}: {len(a)} rows  ({spark_s:.1f}s)")
        except AssertionError as e:
            failures.append(name)
            print(f"FAIL  {name}: values differ: {str(e).splitlines()[-1][:200]}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
