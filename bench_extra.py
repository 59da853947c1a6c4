"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

``bench.py`` is frozen for measurement; this harness exists so each
query can be timed alone against the noop sink, repeated, and its
``.explain("formatted")`` captured, without touching the driver's
methodology.

Usage:
    python bench_extra.py [--sf DIR] [--repeat N] [--explain-dir DIR]
                          [--cpus N] [query ...]

With no query names, runs the full HEADLINE list from bench.py.
Prints one JSON line per query: {"query": name, "secs": [..], "min": s}
and a final summary line {"total_min": s, "sf": ..., "n": k}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: HEADLINE)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from bench import HEADLINE  # frozen list, read-only import
    from vbpl_web_crawl_spark.plans.queries import get_queries
    from vbpl_web_crawl_spark.session import get_spark

    names = args.queries or HEADLINE
    spark = get_spark("bench_extra", cpus=args.cpus)
    qs = get_queries()
    # same warmup as bench.py
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()
    spark.range(1000).selectExpr("sum(id)").collect()

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)

    total = 0.0
    for name in names:
        if name not in qs:
            print(json.dumps({"query": name, "error": "unknown"}), flush=True)
            continue
        if args.explain_dir:
            df = qs[name](spark, args.sf)
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        def _cpu():
            try:
                with open("/proc/stat") as fh:
                    return [int(v) for v in fh.readline().split()[1:9]]
            except Exception:
                return None

        secs = []
        steals = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            c0 = _cpu()
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            secs.append(round(time.time() - t0, 3))
            c1 = _cpu()
            if c0 and c1:
                d = [b - a for a, b in zip(c0, c1)]
                steals.append(round(100.0 * d[7] / max(sum(d), 1), 2))
            spark.sparkContext.setJobDescription(None)
        total += min(secs)
        print(
            json.dumps(
                {"query": name, "secs": secs, "min": min(secs), "steal": steals}
            ),
            flush=True,
        )
    print(json.dumps({"total_min": round(total, 3), "sf": args.sf, "n": len(names)}), flush=True)


if __name__ == "__main__":
    main()
