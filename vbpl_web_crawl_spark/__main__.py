"""spark-submit entry point (north_rule deployment shape):

    python tools/make_pyfiles.py                       # build dist/pyfiles.zip
    spark-submit --master local[32] \\
        --py-files dist/pyfiles.zip \\
        -m vbpl_web_crawl_spark  ...                   # or the file path

    spark-submit --py-files dist/pyfiles.zip vbpl_web_crawl_spark/__main__.py \\
        --ckpt /tmp/crawl_ckpt --pages 4 --docs-per-page 40 --window 600

On a real cluster the same command with --master yarn/k8s and N or 4N
executors runs unchanged: the engine has no local-mode assumptions
(state paths can be any Hadoop-compatible filesystem).
"""

from __future__ import annotations

import argparse
import json


def _cmd_crawl(args) -> None:
    from pyspark.sql import SparkSession

    from vbpl_web_crawl_spark.crawl.engine import CrawlConfig, CrawlEngine
    from vbpl_web_crawl_spark.sources import synth_site as SITE

    spark = SparkSession.builder.appName("vbpl_crawl").getOrCreate()
    cfg = CrawlConfig(
        site=SITE.SiteConfig(n_pages=args.pages, docs_per_page=args.docs_per_page),
        round_window_s=args.window,
        max_rounds=args.max_rounds,
    )
    eng = CrawlEngine(spark, cfg, args.ckpt)
    manifest = eng.run(resume=not args.no_resume)
    print(json.dumps(manifest))


def _cmd_query(args) -> None:
    from pyspark.sql import SparkSession

    from vbpl_web_crawl_spark.plans.queries import get_queries

    qs = get_queries()
    if args.list or not args.name:
        for name in sorted(qs):
            print(name)
        return
    if args.name not in qs:
        raise SystemExit(f"unknown query {args.name!r} (use --list)")
    spark = SparkSession.builder.appName(f"vbpl_query_{args.name}").getOrCreate()
    df = qs[args.name](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"query": args.name, "out": args.out}))
    else:
        df.show(args.show, truncate=False)


def main() -> None:
    p = argparse.ArgumentParser(description="vbpl_web_crawl_spark CLI")
    sub = p.add_subparsers(dest="cmd")

    c = sub.add_parser("crawl", help="run the crawl engine")
    c.add_argument("--ckpt", required=True, help="checkpoint directory")
    c.add_argument("--pages", type=int, default=4)
    c.add_argument("--docs-per-page", type=int, default=40)
    c.add_argument("--window", type=float, default=600.0, help="politeness round window (s)")
    c.add_argument("--max-rounds", type=int, default=1000)
    c.add_argument("--no-resume", action="store_true")
    c.set_defaults(fn=_cmd_crawl)

    q = sub.add_parser("query", help="run a registered query by name")
    q.add_argument("name", nargs="?", help="query name (see --list)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--out", help="write result parquet here instead of showing")
    q.add_argument("--show", type=int, default=20)
    q.add_argument("--list", action="store_true")
    q.set_defaults(fn=_cmd_query)

    # backward compatibility: bare `--ckpt ...` args mean `crawl`
    import sys as _sys

    argv = _sys.argv[1:]
    if argv and argv[0].startswith("--"):
        argv = ["crawl", *argv]
    args = p.parse_args(argv)
    if not getattr(args, "fn", None):
        p.print_help()
        raise SystemExit(2)
    args.fn(args)


if __name__ == "__main__":
    main()
