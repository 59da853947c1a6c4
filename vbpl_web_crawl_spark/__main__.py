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


def main() -> None:
    p = argparse.ArgumentParser(description="run the crawl engine")
    p.add_argument("--ckpt", required=True, help="checkpoint directory")
    p.add_argument("--pages", type=int, default=4)
    p.add_argument("--docs-per-page", type=int, default=40)
    p.add_argument("--window", type=float, default=600.0, help="politeness round window (s)")
    p.add_argument("--max-rounds", type=int, default=1000)
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()

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


if __name__ == "__main__":
    main()
