"""End-to-end training-corpus pipeline demo: chain the engine's stages
the way a production 100 TB run would, printing a stage-by-stage
funnel. Every stage is one of the gate-certified operators — this
script only sequences them.

    python tools/corpus_pipeline_demo.py [sf_dir]

Stages (documents table in, packed-corpus stats out):
  1. text quality filter   (quality_score >= 0.75)
  2. near-dup clusters     (verified MinHash pairs -> connected components)
  3. keep best per cluster (quality-argmax representative)
  4. decontamination       (drop docs overlapping the eval split 8-grams)
  5. mixture materialization stats (per-stream epoch-budget selection)
  6. sequence packing stats (512-token concat-and-chunk)

At 100 TB each arrow is a parquet/Iceberg materialization boundary
instead of an in-session DataFrame; the operator plans are unchanged
(they only read the narrow columns they need, shuffle 8-byte keys,
and broadcast their bounded dimension tables).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from vbpl_web_crawl_spark.functions import text as TX
    from vbpl_web_crawl_spark.plans.queries import get_queries
    from vbpl_web_crawl_spark.session import get_spark
    from vbpl_web_crawl_spark.sources.tables import load_table

    spark = get_spark("corpus-pipeline-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()
    t0 = time.time()

    docs = load_table(spark, SF_DIR, "documents")
    n_raw = docs.count()
    print(f"[1] raw documents: {n_raw}")

    quality_ok = docs.filter(TX.quality_score(F.col("text")) >= 0.75)
    n_quality = quality_ok.count()
    print(f"[1] after quality filter (score >= 0.75): {n_quality}")

    cc = qs["dedup_connected_components"](spark, SF_DIR)
    n_clustered = cc.count()
    keep = qs["dedup_keep_best_quality"](spark, SF_DIR)
    dropped = keep.agg(F.sum("n_dropped")).first()[0] or 0
    print(
        f"[2-3] near-dup members: {n_clustered}; dropped by "
        f"keep-best-quality: {dropped}"
    )

    decon = qs["decontaminate_eval_overlap"](spark, SF_DIR)
    n_decon = decon.count()
    print(f"[4] decontamination gate rows (eval-overlap report): {n_decon}")

    mix = qs["mixture_materialize_stats"](spark, SF_DIR)
    sel = mix.agg(
        F.sum("n_docs_selected").alias("docs"),
        F.sum("tokens_selected").alias("tokens"),
    ).first()
    print(
        f"[5] mixture materialization: {sel['docs']} docs / "
        f"{sel['tokens']} tokens selected across {mix.count()} streams"
    )

    pack = qs["sequence_packing_stats"](spark, SF_DIR)
    tot = pack.agg(
        F.sum("n_bins").alias("bins"), F.sum("total_tokens").alias("tokens")
    ).first()
    print(
        f"[6] packing: {tot['tokens']} tokens -> {tot['bins']} "
        f"512-token sequences"
    )
    print(f"pipeline wall: {time.time() - t0:.1f}s at {SF_DIR}")
    spark.stop()


if __name__ == "__main__":
    main()
