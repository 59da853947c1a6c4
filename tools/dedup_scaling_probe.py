"""Dedup growth probe: measure candidate-pair counts and wall times of
the capped dedup paths at 1x / 3x / 10x the sf0.1 corpus size, turning
the "O(docs * cap), never all-pairs" claims into measured curves
(recorded in BENCH.md).

Generates deterministic documents tables (sources/textgen.py — fixed
near-dup and boilerplate composition at every n) under /tmp, runs each
registered dedup query against them, and prints one JSON line per
(n, query) plus a growth summary. A query is LINEAR-SAFE when its pair
count grows at most proportionally with n (slack 1.5x) between the
smallest and largest corpus.

    python tools/dedup_scaling_probe.py [--sizes 5000,15000,50000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",  # pre-verify candidates
    "dedup_minhash_verified_pairs",
    "dedup_simhash_hamming_pairs",
    "dedup_winnowing_pairs",
    # exact path: final pair count is the TRUE near-dup count (planted
    # pairs), so linear growth here certifies the corpus composition;
    # the prefix/positional pruning claim is certified separately by
    # the candidate probe below
    "dedup_ppjoin_exact_pairs",
    # dedup_incremental_pairs is NOT probed here: textgen's planted
    # near-dup pairs are (5k, 5k+4), which always fall in the SAME
    # doc_id % 4 ingest class, so the cross-split pair count is 0 by
    # lattice interaction (the driver corpus has no such id structure —
    # 6 / 75 cross pairs at sf0.01 / sf0.1). Its shuffle machinery is
    # the shared capped-shingle + banded-signature path the
    # minhash_verified curve above certifies.
]


def main() -> int:
    sizes = [5000, 15000, 50000]
    args = sys.argv[1:]
    if args and args[0] == "--sizes":
        sizes = [int(s) for s in args[1].split(",")]

    from vbpl_web_crawl_spark.plans.queries import get_queries
    from vbpl_web_crawl_spark.session import get_spark
    from vbpl_web_crawl_spark.sources.textgen import synth_documents

    from vbpl_web_crawl_spark.plans.pipeline_queries import capped_shingles
    from vbpl_web_crawl_spark.plans.pipeline_queries8 import ppjoin_candidates

    spark = get_spark("dedup_scaling_probe", cpus=16)
    qs = get_queries()
    probes = QUERIES + ["ppjoin_candidates"]
    results: dict[str, dict[int, dict]] = {q: {} for q in probes}
    for n in sizes:
        sf_dir = f"/tmp/dedup_scale/n{n}"
        path = os.path.join(sf_dir, "documents.parquet")
        if not os.path.exists(path):
            synth_documents(spark, n).write.mode("overwrite").parquet(path)
        for q in probes:
            t0 = time.time()
            if q == "ppjoin_candidates":
                # pre-verify candidate volume — the prefix+positional
                # pruning boundedness claim, measured
                docs = spark.read.parquet(path)
                rows = ppjoin_candidates(
                    capped_shingles(docs, df_cap=1 << 62)
                ).count()
            else:
                rows = qs[q](spark, sf_dir).count()
            wall = time.time() - t0
            rec = {"n": n, "query": q, "pairs": rows, "wall_s": round(wall, 2)}
            results[q][n] = rec
            print(json.dumps(rec), flush=True)

    lo, hi = min(sizes), max(sizes)
    scale = hi / lo
    ok = True
    for q in probes:
        p_lo, p_hi = results[q][lo]["pairs"], results[q][hi]["pairs"]
        growth = (p_hi / p_lo) if p_lo else float("inf")
        linear_safe = p_hi == 0 or growth <= 1.5 * scale
        ok &= linear_safe
        print(
            json.dumps(
                {
                    "query": q,
                    "pairs_growth": round(growth, 2),
                    "n_growth": scale,
                    "linear_safe": linear_safe,
                }
            ),
            flush=True,
        )
    shutil.rmtree("/tmp/dedup_scale", ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
