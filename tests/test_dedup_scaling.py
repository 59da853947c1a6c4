"""Dedup growth property: with the DF caps in place, candidate-pair
counts of every capped dedup path grow at most LINEARLY with corpus
size on a composition-stable synthetic corpus (fixed near-dup and
boilerplate rates; sources/textgen.py). Before the minhash shingle cap
this caught 8.2x pair growth on 4x docs (boilerplate minima flooding
one band bucket). The full 1x/3x/10x curves live in BENCH.md via
tools/dedup_scaling_probe.py; this test runs a fast 4x step."""

import pytest

from vbpl_web_crawl_spark.plans.queries import get_queries
from vbpl_web_crawl_spark.sources.textgen import synth_documents

PATHS = [
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_verified_pairs",
    "dedup_simhash_hamming_pairs",
    "dedup_winnowing_pairs",
]


@pytest.fixture(scope="module")
def corpora(spark, tmp_path_factory):
    dirs = {}
    for n in (500, 2000):
        d = str(tmp_path_factory.mktemp(f"scale{n}"))
        synth_documents(spark, n).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        dirs[n] = d
    return dirs


@pytest.mark.parametrize("name", PATHS)
def test_pairs_grow_at_most_linearly(spark, corpora, name):
    qs = get_queries()
    lo = qs[name](spark, corpora[500]).count()
    hi = qs[name](spark, corpora[2000]).count()
    assert lo > 0, "probe corpus must produce pairs at the small size"
    assert hi <= 1.5 * (2000 / 500) * lo, (
        f"{name}: {lo} pairs at n=500 -> {hi} at n=2000 (superlinear)"
    )
