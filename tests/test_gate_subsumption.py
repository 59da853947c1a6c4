"""Result-level relations behind every SUBSUMED consolidation
(plans/gate_registry.py): each gate dropped from the driver-facing view
must stay derivable from / contained in its certifying gate's output,
so the two implementations cannot silently drift apart while the driver
keeps certifying one via the other (round-4 verdict #4 / advice)."""

from vbpl_web_crawl_spark.plans.gate_registry import SUBSUMED
from vbpl_web_crawl_spark.plans.queries import get_queries

SF_DIR = "/root/testdata/sf0.001"


def test_subsumed_registry_matches_tests_here():
    """Every SUBSUMED entry has a relation test in this module; adding
    a consolidation without pinning its relation fails loudly."""
    covered = {"ann_cosine_topk", "dedup_minhash_lsh_pairs"}
    assert set(SUBSUMED) == covered, (
        "SUBSUMED changed — add a result-level relation test in "
        "tests/test_gate_subsumption.py for the new entry"
    )


def test_ann_cosine_topk_head_equals_batch_query0(spark):
    """ann_batch_topk's query_id=0 rows (top-3) must equal the first 3
    rows of ann_cosine_topk (top-10, same scorer, same tiebreak)."""
    qs = get_queries()
    single = [
        (r.vec_id, r.cosine)
        for r in qs["ann_cosine_topk"](spark, SF_DIR)
        .orderBy([c for c in ("cosine", "vec_id")][0], ascending=False)
        .collect()
    ]
    # deterministic re-sort: cosine desc, vec_id asc (the query's order)
    single = sorted(single, key=lambda t: (-t[1], t[0]))[:3]
    batch = sorted(
        (
            (r.vec_id, r.cosine)
            for r in qs["ann_batch_topk"](spark, SF_DIR)
            .filter("query_id = 0")
            .collect()
        ),
        key=lambda t: (-t[1], t[0]),
    )
    assert single == batch


def test_minhash_verified_pairs_subset_of_lsh_candidates(spark):
    """Every verified near-dup pair must be an LSH candidate pair (the
    verify stage FILTERS candidates — candidates are the superset)."""
    qs = get_queries()
    verified = {
        (r.doc_a, r.doc_b)
        for r in qs["dedup_minhash_verified_pairs"](spark, SF_DIR).collect()
    }
    candidates = {
        (r.doc_a, r.doc_b)
        for r in qs["dedup_minhash_lsh_pairs"](spark, SF_DIR).collect()
    }
    assert verified, "fixture regression: no verified pairs at sf0.001"
    assert verified <= candidates
