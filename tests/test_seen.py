"""Seen-set operator invariants: exactly one sketch row per partition
across any sequence of add/delete/delta operations (the cogroup emits
one row per partition present on either side — a regression here grows
the checkpointed sketch table every round), and filter_unseen equality
with a plain set."""

from vbpl_web_crawl_spark.operators import seen as SEEN

N_PARTS = 4


def _hashes(spark, values):
    return spark.createDataFrame([(int(v),) for v in values], "url_hash long")


def _empty_seen(spark):
    return spark.createDataFrame([], "url_hash long, partition_id int")


def test_sketch_row_count_invariant_across_rounds(spark):
    """Partitions untouched by a round must not gain duplicate rows."""
    sketches = SEEN.empty_sketches(spark, N_PARTS, 1 << 12, 1 << 8)
    seen = _empty_seen(spark)
    # round 1: keys landing in partitions 0 and 1 only (hash % 4)
    seen, sketches = SEEN.add_to_seen(_hashes(spark, [0, 4, 1]), seen, sketches, N_PARTS)
    assert sketches.count() == N_PARTS
    # round 2: touch partition 2 only — 0/1/3 are cold this round
    seen, sketches = SEEN.add_to_seen(_hashes(spark, [2, 6]), seen, sketches, N_PARTS)
    assert sketches.count() == N_PARTS
    # round 3: combined delete+add delta touching partition 0
    sketches = SEEN.apply_sketch_delta(
        _hashes(spark, [8]), _hashes(spark, [0]), sketches, N_PARTS
    )
    assert sketches.count() == N_PARTS
    # round 4: delete only
    seen, sketches = SEEN.delete_from_seen(_hashes(spark, [1]), seen, sketches, N_PARTS)
    assert sketches.count() == N_PARTS
    # and every partition id appears exactly once
    ids = [r.partition_id for r in sketches.select("partition_id").collect()]
    assert sorted(ids) == list(range(N_PARTS))


def test_sketch_bytes_stable_when_untouched(spark):
    """A cold partition's sketch bytes are byte-identical after a round
    that does not touch it."""
    sketches = SEEN.empty_sketches(spark, N_PARTS, 1 << 12, 1 << 8)
    seen = _empty_seen(spark)
    seen, sketches = SEEN.add_to_seen(_hashes(spark, [3, 7]), seen, sketches, N_PARTS)
    before = {r.partition_id: bytes(r.bloom_bytes) for r in sketches.collect()}
    # next round touches only partition 1
    seen, sketches = SEEN.add_to_seen(_hashes(spark, [5]), seen, sketches, N_PARTS)
    after = {r.partition_id: bytes(r.bloom_bytes) for r in sketches.collect()}
    for pid in (0, 2, 3):
        assert before[pid] == after[pid], pid


def test_filter_unseen_matches_plain_set(spark):
    sketches = SEEN.empty_sketches(spark, N_PARTS, 1 << 12, 1 << 8)
    seen = _empty_seen(spark)
    seen_keys = list(range(0, 40, 2))
    seen, sketches = SEEN.add_to_seen(_hashes(spark, seen_keys), seen, sketches, N_PARTS)
    cand = _hashes(spark, range(40))
    caches: list = []
    out = SEEN.filter_unseen(cand, seen, sketches, N_PARTS, caches=caches)
    got = sorted(r.url_hash for r in out.collect())
    assert got == sorted(set(range(40)) - set(seen_keys))
    for c in caches:
        c.unpersist()
    assert len(caches) == 1  # the cogrouped frame was handed back


def test_delete_then_filter_readmits(spark):
    sketches = SEEN.empty_sketches(spark, N_PARTS, 1 << 12, 1 << 8)
    seen = _empty_seen(spark)
    seen, sketches = SEEN.add_to_seen(_hashes(spark, [10, 11]), seen, sketches, N_PARTS)
    seen, sketches = SEEN.delete_from_seen(_hashes(spark, [10]), seen, sketches, N_PARTS)
    out = SEEN.filter_unseen(_hashes(spark, [10, 11]), seen, sketches, N_PARTS)
    assert [r.url_hash for r in out.collect()] == [10]
    assert sketches.count() == N_PARTS
