"""IVF ANN (operators/ann.py): recall vs brute force, probe-list
candidate bound, assignment determinism."""

from pyspark.sql import functions as F

from vbpl_web_crawl_spark.operators.ann import assign_to_centroids, ivf_search, kmeans_fit
from vbpl_web_crawl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF, "embeddings").select("vec_id", "embedding")


def _brute_topk(spark, emb, qv, k=10):
    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    j = emb.crossJoin(F.broadcast(qv))
    cos = dot(F.col("embedding"), F.col("qv")) / (
        F.sqrt(dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(dot(F.col("qv"), F.col("qv")))
    )
    return [
        r.vec_id
        for r in j.select("vec_id", cos.alias("c"))
        .orderBy(F.desc("c"), F.asc("vec_id"))
        .limit(k)
        .collect()
    ]


def test_ivf_recall_and_candidate_bound(spark):
    emb = _emb(spark)
    n = emb.count()
    cents = kmeans_fit(emb, k=16, iters=3)
    assert cents.count() == 16
    assigned = assign_to_centroids(emb, cents).persist()
    assert assigned.count() == n  # every vector lands in exactly one list

    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    emb_no_q = emb.filter(F.col("vec_id") != 0)
    assigned_no_q = assigned.filter(F.col("vec_id") != 0)
    truth = set(_brute_topk(spark, emb_no_q, qv, 10))

    got = [
        r.vec_id for r in ivf_search(assigned_no_q, cents, qv, n_probe=6, topk=10).collect()
    ]
    recall = len(truth & set(got)) / len(truth)
    assert recall >= 0.7, (recall, got)

    # the probe filter really bounds the scan: candidates < corpus
    probe6 = assigned_no_q.join(
        F.broadcast(
            cents.crossJoin(F.broadcast(qv))
            .select("cid")
            .limit(6)
        ),
        "cid",
    )
    assert probe6.count() < n
    assigned.unpersist()


def test_assignment_deterministic(spark):
    emb = _emb(spark)
    cents = kmeans_fit(emb, k=8, iters=2)
    a = {r.vec_id: r.cid for r in assign_to_centroids(emb, cents).collect()}
    b = {r.vec_id: r.cid for r in assign_to_centroids(emb, cents).collect()}
    assert a == b


def test_empty_input_raises(spark):
    """Round-3 ADVICE: an empty embeddings table must raise a clear
    ValueError, not IndexError deep in seeding."""
    import pytest

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        kmeans_fit(empty, k=4)


def test_fewer_vectors_than_k_clamps_without_duplicates(spark):
    """n < k must clamp k to the distinct-vector count instead of
    seeding duplicate centroids (round-3 ADVICE: the m==1 path used to
    bypass the degenerate-corpus check)."""
    rows = [(i, [float(i), float(i % 2), 1.0]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(emb, k=8, iters=2).collect()
    assert len(cents) == 3
    seen = {tuple(r.centroid) for r in cents}
    assert len(seen) == 3, "duplicate centroids from degenerate corpus"
