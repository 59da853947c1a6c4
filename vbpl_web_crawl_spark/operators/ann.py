"""IVF (inverted-file) approximate nearest neighbor — the clustered
scale path for similarity search, complementing the sign-LSH buckets in
plans/pipeline_queries.py.

Shape at 100 TB: k-means runs on a sample (centroids are tiny and
broadcast everywhere); every vector is assigned to its nearest centroid
ONCE at ingest (one broadcast join, no shuffle of the embedding table
beyond its write); a query probes the n_probe nearest centroid lists
only — candidate count is n_probe/k of the corpus instead of all of it,
and each list is a partition-prunable predicate on the assignment
column. All math is DataFrame expressions (zip_with/aggregate) — no
Python in the per-vector path; only the k centroids cross the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cosine(x, y):
    return _dot(x, y) / (F.sqrt(_dot(x, x)) * F.sqrt(_dot(y, y)))


def assign_to_centroids(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding) x (cid, centroid) -> nearest-centroid
    assignment. Centroids broadcast; argmin via min(struct(-cos, cid))
    so ties break deterministically toward the smaller cid."""
    j = emb.crossJoin(F.broadcast(centroids))
    scored = j.select(
        "vec_id",
        F.struct(
            (-_cosine(F.col("embedding"), F.col("centroid"))).alias("negcos"),
            F.col("cid").alias("cid"),
        ).alias("cand"),
    )
    best = scored.groupBy("vec_id").agg(F.min("cand").alias("best"))
    return emb.join(best, "vec_id").select(
        "vec_id", "embedding", F.col("best.cid").alias("cid")
    )


def _farthest_point_seeds(sample: DataFrame, k: int) -> DataFrame:
    """Deterministic k-center greedy init: seed 0 = smallest vec_id
    hash (a deterministic 'random' draw); seed i = the sample vector
    farthest (max 1 - cos) from its nearest already-chosen seed, ties
    to the smaller vec_id. Spreads seeds across the data instead of
    correlating them, which fixed-low-id seeding does when low ids
    cluster. Each step is one small job on the bounded sample and only
    single centroid rows ever cross the driver."""
    first = (
        sample.orderBy(F.xxhash64("vec_id").asc(), F.col("vec_id").asc())
        .limit(1)
        .select("embedding")
        .collect()[0][0]
    )
    chosen = [[float(v) for v in first]]
    for _ in range(1, k):
        cos_to = [
            _cosine(F.col("embedding"), F.array(*[F.lit(v) for v in c])) for c in chosen
        ]
        nearest = cos_to[0] if len(cos_to) == 1 else F.greatest(*cos_to)
        row = (
            sample.select("vec_id", "embedding", nearest.alias("mc"))
            .orderBy(F.asc("mc"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        chosen.append([float(v) for v in row.embedding])
    spark = sample.sparkSession
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(chosen)], "cid int, centroid array<double>"
    )


def kmeans_fit(
    emb: DataFrame, k: int = 16, iters: int = 4, sample_per_centroid: int = 256
) -> DataFrame:
    """Deterministic k-means over (vec_id, embedding), fit on a
    deterministic hash-sample: rows with pmod(xxhash64(vec_id), m) == 0,
    m sized so the sample holds ~k * sample_per_centroid vectors — Lloyd
    never scans the full corpus, which at 10^10 vectors is the
    difference between a bounded fit job and iters full-table passes.
    Init = deterministic farthest-point (k-center greedy) on the sample.
    Assign the full corpus once afterwards via assign_to_centroids.
    Returns (cid, centroid)."""
    n = emb.count()
    m = max(1, n // max(k * sample_per_centroid, 1))
    sample = emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(m)) == 0) if m > 1 else emb
    if m > 1 and sample.count() < k:  # degenerate corpus; fit on all rows
        sample = emb
    cents = _farthest_point_seeds(sample, k)
    for _ in range(iters):
        assigned = assign_to_centroids(sample, cents)
        cents = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("dims")
            )
            .select(
                "cid",
                F.transform(F.col("dims"), lambda s: s.getField("m")).alias("centroid"),
            )
        )
    return cents


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    query_vec: DataFrame,
    n_probe: int = 4,
    topk: int = 10,
) -> DataFrame:
    """Top-k by cosine among vectors whose centroid is one of the
    query's n_probe nearest centroids. ``assigned`` = output of
    assign_to_centroids; ``query_vec`` = single-row (qv array) frame.
    The probe-list filter is the IVF win: only n_probe/k of the corpus
    is scanned, and on a table partitioned by cid it prunes files."""
    probe = (
        centroids.crossJoin(F.broadcast(query_vec))
        .select("cid", _cosine(F.col("centroid"), F.col("qv")).alias("ccos"))
        .orderBy(F.desc("ccos"), F.asc("cid"))
        .limit(n_probe)
        .select("cid")
    )
    cand = assigned.join(F.broadcast(probe), "cid")
    scored = cand.crossJoin(F.broadcast(query_vec)).select(
        "vec_id",
        "cid",
        _cosine(F.col("embedding"), F.col("qv")).alias("cos_raw"),
    )
    return (
        scored.orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(topk)
        .select("vec_id", "cid", F.round("cos_raw", 4).alias("cosine"))
    )
