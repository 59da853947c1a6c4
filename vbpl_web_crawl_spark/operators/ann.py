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

from pyspark.sql import DataFrame, Window
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


def kmeans_fit(emb: DataFrame, k: int = 16, iters: int = 4) -> DataFrame:
    """Deterministic-init k-means over (vec_id, embedding): centroids
    seeded from the k smallest vec_ids, ``iters`` Lloyd steps as
    DataFrame jobs (assign = broadcast join; update = posexplode +
    per-dimension avg). Returns (cid, centroid)."""
    w = Window.orderBy("vec_id")
    cents = (
        emb.orderBy("vec_id")
        .limit(k)
        .select((F.row_number().over(w) - 1).alias("cid"), F.col("embedding").alias("centroid"))
    )
    for _ in range(iters):
        assigned = assign_to_centroids(emb, cents)
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
