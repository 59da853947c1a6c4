"""Focused tests for round-6 optimization internals:

- ``spread``: no-op on already-parallel frames, value-neutral otherwise;
- semantic-dedup numpy pair kernel == the Catalyst HOF formulation
  (bit-identical cosine threshold decisions on random float32 vectors);
- sssp chunked relaxation: max_rounds still counts RELAXATIONS exactly
  (converges at max_rounds == hop radius, raises one below).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.sources.tables import spread


def test_spread_noop_when_already_parallel(spark):
    df = spark.range(0, 1000, 1, 64)  # 64 partitions >= defaultParallelism
    out = spread(df, "id")
    assert out is df  # no exchange added on an already-parallel frame


def test_spread_rebalances_and_preserves_values(spark):
    df = spark.range(0, 5000, 1, 1).withColumn("v", F.col("id") * 2)
    par = spark.sparkContext.defaultParallelism
    keyed = spread(df, "id")
    assert keyed.rdd.getNumPartitions() >= par
    assert sorted(r.v for r in keyed.collect()) == sorted(
        r.v for r in df.collect()
    )
    keyless = spread(df)
    assert keyless.rdd.getNumPartitions() >= par
    assert keyless.count() == 5000


def test_semantic_kernel_matches_catalyst_pairs(spark):
    """The applyInPandas pair kernel in semantic_dedup_keep_one must drop
    exactly the vectors the Catalyst HOF cid-join formulation drops."""
    import random

    import numpy as np
    import pandas as pd

    random.seed(7)
    rows = []
    for vid in range(120):
        vec = [random.uniform(-1, 1) for _ in range(16)]
        rows.append((vid % 4, vid, [float(np.float32(v)) for v in vec]))
    emb = spark.createDataFrame(
        rows, "cid int, vec_id long, embedding array<float>"
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    tau = 0.40
    assigned = emb.withColumn(
        "nrm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    ).localCheckpoint(eager=True)

    # reference: the pre-round Catalyst formulation
    a = assigned.select(
        "cid", F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"), F.col("nrm").alias("na"),
    )
    b = assigned.select(
        "cid", F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"), F.col("nrm").alias("nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    want = sorted(
        (r.cid, r.vec_id)
        for r in a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= tau)
        .select("cid", F.col("id_b").alias("vec_id"))
        .distinct()
        .collect()
    )

    # kernel under test (same code shape as pipeline_queries2)
    def _cluster_dropped(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)[order]
        A = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        )[order]
        n = len(ids)
        dropped = np.zeros(n, dtype=bool)
        blk = 7  # tiny block size on purpose: exercise block boundaries
        i_idx = np.arange(n)
        for j0 in range(1, n, blk):
            j1 = min(n, j0 + blk)
            acc = np.zeros((n, j1 - j0))
            for d in range(A.shape[1]):
                acc = acc + np.multiply.outer(A[:, d], A[j0:j1, d])
            c = acc / np.multiply.outer(nrm, nrm[j0:j1])
            ok = (c >= tau) | np.isnan(c)
            ok &= i_idx[:, None] < np.arange(j0, j1)[None, :]
            dropped[j0:j1] |= ok.any(axis=0)
        k = int(dropped.sum())
        return pd.DataFrame(
            {
                "cid": np.full(k, pdf["cid"].iloc[0], dtype=np.int32),
                "vec_id": ids[dropped].astype(np.int64),
            }
        )

    got = sorted(
        (r.cid, r.vec_id)
        for r in assigned.select("cid", "vec_id", "embedding", "nrm")
        .groupBy("cid")
        .applyInPandas(_cluster_dropped, "cid int, vec_id long")
        .collect()
    )
    assert got == want


def _path_edges(spark, n):
    # directed path 0 -> 1 -> ... -> n-1, weight 1
    return spark.createDataFrame(
        [(i, i + 1, 1) for i in range(n - 1)], "src long, dst long, w long"
    )


def test_sssp_chunked_max_rounds_is_exact(spark):
    """CHUNK-ed materialization must not change how many relaxations
    max_rounds buys: a 3-hop path needs exactly 3 relaxations (+1 empty
    round to detect the fixpoint), so max_rounds=4 converges and
    max_rounds=3 raises — independent of the chunk size."""
    from vbpl_web_crawl_spark.operators.graph import sssp

    edges = _path_edges(spark, 4)
    seeds = spark.createDataFrame([(0,)], "node long")
    out = sssp(edges, seeds, max_rounds=4)
    assert {(r.node, r.dist) for r in out.collect()} == {
        (0, 0), (1, 1), (2, 2), (3, 3),
    }
    with pytest.raises(RuntimeError):
        sssp(edges, seeds, max_rounds=3)


def test_global_sequence_lying_approx_rows_raises(spark):
    """VERDICT r05 #7: a stale approx_rows claiming the small-window
    path on a large input must raise, not silently single-partition."""
    from vbpl_web_crawl_spark.operators.sequence import (
        SMALL_INPUT_THRESHOLD,
        global_sequence,
    )

    big = spark.range(0, 2 * SMALL_INPUT_THRESHOLD + 10)
    with pytest.raises(ValueError, match="refusing to serialize"):
        global_sequence(big, ["id"], approx_rows=10)

    # honest small claim still works and is value-correct
    small = spark.range(0, 50, 1, 4)
    out = global_sequence(small, ["id"], approx_rows=50)
    rows = sorted((r.id, r.seq) for r in out.collect())
    assert rows == [(i, i) for i in range(50)]
