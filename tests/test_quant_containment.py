"""Semantic invariants for the part-15 gates: asymmetric containment
vs a naive per-doc set reference, MinHash estimator error bounds, and
int8 quantization fidelity floor + exactness on a constructed frame."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.pipeline_queries import capped_shingles
from vbpl_web_crawl_spark.plans.pipeline_queries15 import (
    q_containment_pairs,
    q_embedding_int8_quant_error,
    q_minhash_estimate_error,
)
from vbpl_web_crawl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_containment_matches_naive_sets(spark):
    """The gate's ordered pairs equal brute-force set containment over
    the same capped shingle sets."""
    sh = capped_shingles(load_table(spark, SF, "documents")).collect()
    sets: dict[int, set] = {}
    for r in sh:
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    expect = set()
    docs = sorted(sets)
    for a in docs:
        for b in docs:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a]) >= 0.8:
                expect.add((a, b, round(inter / len(sets[a]), 4)))
    got = {
        (r.doc_a, r.doc_b, r.containment)
        for r in q_containment_pairs(spark, SF).collect()
    }
    assert got == expect
    assert expect, "fixture corpus must contain contained pairs"


def test_containment_is_asymmetric_on_excerpt(spark, tmp_path):
    """A strict excerpt (section page carved out of a fulltext parent,
    the reference's toan_van shape) is contained one way only — the
    whole point vs Jaccard, which scores this pair well below any
    useful near-dup threshold."""
    parent = " ".join(f"w{i} w{i + 1} clause{i % 7}" for i in range(60))
    excerpt = " ".join(parent.split()[:30])  # first 10 shingle-windows
    other = " ".join(f"z{i} z{i + 1} item{i % 5}" for i in range(40))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [parent, excerpt, other],
            "lang": ["vi"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(parent), len(excerpt), len(other)],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = q_containment_pairs(spark, str(tmp_path)).collect()
    keys = {(r.doc_a, r.doc_b) for r in rows}
    assert (2, 1) in keys  # excerpt contained in parent
    assert (1, 2) not in keys  # parent NOT contained in excerpt
    for r in rows:
        if (r.doc_b, r.doc_a) not in keys:
            assert r.n_sh_a <= r.n_sh_b


def test_minhash_estimate_error_bounds(spark):
    """Estimates are k-quantized in [0,1]; the high-decile bucket (the
    near-dups the LSH exists to find) must have small mean error; and
    every avg_est is within max_abs_err of avg_exact."""
    rows = q_minhash_estimate_error(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.avg_est <= 1.0
        assert 0.0 <= r.avg_exact <= 1.0
        assert r.mean_abs_err <= r.max_abs_err + 1e-9
        assert abs(r.avg_est - r.avg_exact) <= r.max_abs_err + 1e-9
    hi = [r for r in rows if r.j_decile == 9]
    assert hi and hi[0].mean_abs_err <= 0.2  # k=8 -> sd ~ J(1-J)/sqrt(8)


def test_quant_error_exact_on_constructed_vectors(spark, tmp_path):
    """On a hand-built frame the scales, clamping and cosine are
    exactly predictable: vectors along coordinate axes quantize
    losslessly (cos_sim == 1), and a vector at half-scale has the
    expected floor(x/scale + .5) rounding error."""
    pdf = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "embedding": [
                np.array([1.27, 0.0], dtype=np.float32),
                np.array([0.0, 1.27], dtype=np.float32),
                np.array([0.635, 0.635], dtype=np.float32),  # x/scale = 63.5
            ],
            "label": [0, 0, 1],
        }
    )
    df = spark.createDataFrame(pdf)
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r.label: r
        for r in q_embedding_int8_quant_error(spark, str(tmp_path)).collect()
    }
    # scale per dim = 1.27/127 = 0.01; axis vectors land exactly on a
    # quantization level -> perfect cosine
    assert out[0].n_vecs == 2
    assert out[0].avg_cos_sim == 1.0
    assert out[0].avg_linf_err == 0.0
    # 0.635/0.01 = 63.5 -> floor(64.0) = 64 -> xq = 0.64; err = 0.005;
    # direction is preserved (both dims identical) -> cosine still 1
    assert out[1].n_vecs == 1
    assert out[1].avg_cos_sim == 1.0
    assert abs(out[1].avg_linf_err - 0.005) < 1e-9


def test_quant_fidelity_floor_on_corpus(spark):
    """Real-corpus fidelity: int8 must keep cosine >= 0.999 on every
    label (64-dim, well-conditioned embeddings) — the go/no-go a
    deployment checks before switching ANN to the quantized store."""
    rows = q_embedding_int8_quant_error(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.min_cos_sim >= 0.999
        assert r.avg_linf_err <= 0.02


def test_ann_ivf_recall_bounds_and_full_probe_identity(spark):
    """recall in [0,1] with exact count arithmetic, and the brute
    side is self-consistent: probing ALL lists twice must give
    recall 1.0 by construction."""
    from vbpl_web_crawl_spark.operators.ann import assign_to_centroids, ivf_search
    from vbpl_web_crawl_spark.plans.pipeline_queries import _IVF_K, _ivf_centroid
    from vbpl_web_crawl_spark.plans.pipeline_queries15 import q_ann_ivf_recall

    row = q_ann_ivf_recall(spark, SF).collect()[0]
    assert row.k == 10 and 0 <= row.n_overlap <= 10
    assert abs(row.recall_at_10 - row.n_overlap / 10.0) < 1e-9
    assert row.recall_at_10 >= 0.5  # hash-grid IVF at probe=6/16

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    cents = spark.createDataFrame(
        [(c, [float(v) for v in _ivf_centroid(c)]) for c in range(_IVF_K)],
        "cid int, centroid array<double>",
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    assigned = assign_to_centroids(emb.filter(F.col("vec_id") != 0), cents)
    full = ivf_search(assigned, cents, qv, n_probe=_IVF_K, topk=10).select("vec_id")
    again = ivf_search(assigned, cents, qv, n_probe=_IVF_K, topk=10).select("vec_id")
    assert full.join(again, "vec_id").count() == 10


def test_mean_pool_is_unit_norm_and_matches_numpy(spark):
    """Per label: sum of squared pooled_norm components == 1 (up to
    the 4-decimal rounding), and the unrounded pooled mean matches a
    numpy reference."""
    from vbpl_web_crawl_spark.plans.pipeline_queries15 import q_embedding_mean_pool

    rows = q_embedding_mean_pool(spark, SF).collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    emb = load_table(spark, SF, "embeddings").toPandas()
    for label, rs in by_label.items():
        assert len(rs) == 64
        sq = sum(r.pooled_norm**2 for r in rs)
        assert abs(sq - 1.0) < 1e-2  # rounding at 4 decimals x 64 dims
        sub = np.stack(emb[emb.label == label].embedding.values).astype(float)
        m = sub.mean(axis=0)
        ref = m / np.sqrt((m * m).sum())
        got = np.array([r.pooled_norm for r in sorted(rs, key=lambda r: r.dim)])
        assert np.abs(got - ref).max() < 5e-5  # 4-decimal rounding only
        assert all(r.n_vecs == len(sub) for r in rs)
