"""Count-min + Misra-Gries heavy hitters with exact verification.

Finding items with frequency >= phi*n at 10^10 distinct keys cannot
afford a full groupBy (the shuffle carries every distinct key). The
sketch route, one pass over the data:

- per partition, a Misra-Gries summary bounded to k = ceil(2/phi)
  counters. If an item has global count >= phi*n, some partition has
  count_p >= phi*rows_p (averaging), and MG with k counters keeps any
  item whose local count exceeds rows_p/k = phi*rows_p/2 — so every
  true hitter SURVIVES in at least one partition summary. Memory is
  O(k) per partition regardless of distinct-key count.
- per partition, a count-min sketch (numpy matrix, Arrow-batched).
  CM is a linear sketch, so partition sketches MERGE by addition; the
  merged point estimate (min over rows) only ever OVERestimates, so
  filtering candidates by estimate >= phi*n drops no true hitter.
- the <= k*partitions surviving candidates go through an exact count
  (broadcast semi-join + groupBy over a tiny key set). The exact
  verify removes every overestimate, so the OUTPUT IS EXACT — which
  is why the DuckDB oracle can be a plain GROUP BY ... HAVING.

Same sketch-then-verify contract as the MinHash pair path
(pipeline_queries.dedup_minhash_verified_pairs): probabilistic pruning
for scale, deterministic verification for the answer.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CM_DEPTH = 4
_CM_WIDTH = 2048
# splitmix64-derived odd multipliers, one per row
_CM_SALTS = (
    0x9E3779B97F4A7C15,
    0xBF58476D1CE4E5B9,
    0x94D049BB133111EB,
    0xD6E8FEB86659FD93,
)


def _cm_rows(keys: np.ndarray) -> np.ndarray:
    """(depth, n) bucket indices for int64 keys (multiply-shift hash)."""
    k = keys.astype(np.uint64)
    idx = np.empty((_CM_DEPTH, len(k)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for d, salt in enumerate(_CM_SALTS):
            h = (k + np.uint64(d + 1)) * np.uint64(salt)
            h ^= h >> np.uint64(33)
            idx[d] = (h % np.uint64(_CM_WIDTH)).astype(np.int64)
    return idx


def _mg_merge(counters: dict[int, int], uniq, cnt, k: int) -> None:
    """Batched Misra-Gries: fold batch counts in, then shrink back to
    k counters by subtracting the (size-k)-th smallest count."""
    for u, c in zip(uniq.tolist(), cnt.tolist()):
        counters[u] = counters.get(u, 0) + c
    if len(counters) > k:
        excess = sorted(counters.values())[len(counters) - k - 1]
        for u in list(counters):
            left = counters[u] - excess
            if left > 0:
                counters[u] = left
            else:
                del counters[u]


def heavy_hitters(df: DataFrame, key: str, phi: float) -> DataFrame:
    """Exact (key, count) rows for items with count >= phi * count(*)."""
    import pandas as pd

    n_total = df.count()
    threshold = phi * n_total
    k = int(np.ceil(2.0 / phi))

    hashed = df.select(F.xxhash64(F.col(key)).alias("__h"), F.col(key).alias("k"))

    def sketch_part(it):
        cm = np.zeros((_CM_DEPTH, _CM_WIDTH), dtype=np.int64)
        mg: dict[int, int] = {}
        for pdf in it:
            keys = pdf["__h"].to_numpy(dtype=np.int64)
            idx = _cm_rows(keys)
            for d in range(_CM_DEPTH):
                np.add.at(cm[d], idx[d], 1)
            uniq, cnt = np.unique(keys, return_counts=True)
            _mg_merge(mg, uniq, cnt, k)
        yield pd.DataFrame(
            {
                "sketch": [cm.tobytes()],
                "cands": [np.array(sorted(mg), dtype=np.int64).tobytes()],
            }
        )

    parts = hashed.mapInPandas(sketch_part, "sketch binary, cands binary").collect()
    cm = np.zeros((_CM_DEPTH, _CM_WIDTH), dtype=np.int64)
    cand_set: set[int] = set()
    for r in parts:
        cm += np.frombuffer(bytes(r.sketch), dtype=np.int64).reshape(
            _CM_DEPTH, _CM_WIDTH
        )
        cand_set.update(np.frombuffer(bytes(r.cands), dtype=np.int64).tolist())
    if cand_set:
        cand = np.array(sorted(cand_set), dtype=np.int64)
        idx = _cm_rows(cand)  # (depth, m)
        est = cm[np.arange(_CM_DEPTH)[:, None], idx].min(axis=0)
        survivors = cand[est >= threshold].tolist()
    else:
        survivors = []
    spark = df.sparkSession
    cand_df = spark.createDataFrame(
        [(int(h),) for h in survivors] or [(None,)], "cand_h long"
    ).filter(F.col("cand_h").isNotNull())
    # exact verify over the candidate set only
    return (
        hashed.join(F.broadcast(cand_df), F.col("__h") == F.col("cand_h"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(threshold))
        .select(F.col("k").alias(key), "cnt")
    )
