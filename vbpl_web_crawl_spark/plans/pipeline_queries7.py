"""Round-5 continuation queries, part 7: bucketed co-located joins
(the write-once/join-forever layout strategy) and weighted
single-source shortest paths (politeness-cost click distance).

Reference parity: the reference joins document<->section<->attachment
rows repeatedly against one Postgres B-tree
(/root/reference/app/model/*.py); bucketing is the distributed
equivalent — pay one clustered write, then every later equi-join on
the bucket key runs with ZERO Exchange. The SSSP gate generalizes the
reference's breadth-first crawl order to weighted hops: with per-hop
weight = a host's politeness cost, dist is the cheapest click-path
cost from the seed index to each page, the ranking a budget-bounded
focused crawl uses (w=1 degenerates to crawl_depth_bfs).

Scale notes (100 TB): the bucketed join moves NO fact bytes at query
time (plan-asserted Exchange-free in tests/test_bucketed_join.py);
revenue is exact int64 cents*bp arithmetic so both engines agree
bit-for-bit regardless of aggregation order. SSSP is one equi-join +
one min-agg per relaxation round on 8-byte keys
(operators/graph.py::sssp), rounds = hop radius (small for web-shaped
graphs), convergence detected from a monotone (count, sum) signature
— one tiny aggregate per round, no change-detection join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Bucketed co-located join: orders x lineitem per-priority revenue.
# Both sides are materialized ONCE as parquet datasource tables
# hash-bucketed (and sorted) on the order key with the same bucket
# count, so the join itself is Exchange-free; only the 5-row priority
# rollup shuffles. Revenue in exact integer units (cents x discount
# basis points) — no float accumulation on the compare path.
# ---------------------------------------------------------------------------

_BUCKETS = 8

_REV_E4_SPARK = (
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
)


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")


def bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """(Re)write the projected orders/lineitem pair as co-bucketed
    tables for ``sf_dir`` and return their names. Always overwrites —
    readers never see buckets stale against the parquet input.

    Bucket count: ``max(_BUCKETS, defaultParallelism)`` — the layout
    rule in operators/bucketing.py ("choose for the TARGET scale:
    buckets ~ total cores x small constant"); at 8 the write AND every
    later co-located join were capped at 8-way on a 32-core session.
    The rollup values are layout-independent (oracle unchanged)."""
    from vbpl_web_crawl_spark.operators.bucketing import write_bucketed

    buckets = max(_BUCKETS, spark.sparkContext.defaultParallelism)
    tag = _sf_tag(sf_dir)
    ot, lt = f"bkt{buckets}_orders_{tag}", f"bkt{buckets}_lineitem_{tag}"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr(_REV_E4_SPARK).alias("rev_e4")
    )
    write_bucketed(o, ot, buckets, "o_orderkey")
    write_bucketed(li, lt, buckets, "l_orderkey")
    return ot, lt


@_register(
    "bucketed_colocated_join_revenue",
    """
SELECT o.o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_e4
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY priority
ORDER BY priority
""",
)
def q_bucketed_colocated_join_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-priority item count + exact integer revenue via the
    co-bucketed orders/lineitem pair; the join reads bucket i against
    bucket i with no Exchange (layout certified by
    tests/test_bucketed_join.py; results here certified against the
    layout-independent oracle)."""
    from vbpl_web_crawl_spark.operators.bucketing import colocated_join

    ot, lt = bucketed_pair(spark, sf_dir)
    joined = colocated_join(spark, ot, lt, "o_orderkey", "l_orderkey")
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev_e4").cast("long").alias("revenue_e4"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Weighted SSSP over the part co-purchase graph (same graph as the
# triangle / k-core gates), weight = (u + v) % 7 + 1 (symmetric by
# construction), seeds = the smallest part id in the edge set. The
# oracle unrolls _SSSP_UNROLL relaxation levels as MATERIALIZED CTEs;
# relaxing a fixpoint is the identity, so any unroll >= the true hop
# radius reproduces the converged distances bit-for-bit while the
# engine loop stops on its (count, sum) signature (and RAISES if
# max_rounds exhausts first).
# ---------------------------------------------------------------------------

_SSSP_UNROLL = 10


def _sssp_oracle() -> str:
    ctes = [
        """e0 AS MATERIALIZED (
  WITH pe AS (
    SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l1
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey)
  SELECT a AS u, b AS v, (a + b) % 7 + 1 AS w FROM pe
  UNION ALL
  SELECT b, a, (a + b) % 7 + 1 FROM pe
)""",
        """d0 AS MATERIALIZED (
  SELECT min(u) AS node, CAST(0 AS BIGINT) AS dist FROM e0
)""",
    ]
    for i in range(1, _SSSP_UNROLL + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT e.v AS node, d.dist + e.w AS dist
    FROM d{i - 1} d JOIN e0 e ON d.node = e.u
  ) GROUP BY node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT dist,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(node) AS BIGINT) AS sum_node,
       min(node) AS min_node,
       max(node) AS max_node
FROM d{_SSSP_UNROLL}
GROUP BY dist
ORDER BY dist
"""
    )


@_register("sssp_copurchase_cost", _sssp_oracle())
def q_sssp_copurchase_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of cheapest click-path costs from the min-id seed over
    the weighted co-purchase graph (operators/graph.py::sssp)."""
    from vbpl_web_crawl_spark.operators.graph import sssp

    # Pair generation WITHOUT a self-join: collect each order's part
    # set once (one shuffle on the 8-byte order key, map-side partial
    # collect_set), then emit the a<b combinations narrow via
    # posexplode + slice over the sorted array. Group sizes are
    # bounded by items-per-order (~7 at any TPC-H scale), so the
    # per-row array work is O(k^2) with tiny k — no 2x scan + equi-join
    # shuffle of the full lineitem table as the join formulation needs.
    # Cross-order duplicate pairs are NOT deduped here; sssp()'s own
    # (u, v) min-agg collapses them in the same shuffle it already
    # pays for parallel-edge dedup (one fewer exchange).
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    parts = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pe = parts.select(F.posexplode("ps").alias("i", "a"), "ps").select(
        "a",
        F.explode(F.slice(F.col("ps"), F.col("i") + 2, F.size("ps"))).alias("b"),
    )
    edges = pe.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a").alias("u"),
                    F.col("b").alias("v"),
                    ((F.col("a") + F.col("b")) % 7 + 1).alias("w"),
                ),
                F.struct(
                    F.col("b").alias("u"),
                    F.col("a").alias("v"),
                    ((F.col("a") + F.col("b")) % 7 + 1).alias("w"),
                ),
            )
        ).alias("e")
    ).select("e.u", "e.v", "e.w")
    seeds = edges.agg(F.min("u").alias("node"))
    dist = sssp(edges, seeds, src="u", dst="v", weight="w")
    return (
        dist.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").cast("long").alias("sum_node"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("dist")
    )
