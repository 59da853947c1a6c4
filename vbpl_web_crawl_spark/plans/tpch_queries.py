"""TPC-H breadth gates, part 2: Q10 / Q14 / Q18 / Q19 shapes over the
driver catalog, completing the ad-hoc-analytics coverage next to the
Q1-shape (``agg_pricing_summary``), Q3 (``tpch_q3_shipping_priority``)
and Q5 (``tpch_q5_local_supplier_volume``) gates.

Shapes adapted to the synthetic catalog where a classic column is
absent (no l_shipmode/l_commitdate/p_container): Q10 and Q18 are
column-exact; Q14's promo predicate uses ``p_type LIKE 'PROMO%'``
as written; Q19 keeps the OR-of-ANDs (brand, size, quantity) disjunct
structure minus the container/shipmode terms.

Plan shapes that must hold at 100 TB (asserted in
tests/test_plan_shapes.py):

- Q10: returned-lineitem revenue per customer, top 20 — customer and
  nation dims broadcast, ONE shuffle on the 8-byte custkey for the
  agg, top-20 as TakeOrderedAndProject (never a global sort).
- Q14: promo-revenue share in a ship-date window — part side
  broadcast into the lineitem scan, date predicates pushed to
  parquet, single global conditional agg (two partials, one row out).
- Q18: large-volume orders — the HAVING > threshold runs on the
  l_orderkey pre-agg BEFORE the joins, so only qualifying orders'
  keys reach the customer/orders joins (semi-join reduction by
  construction, not an IN-subquery rewrite left to the optimizer).
- Q19: OR-of-ANDs — the disjunction references both sides, so it
  cannot be a join key; the plan must stay a broadcast hash join on
  p_partkey with the residual OR filter, and the per-branch
  quantity/brand/size bounds must still prune the parquet scans
  (l_quantity BETWEEN min-of-mins AND max-of-maxs is pushed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: customers who returned the most
# revenue in a quarter. Reference analog: the portal's "most-revised
# documents this quarter" ranking is the same returned-flag + window +
# top-k shape.
# ---------------------------------------------------------------------------


@_register(
    "tpch_q10_returned_items",
    """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       round(c_acctbal, 4) AS acctbal, n_name, c_mktsegment
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 4).alias("acctbal"),
            "n_name",
            "c_mktsegment",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect: share of revenue from PROMO parts in a
# ship-date window. One row out; the entire reduction is two partial
# sums. n_lines is carried so the gate pins the join cardinality, not
# just the ratio.
# ---------------------------------------------------------------------------


@_register(
    "tpch_q14_promo_effect",
    """
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-07-01'
""",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-07-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: orders whose total quantity exceeds
# the threshold, with customer context. The pre-agg + HAVING runs
# FIRST on (l_orderkey) — an 8-byte-key agg over the fact table —
# and only qualifying keys join outward. At 100 TB the qualifying set
# is tiny (>99th percentile), so both joins broadcast it.
# ---------------------------------------------------------------------------

_Q18_QTY = 300


@_register(
    "tpch_q18_large_volume",
    f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {_Q18_QTY}
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 4) AS totalprice,
       round(total_qty, 4) AS total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_QTY)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 4).alias("totalprice"),
            F.round("total_qty", 4).alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue, OR-of-ANDs: three (brand, size, quantity)
# disjuncts spanning both join sides. Kept as a broadcast equi-join on
# p_partkey with the OR as a residual filter; the cross-branch
# quantity envelope (1..30) is ALSO applied standalone so it pushes to
# the lineitem parquet scan even though the full OR cannot.
# ---------------------------------------------------------------------------

_Q19_OR = (
    "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) "
    "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) "
    "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"
)


@_register(
    "tpch_q19_discounted_revenue",
    f"""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_Q19_OR}
""",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)  # cross-branch envelope: pushable
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    return (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .filter(F.expr(_Q19_OR))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
