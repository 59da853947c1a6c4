"""Round-5 continuation queries, part 6: per-host busy-window
coalescing (gaps-and-islands interval merge), 2-hop frontier reach
(friends-of-friends with direct-edge exclusion), and host-skew Gini —
the load-balance statistic that decides a hot-host salting factor.

Reference parity: the reference crawler serializes all fetch windows
through one process (/root/reference/app/service/vbpl.py sleep loop),
so "when was each host actually busy" is implicit in wall time; at
cluster scale the per-host busy timeline must be derived from the
fetch log itself (interval merge), the 2-hop reach of a listing page
bounds the frontier growth a depth-budget round can produce, and the
host-skew Gini over the document counts quantifies exactly the
vbpl.vn-subdomain concentration the north rule's salting requirement
exists for.

Scale notes (100 TB): interval merge is ONE shuffle (window and the
island aggregation share the user-key partitioning — plan-guarded);
2-hop reach is two self-joins + one anti-join on 8-byte keys with
count_distinct folded into the same aggregation shuffle; Gini is a
counts-per-host aggregation (tiny: one row per host) followed by a
rank window over the host table only — document bodies never move.
Gini is emitted as exact integer numerator/denominator so engine and
oracle agree bit-for-bit (no float division on the compare path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Gaps-and-islands interval merge: each event occupies a deterministic
# busy window [ts, ts + (event_id % 7 + 1) minutes); per user, windows
# that overlap or touch coalesce into islands. Island detection is the
# classic cumulative-max: a row opens a new island iff its start is
# strictly after the max end among all earlier rows (frame UNBOUNDED
# PRECEDING .. 1 PRECEDING); island_id is the running sum of those
# flags. All arithmetic in integer microseconds.
# ---------------------------------------------------------------------------

_INTERVAL_SQL = """
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS e,
         event_id
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > max(e) OVER (PARTITION BY user_id
                                    ORDER BY s, e, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING)
              THEN 1 ELSE CASE WHEN row_number() OVER (
                       PARTITION BY user_id ORDER BY s, e, event_id) = 1
                   THEN 1 ELSE 0 END END AS new_island,
         event_id
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id
                               ORDER BY s, e, event_id
                               ROWS UNBOUNDED PRECEDING) AS island_id
  FROM flagged
),
merged AS (
  SELECT user_id, island_id,
         min(s) AS island_start,
         max(e) AS island_end,
         count(*) AS n_events
  FROM islands GROUP BY user_id, island_id
)
SELECT user_id % 10 AS user_bucket,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(sum(island_end - island_start) AS BIGINT) AS busy_us,
       CAST(max(island_end - island_start) AS BIGINT) AS max_island_us,
       CAST(max(n_events) AS BIGINT) AS max_island_events
FROM merged
GROUP BY user_id % 10
ORDER BY user_bucket
"""


@_register("interval_merge_busy_windows", _INTERVAL_SQL)
def q_interval_merge_busy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user-bucket summary of coalesced busy windows: island count,
    merged busy microseconds, largest island span/size. One shuffle:
    both windows and the island aggregation share the user_id hash
    partitioning (cumulative-max island detection)."""
    # events.ts reads as TIMESTAMP_NTZ; session tz is UTC so the cast
    # is exact (same pattern as operators/temporal.py:123)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        us.alias("s"),
        (us + (F.col("event_id") % 7 + 1) * 60_000_000).alias("e"),
        "event_id",
    )
    order = [F.col("s"), F.col("e"), F.col("event_id")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "s",
        "e",
        F.when(F.col("s") > F.max("e").over(w_prev), 1)
        .when(F.max("e").over(w_prev).isNull(), 1)
        .otherwise(0)
        .alias("new_island"),
        "event_id",
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island_id")
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        merged.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum(F.col("island_end") - F.col("island_start"))
            .cast("long")
            .alias("busy_us"),
            F.max(F.col("island_end") - F.col("island_start"))
            .cast("long")
            .alias("max_island_us"),
            F.max("n_events").cast("long").alias("max_island_events"),
        )
        .orderBy("user_bucket")
    )


# ---------------------------------------------------------------------------
# 2-hop reach with direct-edge exclusion (friends-of-friends) over the
# directed next-part walk graph (same edges as bowtie_reachability):
# for each node u, the count of DISTINCT nodes w reachable in exactly
# two hops that are neither u itself nor a direct successor of u. This
# is the frontier-growth bound a depth-2 crawl budget produces after
# seen-set filtering — the anti-join against direct edges IS the
# Bloom-backed seen-set subtraction expressed relationally.
# ---------------------------------------------------------------------------

_TWOHOP_SQL = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey
   AND l2.l_linenumber = l1.l_linenumber + 1
  WHERE l1.l_partkey <> l2.l_partkey
),
two AS MATERIALIZED (
  SELECT DISTINCT a.u, b.v AS w
  FROM e a JOIN e b ON a.v = b.u
  WHERE a.u <> b.v
),
fresh AS (
  SELECT t.u, t.w FROM two t
  WHERE NOT EXISTS (SELECT 1 FROM e d WHERE d.u = t.u AND d.v = t.w)
),
per_node AS (
  SELECT u, count(*) AS fof FROM fresh GROUP BY u
)
SELECT u % 10 AS node_bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(fof) AS BIGINT) AS sum_fof,
       CAST(max(fof) AS BIGINT) AS max_fof,
       CAST(min(fof) AS BIGINT) AS min_fof,
       CAST(sum(u * fof) AS BIGINT) AS dot_node_fof
FROM per_node
GROUP BY u % 10
ORDER BY node_bucket
"""


@_register("twohop_frontier_reach", _TWOHOP_SQL)
def q_twohop_frontier_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket distribution of the exact-2-hop fresh-frontier size
    (distinct 2-hop successors minus self minus direct successors)
    over the next-part walk graph. The dot_node_fof column pins the
    per-node values, not just their sums."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    nxt = li.select(
        F.col("l_orderkey").alias("o2"),
        (F.col("l_linenumber") - 1).alias("prev_line"),
        F.col("l_partkey").alias("v"),
    )
    edges = (
        # merge hint (guide §3.1 "pick the strategy deliberately"): the
        # planner's size estimate puts the 6M-row projected side just
        # under the broadcast threshold at sf1.0, and collecting +
        # hashing 6M rows on the driver is strictly worse than the
        # 32-way shuffled sort-merge (measured 11.4 s -> 4.0 s for the
        # edge derivation alone); at larger scale broadcast is not an
        # option for a fact-fact self-join anyway
        li.hint("merge").join(
            nxt,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_linenumber") == F.col("prev_line")),
        )
        .filter(F.col("l_partkey") != F.col("v"))
        .select(F.col("l_partkey").alias("u"), "v")
        .distinct()
        # feeds the self-join (both sides) AND the anti-join: compute
        # the edge derivation once, keep it partitioned in memory
        .localCheckpoint(eager=True)
    )
    mid = edges.select(F.col("u").alias("m"), F.col("v").alias("w"))
    # distinct + direct-edge anti-join folded into ONE tagged
    # aggregation (guide §2.4 "remove shuffles outright"): raw 2-hop
    # paths (tag 0) union the direct edges (tag 1), grouped once on
    # (u, w) — a group containing an edge row is a direct successor
    # (excluded), a path-only group is a fresh frontier pair (counted
    # once). Replaces the 44M-row distinct exchange PLUS the 44M-row
    # sort-merge anti-join with a single exchange + hash aggregate;
    # the pair set is identical by construction.
    paths = (
        edges.join(mid, edges.v == mid.m)
        .filter(F.col("u") != F.col("w"))
        .select("u", "w", F.lit(0).alias("tag"))
    )
    direct = edges.select("u", F.col("v").alias("w"), F.lit(1).alias("tag"))
    fresh = (
        paths.unionByName(direct)
        .groupBy("u", "w")
        .agg(F.max("tag").alias("mt"))
        .filter(F.col("mt") == 0)
    )
    per_node = fresh.groupBy("u").agg(F.count(F.lit(1)).alias("fof"))
    return (
        per_node.groupBy((F.col("u") % 10).alias("node_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("fof").cast("long").alias("sum_fof"),
            F.max("fof").cast("long").alias("max_fof"),
            F.min("fof").cast("long").alias("min_fof"),
            F.sum(F.col("u") * F.col("fof")).cast("long").alias("dot_node_fof"),
        )
        .orderBy("node_bucket")
    )


# ---------------------------------------------------------------------------
# Host-skew Gini over documents-per-source, per language: the exact
# load-imbalance statistic that sizes a hot-host salting factor (north
# rule: "explicit salting for hot hosts"). Computed from the tiny
# per-(lang, source) count table; emitted as integer numerator /
# denominator of G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with
# ranks ascending by (count, source) — exact, no float on the compare
# path. A salter would act on langs where gini_num/gini_den is high.
# ---------------------------------------------------------------------------

_GINI_SQL = """
WITH per_host AS (
  SELECT lang, source, count(*) AS cnt
  FROM documents GROUP BY lang, source
),
ranked AS (
  SELECT lang, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt, source) AS rk
  FROM per_host
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(cnt) AS BIGINT) AS total_docs,
       CAST(max(cnt) AS BIGINT) AS max_host_docs,
       CAST(2 * sum(rk * cnt) - (count(*) + 1) * sum(cnt) AS BIGINT) AS gini_num,
       CAST(count(*) * sum(cnt) AS BIGINT) AS gini_den
FROM ranked
GROUP BY lang
ORDER BY lang
"""


@_register("host_skew_gini", _GINI_SQL)
def q_host_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer Gini (numerator/denominator) of the per-source
    document-count distribution within each language — the hot-host
    salting-factor input."""
    per_host = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = per_host.select(
        "lang",
        "cnt",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("cnt", "source"))
        .alias("rk"),
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_hosts"),
            F.sum("cnt").cast("long").alias("total_docs"),
            F.max("cnt").cast("long").alias("max_host_docs"),
            (2 * F.sum(F.col("rk") * F.col("cnt")) - (F.count(F.lit(1)) + 1) * F.sum("cnt"))
            .cast("long")
            .alias("gini_num"),
            (F.count(F.lit(1)) * F.sum("cnt")).cast("long").alias("gini_den"),
        )
        .orderBy("lang")
    )
