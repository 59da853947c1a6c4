"""Event-funnel and cohort-retention analytics over the events table.

Two operator classes the registry did not yet cover:

- ordered funnel conversion (signup -> view -> click -> purchase as a
  strictly time-ordered subsequence per user), computed as a cascade of
  running-min window expressions over ONE user-keyed shuffle — not the
  naive 4-join/4-scan formulation;
- weekly cohort retention (users grouped by first-activity week,
  counted per week offset), one scan + the user window + the distinct.

Reference parity: the reference crawler records fetch lifecycles
(queued -> fetched -> parsed -> stored, /root/reference/app/service/
vbpl.py) whose monitoring rollups are exactly these funnel/retention
shapes; here they run over the driver's events table so the DuckDB
oracle can certify them.

Scale notes (100 TB): the funnel is one Exchange(user) + Sort, with all
three cascaded Window operators reusing that single partitioning (plan-
asserted); per-user state never materializes arrays, so a power user
with 10^7 events costs sort time, not memory. Cohort retention shuffles
(user) for the first-event window, then (cohort, offset, user) for the
distinct — both 8-to-16-byte keys, bodies never move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table

_STAGES = ("signup", "view", "click", "purchase")


def funnel_user_flags(ev: DataFrame) -> DataFrame:
    """Per-user stage-reach flags r1..r4 for the strict-order funnel —
    the cascaded running-min windows all share one (user_id) partition
    ordering, so the whole cascade costs a single Exchange + Sort
    (plan-asserted in tests/test_plan_shapes.py)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    d = ev.withColumn("t1", t1)
    d = d.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "view") & (F.col("t1") < F.col("ts")),
                F.col("ts"),
            )
        ).over(w),
    )
    d = d.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("t2") < F.col("ts")),
                F.col("ts"),
            )
        ).over(w),
    )
    u = d.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("r1"),
        F.max(
            F.when(
                (F.col("event_type") == "view") & (F.col("t1") < F.col("ts")), 1
            ).otherwise(0)
        ).alias("r2"),
        F.max(
            F.when(
                (F.col("event_type") == "click") & (F.col("t2") < F.col("ts")), 1
            ).otherwise(0)
        ).alias("r3"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("t3") < F.col("ts")), 1
            ).otherwise(0)
        ).alias("r4"),
    )
    return u


@_register(
    "funnel_conversion_stages",
    f"""
WITH t AS (
  SELECT user_id, ts, event_type, event_id,
         min(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS t1
  FROM events
),
t2s AS (
  SELECT *, min(CASE WHEN event_type = 'view' AND t1 < ts THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS t2
  FROM t
),
t3s AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND t2 < ts THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS t3
  FROM t2s
),
u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
         max(CASE WHEN event_type = 'view' AND t1 < ts THEN 1 ELSE 0 END) AS r2,
         max(CASE WHEN event_type = 'click' AND t2 < ts THEN 1 ELSE 0 END) AS r3,
         max(CASE WHEN event_type = 'purchase' AND t3 < ts THEN 1 ELSE 0 END) AS r4
  FROM t3s GROUP BY user_id
),
s AS (
  SELECT CAST(sum(r1) AS BIGINT) AS n1, CAST(sum(r2) AS BIGINT) AS n2,
         CAST(sum(r3) AS BIGINT) AS n3, CAST(sum(r4) AS BIGINT) AS n4
  FROM u
)
SELECT stage, stage_idx, n_users,
       round(CAST(n_users AS DOUBLE) / nullif(prev_users, 0), 4) AS conv_from_prev,
       round(CAST(n_users AS DOUBLE) / nullif(first_users, 0), 4) AS conv_from_first
FROM (
  SELECT 'signup' AS stage, 1 AS stage_idx, n1 AS n_users, n1 AS prev_users, n1 AS first_users FROM s
  UNION ALL SELECT 'view', 2, n2, n1, n1 FROM s
  UNION ALL SELECT 'click', 3, n3, n2, n1 FROM s
  UNION ALL SELECT 'purchase', 4, n4, n3, n1 FROM s
)
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel signup -> view -> click -> purchase: per-user
    greedy subsequence existence via cascaded running-min windows on ONE
    user-keyed shuffle; per-stage reach counts and conversion rates."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    u = funnel_user_flags(ev)
    s = u.agg(
        *[F.sum(f"r{i}").cast("long").alias(f"n{i}") for i in range(1, 5)]
    ).localCheckpoint(eager=True)
    rows = []
    for idx, stage in enumerate(_STAGES, start=1):
        prev = f"n{idx - 1}" if idx > 1 else "n1"
        rows.append(
            s.select(
                F.lit(stage).alias("stage"),
                F.lit(idx).alias("stage_idx"),
                F.col(f"n{idx}").alias("n_users"),
                F.round(
                    F.col(f"n{idx}").cast("double")
                    / F.nullif(F.col(prev), F.lit(0)),
                    4,
                ).alias("conv_from_prev"),
                F.round(
                    F.col(f"n{idx}").cast("double")
                    / F.nullif(F.col("n1"), F.lit(0)),
                    4,
                ).alias("conv_from_first"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@_register(
    "cohort_retention_weekly",
    """
WITH f AS (
  SELECT user_id, ts,
         min(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cohort_week
  FROM events
),
a AS (
  SELECT DISTINCT cohort_week,
         CAST(date_diff('day', cohort_week, date_trunc('week', ts)) // 7 AS BIGINT)
           AS week_offset,
         user_id
  FROM f
),
c AS (
  SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_size
  FROM a WHERE week_offset = 0 GROUP BY cohort_week
)
SELECT strftime(a.cohort_week, '%Y-%m-%d') AS cohort_week, a.week_offset,
       CAST(count(*) AS BIGINT) AS n_active,
       round(CAST(count(*) AS DOUBLE) / c.cohort_size, 4) AS retention
FROM a JOIN c USING (cohort_week)
GROUP BY a.cohort_week, a.week_offset, c.cohort_size
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week,
    distinct-active counts and retention rate per week offset."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    wk = F.date_trunc("week", F.col("ts"))
    f = ev.withColumn(
        "cohort_week", F.min(wk).over(Window.partitionBy("user_id"))
    )
    a = (
        f.select(
            "cohort_week",
            (F.datediff(wk, F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .distinct()
        .localCheckpoint(eager=True)  # read by cohort sizes AND the rollup
    )
    c = (
        a.filter(F.col("week_offset") == 0)
        .groupBy("cohort_week")
        .agg(F.count_distinct("user_id").alias("cohort_size"))
    )
    return (
        a.join(F.broadcast(c), "cohort_week")
        .groupBy("cohort_week", "week_offset", "cohort_size")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            F.col("n_active").cast("long").alias("n_active"),
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 4
            ).alias("retention"),
        )
    )


# ---------------------------------------------------------------------------
# Trailing time-RANGE window (the rate-limiter / rolling-rate shape:
# "events in the last hour as of each event"). This is the one window
# frame class the registry lacked — a RANGE frame over event time, not
# a ROWS frame. Frame bounds are exact integer MICROSECONDS on both
# engines (unix_micros / epoch_us — the same trick the range-join gate
# uses), so inclusion at the boundary cannot drift through float or
# second-truncation. Output is the global histogram of trailing counts
# (bounded rows). Scale: one user-keyed Exchange + Sort; the range
# frame is evaluated by Spark's sliding frame code in one pass per
# partition — no self-join against a time-bucketed copy.
# ---------------------------------------------------------------------------

_TRAIL_US = 3_600_000_000  # 1 hour


@_register(
    "rolling_hour_rate_histogram",
    f"""
WITH r AS (
  SELECT user_id,
         CAST(count(*) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN {_TRAIL_US} PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS trailing_n
  FROM events
)
SELECT trailing_n, CAST(count(*) AS BIGINT) AS n_events
FROM r GROUP BY trailing_n
""",
)
def q_rolling_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-event trailing-1-hour event counts per user —
    the rolling-rate window, RANGE-framed on exact microseconds."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_TRAIL_US, 0)
    )
    return (
        ev.select(F.count(F.lit(1)).over(w).alias("trailing_n"))
        .groupBy("trailing_n")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Deterministic A/B experiment readout: users are hash-assigned to
# arms (md5(user_id) parity — the stable-bucketing trick every online
# experiment framework uses, same md5 convention as
# stratified_sample_by_lang), the metric is purchase conversion, and
# the readout is lift plus a closed-form two-proportion z statistic.
# All inputs to the float math are exact integer counts, so both
# engines compute bit-identical statistics. Scale: one scan, one
# user-keyed agg (8-byte keys), two single-row arm aggregates — the
# z-test arithmetic runs on a 2-row frame.
# ---------------------------------------------------------------------------


@_register(
    "ab_experiment_lift",
    """
WITH u AS (
  SELECT user_id,
         CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2)) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         max(CASE WHEN event_type = 'purchase' AND value >= 200 THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
),
s AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM u GROUP BY arm
),
w AS (
  SELECT max(CASE WHEN arm = 'A' THEN n_users END) AS na,
         max(CASE WHEN arm = 'A' THEN n_converted END) AS ca,
         max(CASE WHEN arm = 'B' THEN n_users END) AS nb,
         max(CASE WHEN arm = 'B' THEN n_converted END) AS cb
  FROM s
)
SELECT s.arm, s.n_users, s.n_converted,
       round(CAST(s.n_converted AS DOUBLE) / s.n_users, 4) AS conv_rate,
       round(CAST(w.cb AS DOUBLE) / w.nb - CAST(w.ca AS DOUBLE) / w.na, 4)
         AS lift_abs,
       round((CAST(w.cb AS DOUBLE) / w.nb - CAST(w.ca AS DOUBLE) / w.na)
             / nullif(sqrt(((CAST(w.ca AS DOUBLE) + w.cb) / (w.na + w.nb))
                    * (1 - (CAST(w.ca AS DOUBLE) + w.cb) / (w.na + w.nb))
                    * (1.0 / w.na + 1.0 / w.nb)), 0), 4) AS z_stat
FROM s, w
""",
)
def q_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-assigned A/B arms over users, high-value (>= 200)
    purchase-conversion rates, absolute lift (B - A) and the pooled
    two-proportion z statistic (NULL when degenerate)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    arm = F.when(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 2), 16, 10
        ).cast("long")
        % 2
        == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 200), 1
            ).otherwise(0)
        ).alias("converted")
    ).withColumn("arm", arm)
    s = (
        u.groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
        .localCheckpoint(eager=True)  # 2-row frame, read twice below
    )
    w = s.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("n_converted"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_converted"))).alias("cb"),
    )
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    pool = (F.col("ca").cast("double") + F.col("cb")) / (
        F.col("na") + F.col("nb")
    )
    z = (pb - pa) / F.nullif(
        F.sqrt(
            pool
            * (1 - pool)
            * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
        ),
        F.lit(0.0),
    )
    return s.crossJoin(F.broadcast(w)).select(
        "arm",
        "n_users",
        "n_converted",
        F.round(F.col("n_converted").cast("double") / F.col("n_users"), 4).alias(
            "conv_rate"
        ),
        F.round(pb - pa, 4).alias("lift_abs"),
        F.round(z, 4).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Triangle counting on the part CO-PURCHASE graph (parts linked when
# one order contains both — the market-basket projection of lineitem;
# the co-SUPPLY projection is near-complete on this data and its
# triangle count is degenerate). Uses the DEGREE-ORIENTED algorithm (Cohen / Suri-Vassilvitskii
# "Counting triangles and the curse of the last reducer", WWW'11):
# orient every undirected edge from its lower-(degree, id) endpoint to
# the higher one, then count directed paths u->v->w closed by u->w.
# Orientation bounds each node's out-degree by O(sqrt(m)), so the
# path-join never explodes on a hub node — the difference between a
# shuffle of O(m^1.5) and O(sum deg^2) at 100 TB. Both engines run the
# SAME oriented formulation, so the oracle certifies the scalable
# algorithm, not a naive a<b<c join.
# ---------------------------------------------------------------------------


@_register(
    "triangle_count_copurchase",
    """
WITH pe AS (
  SELECT DISTINCT a.part_a, a.part_b FROM (
    SELECT l1.l_partkey AS part_a, l2.l_partkey AS part_b
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l1
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  ) a
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT part_a AS node FROM pe UNION ALL SELECT part_b FROM pe
  ) GROUP BY node
),
oriented AS (
  SELECT CASE WHEN (da.d, pe.part_a) < (db.d, pe.part_b)
              THEN pe.part_a ELSE pe.part_b END AS u,
         CASE WHEN (da.d, pe.part_a) < (db.d, pe.part_b)
              THEN pe.part_b ELSE pe.part_a END AS v
  FROM pe JOIN deg da ON da.node = pe.part_a
          JOIN deg db ON db.node = pe.part_b
)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM pe) AS BIGINT) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM oriented e1
JOIN oriented e2 ON e2.u = e1.v
JOIN oriented e3 ON e3.u = e1.u AND e3.v = e2.v
""",
)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count of the part co-purchase (market-basket)
    graph via degree-oriented path closing (out-degree O(sqrt(m)))."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    l2 = li.select(
        F.col("l_partkey").alias("part_b"), F.col("l_orderkey").alias("o2")
    )
    pe = (
        li.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_partkey") < F.col("part_b")),
        )
        .select(F.col("l_partkey").alias("part_a"), "part_b")
        .distinct()
        .localCheckpoint(eager=True)  # read by degrees AND orientation
    )
    deg = (
        pe.select(F.col("part_a").alias("node"))
        .unionAll(pe.select(F.col("part_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("part_a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("part_b"), F.col("d").alias("db"))
    j = pe.join(da, "part_a").join(db, "part_b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("part_a") < F.col("part_b"))
    )
    oriented = j.select(
        F.when(a_first, F.col("part_a")).otherwise(F.col("part_b")).alias("u"),
        F.when(a_first, F.col("part_b")).otherwise(F.col("part_a")).alias("v"),
    ).localCheckpoint(eager=True)  # self-joined three ways below
    e2 = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = oriented.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = (
        oriented.join(e2, "v")
        .join(
            e3,
            (F.col("u") == F.col("u3")) & (F.col("w") == F.col("w3")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = pe.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
    )


# ---------------------------------------------------------------------------
# Event throttle (min-gap filter): drop events closer than _GAP_US to
# the PREVIOUS event of the same (user, type) — the recrawl-throttle /
# notification-debounce shape. One lag() over the (user_id, event_type)
# window on exact microseconds; per-type kept/dropped rollup.
# ---------------------------------------------------------------------------

_GAP_US = 600_000_000  # 10 minutes


@_register(
    "event_throttle_stats",
    f"""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN gap_us IS NULL OR gap_us >= {_GAP_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(1 - CAST(sum(CASE WHEN gap_us IS NULL OR gap_us >= {_GAP_US}
                     THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS drop_ratio
FROM g GROUP BY event_type
""",
)
def q_event_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event throttling stats at a 10-minute min-gap (exact
    microsecond lag over the (user, type) window)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    g = ev.withColumn("gap_us", F.col("us") - F.lag("us").over(w))
    kept = F.when(
        F.col("gap_us").isNull() | (F.col("gap_us") >= _GAP_US), 1
    ).otherwise(0)
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(kept).cast("long").alias("n_kept"),
        F.round(
            1 - F.sum(kept).cast("double") / F.count(F.lit(1)), 4
        ).alias("drop_ratio"),
    )
