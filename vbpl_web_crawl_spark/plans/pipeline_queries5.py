"""Round-5 continuation queries, part 5: dense-core and reachability
structure of the crawl graph (k-core peeling, bow-tie decomposition),
aspect-ratio batch packing for image training corpora, and TPC-H Q5
as a Catalyst join-ordering showcase.

Reference parity: the reference crawler's link universe (seed index ->
listing pages -> detail pages, /root/reference/app/service/vbpl.py) is
a directed web graph; k-core identifies its densely interlinked hub
pages (refresh-priority set) and the bow-tie split (Broder et al.,
WWW'00) classifies every page by reachability relative to a hub —
IN pages can funnel a crawler toward the core, OUT pages are sinks.
The aspect-bucket packer is the image twin of sequence packing: a
diffusion/vision training job batches images of like aspect ratio to a
fixed pixel budget (variable-resolution bucketing), exactly as the
text pipeline packs token streams to a context budget.

Scale notes (100 TB): k-core is O(peel-depth) rounds of degree-agg +
semi-joins on 8-byte keys (operators/graph.py:k_core); bow-tie is two
layered BFS passes over an edge table partitioned by src once; the
packer is one (bucket)-keyed window cumsum, bodies never shuffle. The
unrolled SQL oracles use MATERIALIZED CTEs so each peel/BFS level is
evaluated once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import _register
from vbpl_web_crawl_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# k-core of the part co-purchase graph (same graph as
# triangle_count_copurchase). k chosen so the peel actually cascades:
# at k=75 the fixpoint takes 5 peel rounds at sf0.01 AND sf0.1 and
# leaves a non-empty core (empirically: 1,938 / 19,407 nodes). The
# oracle unrolls _KCORE_UNROLL >= 5 peel levels; peeling a converged
# edge set is the identity, so any unroll count >= the true peel depth
# reproduces the fixpoint bit-for-bit while the engine loop stops at
# convergence (and RAISES if max_iter exhausts first).
# ---------------------------------------------------------------------------

_KCORE_K = 75
_KCORE_UNROLL = 8


def _kcore_oracle() -> str:
    ctes = [
        """e0 AS MATERIALIZED (
  WITH pe AS (
    SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l1
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey)
  SELECT a AS u, b AS v FROM pe UNION ALL SELECT b, a FROM pe
)"""
    ]
    for i in range(1, _KCORE_UNROLL + 1):
        ctes.append(
            f"""k{i} AS MATERIALIZED (
  SELECT u FROM e{i - 1} GROUP BY u HAVING count(*) >= {_KCORE_K}
)"""
        )
        ctes.append(
            f"""e{i} AS MATERIALIZED (
  SELECT l.u, l.v FROM e{i - 1} l
  WHERE l.u IN (SELECT u FROM k{i}) AND l.v IN (SELECT u FROM k{i})
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT u % 10 AS node_bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(u) AS BIGINT) AS sum_node,
       CAST(sum(deg) AS BIGINT) AS sum_deg,
       min(u) AS min_node,
       max(u) AS max_node
FROM (SELECT u, count(*) AS deg FROM e{_KCORE_UNROLL} GROUP BY u)
GROUP BY u % 10
ORDER BY node_bucket
"""
    )


@_register("kcore_copurchase", _kcore_oracle())
def q_kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket membership + within-core degree summary of the
    {k}-core of the part co-purchase graph, peeled to fixpoint by
    operators/graph.py:k_core (Matula-Beck as DataFrame rounds)."""
    from vbpl_web_crawl_spark.operators.graph import k_core

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    l2 = li.select(
        F.col("l_partkey").alias("part_b"), F.col("l_orderkey").alias("o2")
    )
    pe = li.join(
        l2,
        (F.col("l_orderkey") == F.col("o2"))
        & (F.col("l_partkey") < F.col("part_b")),
    ).select(F.col("l_partkey").alias("src"), F.col("part_b").alias("dst"))
    core = k_core(pe, k=_KCORE_K)
    return (
        core.groupBy((F.col("node") % 10).alias("node_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").cast("long").alias("sum_node"),
            F.sum("deg").cast("long").alias("sum_deg"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("node_bucket")
    )


q_kcore_copurchase.__doc__ = (q_kcore_copurchase.__doc__ or "").format(k=_KCORE_K)

# ---------------------------------------------------------------------------
# Bow-tie decomposition (Broder et al., WWW'00) of a DIRECTED
# co-purchase sequence graph: within each order, an edge from the part
# on line n to the part on line n+1 (the "customers who added X next
# added Y" walk). Every node is classified by reachability relative to
# a deterministic pivot (max out-degree, ties to the smallest part):
# CORE = reaches pivot AND reached from pivot (the SCC containing it,
# within the depth budget), IN = reaches pivot only, OUT = reached
# only, OTHER = neither. Reachability is layered BFS capped at
# _BOWTIE_DEPTH hops — the crawl's depth-budget semantics; 3 hops
# splits all four classes non-trivially at sf0.01 AND sf0.1 (the walk
# graph's giant SCC swallows everything by depth 4) — and the
# oracle unrolls exactly the same _BOWTIE_DEPTH levels, so engine and
# oracle agree whether or not the frontier has drained.
# ---------------------------------------------------------------------------

_BOWTIE_DEPTH = 3


def _bowtie_reach_ctes(tag: str, edge_src: str, edge_dst: str) -> str:
    """Unrolled visited-set CTE chain v{tag}{D} from the pivot over
    (edge_src -> edge_dst), depth-capped at _BOWTIE_DEPTH."""
    ctes = [
        f"""v{tag}0 AS MATERIALIZED (
  SELECT node FROM pvt
)"""
    ]
    for d in range(1, _BOWTIE_DEPTH + 1):
        ctes.append(
            f"""v{tag}{d} AS MATERIALIZED (
  SELECT node FROM v{tag}{d - 1}
  UNION
  SELECT e.{edge_dst} AS node FROM e
  JOIN v{tag}{d - 1} p ON e.{edge_src} = p.node
)"""
        )
    return ",\n".join(ctes)


def _bowtie_oracle() -> str:
    return f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey
   AND l2.l_linenumber = l1.l_linenumber + 1
  WHERE l1.l_partkey <> l2.l_partkey
),
deg AS MATERIALIZED (
  SELECT u AS node, count(*) AS outdeg FROM e GROUP BY u
),
pvt AS MATERIALIZED (
  SELECT node FROM deg ORDER BY outdeg DESC, node ASC LIMIT 1
),
{_bowtie_reach_ctes('f', 'u', 'v')},
{_bowtie_reach_ctes('b', 'v', 'u')},
nodes AS MATERIALIZED (
  SELECT u AS node FROM e UNION SELECT v FROM e
),
cls AS (
  SELECT n.node,
         CASE
           WHEN fwd.node IS NOT NULL AND bwd.node IS NOT NULL THEN 'CORE'
           WHEN bwd.node IS NOT NULL THEN 'IN'
           WHEN fwd.node IS NOT NULL THEN 'OUT'
           ELSE 'OTHER'
         END AS cls
  FROM nodes n
  LEFT JOIN v{'f'}{_BOWTIE_DEPTH} fwd ON fwd.node = n.node
  LEFT JOIN v{'b'}{_BOWTIE_DEPTH} bwd ON bwd.node = n.node
)
SELECT cls,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(node) AS BIGINT) AS sum_node,
       min(node) AS min_node,
       max(node) AS max_node
FROM cls
GROUP BY cls
ORDER BY cls
"""


@_register("bowtie_reachability", _bowtie_oracle())
def q_bowtie_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bow-tie class summary (CORE/IN/OUT/OTHER) of the directed
    next-part walk graph relative to the max-out-degree pivot, both
    reachability passes as depth-capped layered BFS
    (operators/graph.py:bfs_layers)."""
    from vbpl_web_crawl_spark.operators.graph import bfs_layers

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    nxt = li.select(
        F.col("l_orderkey").alias("o2"),
        (F.col("l_linenumber") - 1).alias("prev_line"),
        F.col("l_partkey").alias("v"),
    )
    edges = (
        # merge hint: avoid the 6M-row driver broadcast the size
        # estimate would otherwise pick (measured 11.4 -> 4.0 s; see
        # twohop_frontier_reach)
        li.hint("merge").join(
            nxt,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_linenumber") == F.col("prev_line")),
        )
        .filter(F.col("l_partkey") != F.col("v"))
        .select(F.col("l_partkey").alias("u"), "v")
        .distinct()
        .localCheckpoint(eager=True)  # feeds degree, both BFS passes, nodes
    )
    pivot = (
        edges.groupBy("u")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .orderBy(F.col("outdeg").desc(), F.col("u").asc())
        .limit(1)
        .select(F.col("u").alias("node"))
    )
    # BOTH reachability passes in ONE layered BFS: tag direction in the
    # node's sign (forward = +n, backward = -(n+1), disjoint spaces), so
    # each depth costs one driver round instead of two — the same
    # frontier-budget trick a fetch fleet uses to walk in/out link
    # tables in one scheduler pass
    tagged_edges = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).union(
        edges.select(
            (-F.col("v") - 1).alias("src"), (-F.col("u") - 1).alias("dst")
        )
    )
    tagged_seeds = pivot.select(F.col("node")).union(
        pivot.select((-F.col("node") - 1).alias("node"))
    )
    reach = bfs_layers(
        tagged_edges, tagged_seeds, src="src", dst="dst", max_depth=_BOWTIE_DEPTH
    ).localCheckpoint(eager=True)
    fwd = reach.filter(F.col("node") >= 0).select("node")
    bwd = reach.filter(F.col("node") < 0).select((-F.col("node") - 1).alias("node"))
    nodes = edges.select(F.col("u").alias("node")).union(
        edges.select(F.col("v").alias("node"))
    ).distinct()
    cls = (
        nodes.join(fwd.select("node", F.lit(1).alias("f")), "node", "left")
        .join(bwd.select("node", F.lit(1).alias("b")), "node", "left")
        .select(
            "node",
            F.when(F.col("f").isNotNull() & F.col("b").isNotNull(), "CORE")
            .when(F.col("b").isNotNull(), "IN")
            .when(F.col("f").isNotNull(), "OUT")
            .otherwise("OTHER")
            .alias("cls"),
        )
    )
    return (
        cls.groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").cast("long").alias("sum_node"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("cls")
    )


# ---------------------------------------------------------------------------
# Aspect-ratio bucketed batch packing for image training (the
# variable-resolution bucketing a diffusion/vision trainer applies to
# the crawl's scanned-image corpus; input_hint schema carries w/h).
# To give DuckDB the same dimensions, w and h are DERIVED
# deterministically from doc_id (two independent md5 lanes -> 256..1535
# px), exactly the derivation pattern the phash gates use; the real
# decode->dimensions provenance is certified by the multimodal gates.
# Buckets are pure-integer aspect classes on (100*w) DIV h; within a
# bucket, images pack in doc_id order into batches of _PX_BUDGET
# pixels, batch_id = prefix-sum DIV budget of the pixels BEFORE the
# image (first-fit by prefix — an image never splits, a batch may
# overflow by at most one image; both engines compute the identical
# integer rule).
# ---------------------------------------------------------------------------

_PX_BUDGET = 1 << 22  # 4 Mi pixels per batch


def _dim_sql(salt: str) -> str:
    """256..1535 px, derived from md5(doc_id || salt) — DuckDB form."""
    return (
        f"(256 + CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{salt}'), "
        "1, 8)) AS BIGINT) % 1280)"
    )


def _dim_col(salt: str):
    """The same 256..1535 derivation, Spark form (conv hex -> long)."""
    return 256 + F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("long") % 1280


_ASPECT_CASE = """CASE
  WHEN r < 65 THEN 'tall'
  WHEN r < 90 THEN 'portrait'
  WHEN r < 112 THEN 'square'
  WHEN r < 154 THEN 'landscape'
  ELSE 'wide' END"""


@_register(
    "image_aspect_batch_packing",
    f"""
WITH dims AS (
  SELECT doc_id,
         {_dim_sql('w')} AS w,
         {_dim_sql('h')} AS h
  FROM documents
),
buck AS (
  SELECT doc_id, w, h, (100 * w) // h AS r, w * h AS px FROM dims
),
cls AS (
  SELECT doc_id, px, {_ASPECT_CASE} AS bucket FROM buck
),
packed AS (
  SELECT bucket, px,
         (sum(px) OVER (PARTITION BY bucket ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - px) // {_PX_BUDGET}
           AS batch_id
  FROM cls
),
per_batch AS (
  SELECT bucket, batch_id, CAST(sum(px) AS BIGINT) AS batch_px,
         count(*) AS n_imgs
  FROM packed GROUP BY bucket, batch_id
)
SELECT bucket,
       CAST(sum(n_imgs) AS BIGINT) AS n_images,
       CAST(sum(batch_px) AS BIGINT) AS total_px,
       CAST(count(*) AS BIGINT) AS n_batches,
       CAST(max(batch_px) AS BIGINT) AS max_batch_px,
       CAST(sum(CASE WHEN batch_px > {_PX_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overflow_batches
FROM per_batch
GROUP BY bucket
ORDER BY bucket
""",
)
def q_image_aspect_batch_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-aspect-bucket packing outcome at a {px} px batch budget:
    images, batches, max batch fill, overflow batches."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    dims = docs.select(
        "doc_id", _dim_col("w").alias("w"), _dim_col("h").alias("h")
    )
    buck = dims.select(
        "doc_id",
        F.expr("(100 * w) div h").alias("r"),
        (F.col("w") * F.col("h")).alias("px"),
    )
    cls = buck.select(
        "doc_id", "px", F.expr(_ASPECT_CASE.replace("\n", " ")).alias("bucket")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = cls.select(
        "bucket",
        "px",
        F.expr(f"(sum(px) OVER (PARTITION BY bucket ORDER BY doc_id "
               f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - px) "
               f"div {_PX_BUDGET}").alias("batch_id"),
    )
    per_batch = packed.groupBy("bucket", "batch_id").agg(
        F.sum("px").cast("long").alias("batch_px"),
        F.count(F.lit(1)).alias("n_imgs"),
    )
    return (
        per_batch.groupBy("bucket")
        .agg(
            F.sum("n_imgs").cast("long").alias("n_images"),
            F.sum("batch_px").cast("long").alias("total_px"),
            F.count(F.lit(1)).alias("n_batches"),
            F.max("batch_px").cast("long").alias("max_batch_px"),
            F.sum(F.when(F.col("batch_px") > _PX_BUDGET, 1).otherwise(0))
            .cast("long")
            .alias("n_overflow_batches"),
        )
        .orderBy("bucket")
    )


q_image_aspect_batch_packing.__doc__ = (
    q_image_aspect_batch_packing.__doc__ or ""
).format(px=_PX_BUDGET)

# ---------------------------------------------------------------------------
# TPC-H Q5 (local supplier volume): the canonical 6-table join whose
# ONLY fast plan is broadcast the region->nation spine and shuffle the
# two fact tables on their join keys once — a Catalyst join-ordering
# showcase (the reference has no analog; this certifies the engine's
# multi-join planning the way tpch_q3 certifies its 3-table core).
# Predicate literals restated for the driver's date-typed parquet.
# ---------------------------------------------------------------------------


@_register(
    "tpch_q5_local_supplier_volume",
    """
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 over the driver tables; revenue rounded to 4 decimals
    on both sides (the tpch_q3 parity convention for the double-typed
    price columns)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    spine = F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    ))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(spine, s.s_nationkey == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "nation")
    )
