"""Redirect-chain resolution by pointer doubling — the 3xx-following
pass every crawl pipeline runs before content fetch (the reference
follows redirects implicitly inside ``requests``; see
/root/reference/app/service/vbpl.py fetch paths — at corpus scale the
chains become a TABLE of (url, location) edges extracted from fetch
logs, and resolution becomes a graph problem).

A redirect table is a FUNCTIONAL graph (every node has at most one
outgoing edge), so chains resolve by successor doubling: a jump table
holds "from u, walking 2^r steps reaches v" and one self-join per
round squares the stride — ceil(log2(max_hops)) shuffle joins on
8-byte keys total, instead of max_hops sequential joins (the naive
walk) or any driver-side iteration. The same technique as the
prefix-doubling suffix ranker (operators/suffix.py); here applied to
the successor function itself.

Terminal outcomes, all detected distributedly:
- ``resolved``: the walk reaches a node with no outgoing edge within
  ``max_hops`` — final URL + exact hop count are emitted;
- ``dangling``: the walk steps to a node absent from the table (a
  Location pointing outside the crawled set — broken redirect);
- ``loop``: neither of the above within ``max_hops`` (redirect cycles;
  real crawlers cap follow depth for exactly this reason).

Scale: jump-table rows are 4 longs + 2 booleans per node, the join key
is the 8-byte node id, and settled rows (resolved/dangling) stop
participating in joins as soon as they settle. No collect, no
driver-side loop state beyond the round counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Resolve every chain in a functional redirect graph.

    ``edges``: one row per known node — (``src`` long, ``dst`` long
    nullable); ``dst`` NULL marks a terminal (non-redirecting) node.
    Nodes may point at ids absent from ``src`` (dangling targets).

    Returns (``src``, ``final`` nullable, ``hops`` nullable,
    ``status`` in {'resolved','dangling','loop'}): ``final``/``hops``
    are set only for resolved rows; a walk that has not terminated
    after ``max_hops`` steps is a ``loop``.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    spark = edges.sparkSession

    nodes = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    term = nodes.filter(F.col("v").isNull()).select(F.col("u").alias("t_u"))
    # jump table after round 0 (stride 1): from u the walk is at `cur`
    # having taken `steps` edges; `done` = cur is terminal; `dead` =
    # the single step left the node set entirely
    step1 = nodes.filter(F.col("v").isNotNull())
    step1 = (
        step1.join(nodes.select(F.col("u").alias("v2"), F.col("v").alias("vv")),
                   step1.v == F.col("v2"), "left")
        .select(
            "u",
            F.col("v").alias("cur"),
            F.lit(1).alias("steps"),
            (F.col("v2").isNotNull() & F.col("vv").isNull()).alias("done"),
            F.col("v2").isNull().alias("dead"),
        )
    )
    jump = term.select(
        F.col("t_u").alias("u"),
        F.col("t_u").alias("cur"),
        F.lit(0).alias("steps"),
        F.lit(True).alias("done"),
        F.lit(False).alias("dead"),
    ).unionByName(step1)

    stride = 1
    while stride < max_hops:
        settled = jump.filter(F.col("done") | F.col("dead"))
        walking = jump.filter(~F.col("done") & ~F.col("dead"))
        hop = jump.select(
            F.col("u").alias("j_u"),
            F.col("cur").alias("j_cur"),
            F.col("steps").alias("j_steps"),
            F.col("done").alias("j_done"),
            F.col("dead").alias("j_dead"),
        )
        advanced = (
            walking.join(hop, walking.cur == F.col("j_u"), "left")
            .select(
                "u",
                F.coalesce(F.col("j_cur"), F.col("cur")).alias("cur"),
                F.when(
                    F.col("j_u").isNotNull(), F.col("steps") + F.col("j_steps")
                ).otherwise(F.col("steps")).alias("steps"),
                F.coalesce(F.col("j_done"), F.lit(False)).alias("done"),
                # target absent from the jump table: the PREVIOUS step
                # already walked off the node set (cur has no row)
                (F.col("j_u").isNull() | F.coalesce(F.col("j_dead"), F.lit(False))).alias("dead"),
            )
        )
        jump = settled.unionByName(advanced)
        # truncate the iterative lineage: log2(max_hops) rounds, each
        # checkpoint is 4 longs + 2 booleans per node
        jump = jump.localCheckpoint(eager=True)
        stride *= 2

    # a walk resolved at exactly `steps` <= max_hops counts; doubling
    # can overshoot past max_hops only for rows that never settled
    return jump.select(
        F.col("u").alias("src"),
        F.when(F.col("done") & (F.col("steps") <= max_hops), F.col("cur")).alias("final"),
        F.when(F.col("done") & (F.col("steps") <= max_hops), F.col("steps"))
        .cast("long")
        .alias("hops"),
        F.when(F.col("done") & (F.col("steps") <= max_hops), F.lit("resolved"))
        .when(F.col("dead"), F.lit("dangling"))
        .otherwise(F.lit("loop"))
        .alias("status"),
    )
