"""pareto_quality_frontier: the factored per-level formulation must
equal the NAIVE O(n^2) skyline under the general dominance definition
(A dominated iff exists B with q_B >= q_A and t_B <= t_A and strictly
better on one axis), plus plan guards."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from vbpl_web_crawl_spark.functions import text as TX
from vbpl_web_crawl_spark.plans.queries import get_queries
from vbpl_web_crawl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _naive_skyline(rows):
    """rows: (doc_id, lang, q4, nt). Returns the frontier doc set per
    the general dominance definition, then the gate's per-level
    summary rows."""
    front = []
    for a in rows:
        dominated = any(
            b[1] == a[1]
            and b[2] >= a[2]
            and b[3] <= a[3]
            and (b[2] > a[2] or b[3] < a[3])
            for b in rows
        )
        if not dominated:
            front.append(a)
    out = {}
    for d, lang, q4, nt in front:
        key = (lang, q4, nt)
        n, mn, sm = out.get(key, (0, None, 0))
        out[key] = (n + 1, d if mn is None else min(mn, d), sm + d)
    return sorted(
        (lang, q4, nt, n, mn, sm) for (lang, q4, nt), (n, mn, sm) in out.items()
    )


def test_matches_naive_skyline_on_corpus(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    feats = docs.select(
        "doc_id",
        "lang",
        F.round(TX.quality_score(F.col("text")) * 4).cast("int").alias("q4"),
        TX.token_count_ws(F.col("text")).cast("long").alias("nt"),
    ).collect()
    rows = [(r.doc_id, r.lang, r.q4, r.nt) for r in feats]
    got = sorted(
        (
            r.lang,
            r.quality_q4,
            r.frontier_tokens,
            r.n_docs,
            r.min_doc_id,
            r.sum_doc_id,
        )
        for r in get_queries()["pareto_quality_frontier"](spark, SF).collect()
    )
    assert got == _naive_skyline(rows)


def test_frontier_is_mutually_undominated(spark):
    """No frontier level may dominate another frontier level of the
    same language — the defining property of a skyline."""
    res = get_queries()["pareto_quality_frontier"](spark, SF).collect()
    by_lang: dict = {}
    for r in res:
        by_lang.setdefault(r.lang, []).append((r.quality_q4, r.frontier_tokens))
    for lvls in by_lang.values():
        for q1, t1 in lvls:
            for q2, t2 in lvls:
                if (q1, t1) != (q2, t2):
                    assert not (q1 >= q2 and t1 <= t2), "dominated level on frontier"


def test_plan_no_cartesian_and_broadcast_tag_join(spark):
    plan_buf = io.StringIO()
    with redirect_stdout(plan_buf):
        get_queries()["pareto_quality_frontier"](spark, SF).explain("formatted")
    plan = plan_buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the doc-tagging join never shuffles docs
