"""rendezvous_host_assignment: the resize-movement theorem and a
brute-force reference for the assignment itself."""

import hashlib

from pyspark.sql import functions as F

from vbpl_web_crawl_spark.plans.queries import get_queries
from vbpl_web_crawl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
W = 16


def _lane(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def _rdv(host: str, w: int) -> int:
    # packed key identical to the gate: lane * 32 + (W + 1 - k)
    return max(range(w), key=lambda k: _lane(f"{host}:{k}") * 32 + (W + 1 - k))


def test_movement_theorem_and_reference(spark):
    """Rendezvous reassigns ~1/(W+1) of hosts on W -> W+1 (binomial
    around n/17); modulo reassigns ~W/(W+1). Also pin the per-host
    rendezvous assignment against a pure-Python reference."""
    res = {
        r.method: r
        for r in get_queries()["rendezvous_host_assignment"](spark, SF).collect()
    }
    n = res["rendezvous"].n_hosts
    assert res["modulo"].n_hosts == n
    mv_r = res["rendezvous"].n_moved_on_resize
    mv_m = res["modulo"].n_moved_on_resize
    # expectation n/17 resp. 16n/17; allow wide binomial slack
    assert mv_r < n * 0.25, f"rendezvous moved {mv_r}/{n}"
    assert mv_m > n * 0.70, f"modulo moved only {mv_m}/{n}"
    assert mv_r < mv_m

    hosts = [
        f"h{r.o_custkey}"
        for r in load_table(spark, SF, "orders")
        .select("o_custkey")
        .distinct()
        .collect()
    ]
    moved_ref = sum(1 for h in hosts if _rdv(h, W) != _rdv(h, W + 1))
    assert moved_ref == mv_r


def test_plan_no_cartesian_blowup(spark):
    """The only crossJoin is against the broadcast W+1-row worker
    range — the plan must not contain a host x host product."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        get_queries()["rendezvous_host_assignment"](spark, SF).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan
    # the worker side must be broadcast, never shuffled
    assert "BroadcastExchange" in plan
