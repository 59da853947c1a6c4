"""Semantic tests for the round-5 crawl-graph operators: multi-source
BFS layering (vs a pure-Python replay) and integer-exact HITS (vs a
pure-Python replay of the same truncating-DIV arithmetic), plus
partitioning invariance for both — the property the crawl scheduler
relies on when frontier tables arrive with arbitrary layouts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _py_bfs(edges, seeds, max_depth):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    depth = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, max_depth + 1):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        nxt -= depth.keys()
        for n in nxt:
            depth[n] = d
        frontier = nxt
        if not frontier:
            break
    return depth


def _py_hits(edges, n_iter, mass, total):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    edges = sorted(set(edges))

    def rescale(raw):
        denom = sum(raw.values()) or 1
        return {n: (raw.get(n, 0) * total) // denom for n in nodes}

    hub = {n: mass for n in nodes}
    auth = {}
    for _ in range(n_iter):
        ra = {}
        for u, v in edges:
            ra[v] = ra.get(v, 0) + hub[u]
        auth = rescale(ra)
        rh = {}
        for u, v in edges:
            rh[u] = rh.get(u, 0) + auth[v]
        hub = rescale(rh)
    return hub, auth


def test_bfs_matches_python_replay(spark):
    from vbpl_web_crawl_spark.operators.graph import bfs_layers

    # two components: a chain off the seeds and an unreachable island
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 3), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.depth for r in bfs_layers(df, seeds, max_depth=3).collect()}
    want = _py_bfs(edges, [1], 3)
    assert got == want
    assert 10 not in got and 11 not in got  # unreached absent, not depth-marked
    assert 5 not in got  # beyond the depth budget


def test_bfs_min_depth_wins_on_multiple_paths(spark):
    """A node reachable at depths 1 and 2 gets depth 1 — the crawl
    frontier admits each URL once, at first discovery."""
    from vbpl_web_crawl_spark.operators.graph import bfs_layers

    edges = [(1, 2), (1, 3), (3, 2), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.depth for r in bfs_layers(df, seeds, max_depth=3).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_multi_seed_and_partitioning_invariant(spark):
    from vbpl_web_crawl_spark.operators.graph import bfs_layers

    edges = [(i, (i * 7 + 3) % 40) for i in range(40) if i != (i * 7 + 3) % 40]
    seeds_py = [0, 13]
    want = _py_bfs(edges, seeds_py, 4)
    for nparts in (1, 13):
        df = spark.createDataFrame(edges, "src long, dst long").repartition(nparts)
        seeds = spark.createDataFrame([(s,) for s in seeds_py], "node long")
        got = {r.node: r.depth for r in bfs_layers(df, seeds, max_depth=4).collect()}
        assert got == want, f"nparts={nparts}"


def test_hits_matches_python_replay(spark):
    from vbpl_web_crawl_spark.operators.graph import hits

    # bipartite-ish purchase graph with a dominant authority (20)
    edges = [(1, 20), (2, 20), (3, 20), (1, 21), (2, 22), (4, 23), (4, 20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in hits(df, n_iter=3).collect()}
    hub, auth = _py_hits(edges, 3, 1, 100_000_000)
    assert got == {n: (hub[n], auth[n]) for n in hub}
    # the most-linked node is the top authority; pure sources have auth 0
    assert got[20][1] == max(a for _, a in got.values())
    assert got[1][1] == 0 and got[20][0] == 0


def test_hits_partitioning_invariant(spark):
    from vbpl_web_crawl_spark.operators.graph import hits

    edges = [(i % 9, 10 + (i * 5) % 7) for i in range(60)]
    r = []
    for nparts in (1, 11):
        df = spark.createDataFrame(edges, "src long, dst long").repartition(nparts)
        r.append({x.node: (x.hub, x.auth) for x in hits(df, n_iter=3).collect()})
    assert r[0] == r[1]


def _py_ppr(edges, seeds, n_iter, total, damp):
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    nodes = sorted(outdeg)
    tele = (100 - damp) * total // (100 * len(seeds))
    base = {n: (tele if n in seeds else 0) for n in nodes}
    rank = dict(base)
    for _ in range(n_iter):
        s = {}
        for u, v in edges:
            s[v] = s.get(v, 0) + rank[u] // outdeg[u]
        rank = {n: base[n] + (damp * s.get(n, 0)) // 100 for n in nodes}
    return rank


def test_ppr_matches_python_replay_and_is_invariant(spark):
    from vbpl_web_crawl_spark.operators.graph import personalized_pagerank

    und = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (1, 2)]  # parallel edge kept
    edges = und + [(b, a) for a, b in und]
    want = _py_ppr(edges, {1}, 3, 1_000_000_000, 85)
    for nparts in (1, 5):
        df = spark.createDataFrame(edges, "src long, dst long").repartition(nparts)
        seeds = spark.createDataFrame([(1,)], "node long")
        got = {
            r.node: r.rank
            for r in personalized_pagerank(df, seeds, n_iter=3).collect()
        }
        assert got == want, f"nparts={nparts}"
    # mass is seed-centred: the seed outranks the far end of the chain
    assert want[1] > want[5]


def test_ppr_empty_seed_set_raises(spark):
    import pytest as _pytest

    from vbpl_web_crawl_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    seeds = spark.createDataFrame([], "node long")
    with _pytest.raises(ValueError, match="non-empty"):
        personalized_pagerank(df, seeds)


def test_hits_initial_mass_cancels(spark):
    """floor(m*v*t/(m*S)) == floor(v*t/S): the initial mass is a pure
    common factor, so mass=1 (the overflow-safe default) and any larger
    mass produce bit-identical scores."""
    from vbpl_web_crawl_spark.operators.graph import hits

    edges = [(i % 9, 10 + (i * 5) % 7) for i in range(60)] + [(3, 14), (8, 15)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r1 = {x.node: (x.hub, x.auth) for x in hits(df, n_iter=2, mass=1).collect()}
    rm = {x.node: (x.hub, x.auth) for x in hits(df, n_iter=2, mass=1_000_000).collect()}
    assert r1 == rm


def test_hits_overflow_guard_raises(spark):
    from vbpl_web_crawl_spark.operators.graph import hits

    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    with pytest.raises(RuntimeError, match="overflow"):
        hits(df, n_iter=1, mass=1 << 40, total_mass=1 << 40)
