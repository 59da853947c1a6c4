"""Independent pure-Python replays for the part-6 gates (interval
merge, 2-hop fresh frontier, host-skew Gini): the DuckDB oracle and
the Spark plan could in principle share a windowing-semantics bug, so
these recompute each result from the raw sf0.001 parquet with plain
dict/set logic and demand exact equality."""

from __future__ import annotations

import collections

import pandas as pd

from vbpl_web_crawl_spark.plans.queries import get_queries

SF = "/root/testdata/sf0.001"


def _rows(df) -> list[tuple]:
    return sorted(map(tuple, df.collect()))


def test_interval_merge_matches_python_replay(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts", "user_id"])
    ivs = collections.defaultdict(list)
    for e, ts, u in zip(ev.event_id, ev.ts, ev.user_id):
        s = ts.value // 1000  # pandas ns -> us
        ivs[u].append((s, s + (e % 7 + 1) * 60_000_000, e))
    agg = collections.defaultdict(
        lambda: [0, 0, 0, 0, 0]
    )  # n_islands, n_events, busy, max_span, max_events
    for u, rows in ivs.items():
        rows.sort()
        islands = []
        for s, e, _ in rows:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
                islands[-1][2] += 1
            else:
                islands.append([s, e, 1])
        b = agg[u % 10]
        b[0] += len(islands)
        for s, e, n in islands:
            b[1] += n
            b[2] += e - s
            b[3] = max(b[3], e - s)
            b[4] = max(b[4], n)
    want = sorted((k, *v) for k, v in agg.items())
    got = _rows(get_queries()["interval_merge_busy_windows"](spark, SF))
    assert got == want


def _edges() -> set[tuple[int, int]]:
    # the synthetic lineitem is TPC-H-ish, NOT TPC-H: (l_orderkey,
    # l_linenumber) is not unique (sf0.001: 6000 rows, 4599 distinct
    # pairs), so each line holds a SET of parts and adjacency is the
    # cross product of consecutive line-number sets — exactly what the
    # relational join in both engine and oracle produces
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_partkey"]
    )
    by_order: dict[int, dict[int, set[int]]] = collections.defaultdict(
        lambda: collections.defaultdict(set)
    )
    for o, ln, p in zip(li.l_orderkey, li.l_linenumber, li.l_partkey):
        by_order[o][ln].add(p)
    out = set()
    for lines in by_order.values():
        for ln, parts in lines.items():
            for p in parts:
                for q in lines.get(ln + 1, ()):
                    if q != p:
                        out.add((p, q))
    return out


def test_twohop_matches_python_replay(spark):
    e = _edges()
    succ = collections.defaultdict(set)
    for u, v in e:
        succ[u].add(v)
    agg = collections.defaultdict(lambda: [0, 0, 0, None, 0])
    for u in succ:
        fof = set()
        for m in succ[u]:
            fof |= succ.get(m, set())
        fof.discard(u)
        fof -= succ[u]
        if not fof:
            continue
        b = agg[u % 10]
        n = len(fof)
        b[0] += 1
        b[1] += n
        b[2] = max(b[2], n)
        b[3] = n if b[3] is None else min(b[3], n)
        b[4] += u * n
    want = sorted((k, *v) for k, v in agg.items())
    got = _rows(get_queries()["twohop_frontier_reach"](spark, SF))
    assert got == want


def test_host_skew_gini_matches_python_replay(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "source"])
    cnt = collections.Counter(zip(docs.lang, docs.source))
    per_lang = collections.defaultdict(list)
    for (lang, src), c in cnt.items():
        per_lang[lang].append((c, src))
    want = []
    for lang, rows in per_lang.items():
        rows.sort()
        n, tot = len(rows), sum(c for c, _ in rows)
        num = 2 * sum(i * c for i, (c, _) in enumerate(rows, 1)) - (n + 1) * tot
        want.append((lang, n, tot, max(c for c, _ in rows), num, n * tot))
    got = _rows(get_queries()["host_skew_gini"](spark, SF))
    assert got == sorted(want)
    # Gini is a valid coefficient: 0 <= num/den < 1 for every language
    for _, n, tot, _, num, den in want:
        assert 0 <= num < den


def test_interval_merge_partitioning_invariance(spark):
    q = get_queries()["interval_merge_busy_windows"]
    base = _rows(q(spark, SF))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = _rows(q(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == again
