"""Property tests for the prefix-doubling suffix ranker
(operators/suffix.py) and the pointer-doubling redirect resolver
(operators/redirects.py) against brute-force sequential references."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _naive_ranks(texts: dict[int, str], cap: int) -> dict[tuple[int, int], int]:
    """dense_rank of every suffix by its first ``cap`` chars."""
    keys = [
        (text[p : p + cap], doc, p)
        for doc, text in texts.items()
        for p in range(len(text))
    ]
    rank_of: dict[str, int] = {}
    for k in sorted({k for k, _, _ in keys}):
        rank_of[k] = len(rank_of) + 1
    return {(doc, p): rank_of[k] for k, doc, p in keys}


_DOC_TEXT = st.text(
    alphabet=st.sampled_from("abĐ🜁"), min_size=0, max_size=24
)


@settings(max_examples=12, deadline=None)
@given(st.lists(_DOC_TEXT, min_size=1, max_size=5), st.sampled_from([2, 4, 8]))
def test_suffix_ranks_match_naive(spark, texts, cap):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from vbpl_web_crawl_spark.operators.suffix import suffix_ranks

    got = {
        (r.doc_id, r.pos): r.rank for r in suffix_ranks(docs, cap=cap).collect()
    }
    want = _naive_ranks({i: t for i, t in enumerate(texts)}, cap)
    assert got == want


def test_suffix_ranks_rejects_non_power_of_two(spark):
    import pytest as _pytest

    from vbpl_web_crawl_spark.operators.suffix import suffix_ranks

    docs = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    for bad in (0, 1, 3, 6):
        with _pytest.raises(ValueError):
            suffix_ranks(docs, cap=bad)


def _naive_resolve(edges: dict[int, int | None], max_hops: int):
    out = {}
    for src in edges:
        cur, hops = src, 0
        while True:
            if cur in edges and edges[cur] is None:
                out[src] = ("resolved", cur, hops)
                break
            if cur not in edges:
                out[src] = ("dangling", None, None)
                break
            if hops >= max_hops:
                out[src] = ("loop", None, None)
                break
            cur = edges[cur]
            hops += 1
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 15),
        st.one_of(st.none(), st.integers(0, 18)),  # 16-18 = dangling targets
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([1, 3, 8]),
)
def test_resolve_redirects_matches_naive(spark, edges, max_hops):
    from vbpl_web_crawl_spark.operators.redirects import resolve_redirects

    df = spark.createDataFrame(
        [(u, v) for u, v in edges.items()], "src long, dst long"
    )
    got = {
        r.src: (r.status, r.final, r.hops)
        for r in resolve_redirects(df, max_hops=max_hops).collect()
    }
    assert got == _naive_resolve(edges, max_hops)


def test_resolve_redirects_long_chain_and_cycle(spark):
    """A 7-hop chain resolves with exact hop count; a 3-cycle and a
    self-loop are flagged loop; a dangling edge is flagged dangling."""
    from vbpl_web_crawl_spark.operators.redirects import resolve_redirects

    rows = [(i, i + 1) for i in range(7)] + [(7, None)]  # chain 0->..->7
    rows += [(10, 11), (11, 12), (12, 10)]  # 3-cycle
    rows += [(20, 20)]  # self-loop
    rows += [(30, 999)]  # dangling
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r.src: (r.status, r.final, r.hops)
        for r in resolve_redirects(df, max_hops=8).collect()
    }
    assert got[0] == ("resolved", 7, 7)
    assert got[7] == ("resolved", 7, 0)
    assert got[10] == ("loop", None, None)
    assert got[20] == ("loop", None, None)
    assert got[30] == ("dangling", None, None)
    # partitioning invariance: same result at a different layout
    got2 = {
        r.src: (r.status, r.final, r.hops)
        for r in resolve_redirects(df.repartition(7), max_hops=8).collect()
    }
    assert got2 == got
