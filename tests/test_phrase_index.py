"""phrase_index_search: semantics vs a brute-force Python reference on
hand-built corpora, plus physical-plan guards for the scale claims."""

import io
from contextlib import redirect_stdout

import pandas as pd

from vbpl_web_crawl_spark.plans.queries import get_queries

SF = "/root/testdata/sf0.001"


def _run_on(spark, tmp_path, rows):
    """Materialize a documents.parquet with the given (doc_id, text)
    rows and run the gate against it."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf.to_parquet(tmp_path / "documents.parquet")
    df = get_queries()["phrase_index_search"](spark, str(tmp_path))
    return sorted(
        (r.doc_id, r.n_matches, r.first_pos, r.last_pos, r.phrase)
        for r in df.collect()
    )


def _brute(rows):
    """Reference: top trigram by (count DESC, terms ASC), then per-doc
    overlapping match positions (1-based)."""
    toks = {d: " ".join(t.lower().split()).split(" ") for d, t in rows}
    counts: dict[tuple, int] = {}
    for w in toks.values():
        for i in range(len(w) - 2):
            counts[tuple(w[i : i + 3])] = counts.get(tuple(w[i : i + 3]), 0) + 1
    top = min(counts, key=lambda k: (-counts[k], k))
    out = []
    for d, w in toks.items():
        hits = [i + 1 for i in range(len(w) - 2) if tuple(w[i : i + 3]) == top]
        if hits:
            out.append((d, len(hits), hits[0], hits[-1], " ".join(top)))
    return sorted(out)


def test_known_corpus_matches_brute_force(spark, tmp_path):
    rows = [
        (1, "red fox jumps over the red fox jumps again"),
        (2, "the red fox jumps at dawn"),
        (3, "no foxes here at all today"),
        (4, "red fox jumps red fox jumps red fox jumps"),
    ]
    assert _run_on(spark, tmp_path, rows) == _brute(rows)


def test_overlapping_matches_counted(spark, tmp_path):
    # "a a a a a" contains "a a a" at positions 1, 2, 3 (overlapping)
    rows = [(7, "a a a a a"), (8, "b c d")]
    got = _run_on(spark, tmp_path, rows)
    assert got == [(7, 3, 1, 3, "a a a")]


def test_tiebreak_is_lexicographic(spark, tmp_path):
    # two trigrams occur exactly once each -> the lexicographically
    # smallest (by w1, w2, w3) must win in both engines
    rows = [(1, "zeta eta theta"), (2, "alpha beta gamma")]
    got = _run_on(spark, tmp_path, rows)
    assert got == [(2, 1, 1, 1, "alpha beta gamma")]
    assert got == _brute(rows)


def test_plan_no_cartesian_and_pruned_scan(spark):
    """Adjacency must be (doc_id, pos) equi-joins — never a nested
    loop — and the scan must read only doc_id + text."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        get_queries()["phrase_index_search"](spark, SF).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "lang" not in line and "source" not in line
