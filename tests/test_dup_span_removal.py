"""Semantic unit tests for remove_dup_spans (operators/suffix.py):
planted cross-document duplicate spans must be cut exactly — verified
against a brute-force Python reference on hand-built corpora."""

from __future__ import annotations


def _naive_removal(texts: dict[int, str], cap: int):
    """Reference: mark every position whose cap-char substring occurs
    (at any position) in >= 2 distinct docs; remove chars covered by
    [pos, pos+cap) of any marked start; return per-doc cleaned text."""
    by_cls: dict[str, set[int]] = {}
    for doc, t in texts.items():
        for i in range(len(t)):
            by_cls.setdefault(t[i : i + cap], set()).add(doc)
    out = {}
    for doc, t in texts.items():
        covered = [False] * len(t)
        for i in range(len(t)):
            if len(by_cls[t[i : i + cap]]) >= 2:
                for j in range(i, min(i + cap, len(t))):
                    covered[j] = True
        out[doc] = "".join(c for c, m in zip(t, covered) if not m)
    return out


def _run(spark, texts: dict[int, str], cap: int):
    from vbpl_web_crawl_spark.operators.suffix import remove_dup_spans

    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = remove_dup_spans(docs, cap=cap).collect()
    # side contract: the counters must be consistent with the text
    for r in rows:
        assert r.retained_chars == len(r.cleaned)
        assert r.removed_chars == len(texts[r.doc_id]) - len(r.cleaned)
    return {r.doc_id: r.cleaned for r in rows}


def test_planted_duplicate_spans_removed_exactly(spark):
    boiler = "ALL RIGHTS RESERVED COPYRIGHT!"  # 30 chars
    texts = {
        0: "unique head A " + boiler + " unique tail A",
        1: "different head B " + boiler + " different tail B",
        2: "no shared content in this one at all",
    }
    got = _run(spark, texts, 8)
    want = _naive_removal(texts, 8)
    assert got == want
    assert boiler not in got[0] and boiler not in got[1]
    assert got[2] == texts[2]  # the untouched doc survives verbatim


def test_identical_docs_fully_removed(spark):
    texts = {0: "abcdefghij" * 4, 1: "abcdefghij" * 4, 2: "zz"}
    got = _run(spark, texts, 4)
    assert got == _naive_removal(texts, 4)
    assert got[0] == "" and got[1] == ""


def test_unicode_spans_clip_by_chars_not_bytes(spark):
    dup = "қазақша🜁текст核心"  # multibyte chars
    texts = {0: "aa" + dup + "bb", 1: "cc" + dup + "dd"}
    got = _run(spark, texts, 4)
    assert got == _naive_removal(texts, 4)
