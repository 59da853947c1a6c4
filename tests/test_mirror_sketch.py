"""Property test: the vectorized strided-gram fingerprint pass
(plans/pipeline_queries12.strided_gram_fps) must equal a naive Python
reference — char-based gram slicing, md5[0:8], stride sampling,
per-source distinct — for arbitrary unicode text."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from vbpl_web_crawl_spark.plans.pipeline_queries12 import (
    _MIRROR_GRAM,
    _MIRROR_STRIDE,
    strided_gram_fps,
)


def _naive(rows: list[tuple[int, str, str]]) -> set[tuple[str, str]]:
    out = set()
    for _id, source, text in rows:
        n = len(text) - _MIRROR_GRAM + 1
        for i in range(0, n, _MIRROR_STRIDE):
            fp = hashlib.md5(
                text[i : i + _MIRROR_GRAM].encode("utf-8")
            ).hexdigest()[:8]
            out.add((source, fp))
    return out


_TEXT = st.text(
    alphabet=st.sampled_from("abc ăđ核🜁"), min_size=0, max_size=120
)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["s0", "s1", "s2"]), _TEXT), max_size=6))
def test_strided_gram_fps_matches_naive(spark, rows):
    rows = [(i, s, t) for i, (s, t) in enumerate(rows)]
    df = spark.createDataFrame(
        rows or [(0, "s0", "")], "doc_id long, source string, text string"
    )
    got = {(r.source, r.fp) for r in strided_gram_fps(df).collect()}
    want = _naive(rows or [(0, "s0", "")])
    assert got == want
