"""Deterministic synthetic TEXT corpus at arbitrary n — the input for
the dedup-growth scaling probe (tools/dedup_scaling_probe.py, curves
recorded in BENCH.md).

Emits the documents-table schema (doc_id, text, lang, source, n_chars)
with a composition that is FIXED as n grows, so candidate-pair counts
are comparable across scales:

- every 5th doc is a near-duplicate of its group leader (one word
  mutated) -> the true-pair rate is constant in n;
- every 7th doc carries a shared boilerplate sentence -> corpus-wide
  hot shingles/fingerprints that the DF caps must absorb;
- all other content is doc-local pseudo-text.

Row content is a pure function of doc_id (PCG64 seeded from the id) —
no shared RNG state, so generation is embarrassingly parallel inside
Arrow batches and identical at any partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SYLL = [
    "ba", "co", "da", "en", "fi", "go", "hu", "in", "jo", "ka", "lu", "me",
    "no", "or", "pa", "qu", "ri", "sa", "tu", "uv", "vo", "wa", "xe", "yo",
    "za", "chi", "tho", "nga", "phu", "tra", "ngo", "kim",
]
_BOILERPLATE = (
    " this document is provided for informational purposes only and "
    "carries the standard portal disclaimer of the issuing authority"
)
_LANGS = ["en", "vi", "fr"]
_WORDS_PER_DOC = 40


def _word(rng: np.random.Generator) -> str:
    return "".join(_SYLL[i] for i in rng.integers(0, len(_SYLL), 3))


def _base_text(doc_id: int) -> list[str]:
    rng = np.random.Generator(np.random.PCG64(doc_id * 2654435761 % (1 << 63)))
    return [_word(rng) for _ in range(_WORDS_PER_DOC)]


def text_for(doc_id: int) -> str:
    """The full deterministic text of ``doc_id`` (near-dup + boilerplate
    composition applied)."""
    leader = doc_id - (doc_id % 5)
    if doc_id % 5 == 4:  # near-dup of the group leader: mutate ONE word
        words = _base_text(leader)
        words[doc_id % _WORDS_PER_DOC] = "mutant" + str(doc_id)
    else:
        words = _base_text(doc_id)
    text = " ".join(words)
    if doc_id % 7 == 0:
        text += _BOILERPLATE
    return text


def synth_documents(spark: SparkSession, n: int, partitions: int = 16) -> DataFrame:
    """documents-schema DataFrame of ``n`` deterministic rows."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            texts = [text_for(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "lang": [_LANGS[int(i) % len(_LANGS)] for i in ids],
                    "source": ["synth_scale"] * len(ids),
                    "n_chars": [len(t) for t in texts],
                }
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, "doc_id long, text string, lang string, source string, n_chars long"
    )
