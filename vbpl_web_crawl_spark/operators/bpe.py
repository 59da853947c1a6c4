"""Byte-pair-encoding tokenizer training and encoding over the corpus
— the tokenization stage of a training-data pipeline, beyond the
simple whitespace / regex token counts in functions/text.py.

Design follows how production BPE trainers actually run (Sennrich et
al. 2016; HuggingFace tokenizers): the DISTRIBUTED part is the word
frequency aggregation (one groupBy over exploded tokens — map-side
combinable, bodies never shuffle), and the merge-learning loop runs
driver-side over the BOUNDED top-V word-frequency table (Zipf: top
100k word types carry almost all mass at any corpus size) — the same
bounded-bytes-to-driver rule as the IVF fit sample and the heavy-
hitter sketches. Encoding with the learned merges is distributed
again (mapInPandas with a per-word memo; the merge table is a few KB
broadcast in the closure).

Everything is deterministic: word ties break lexicographically, merge
ties break on (count desc, pair asc), encode applies merges in
training order — so the same corpus always yields the same vocab and
the same token counts at any partitioning.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, standard Sennrich formulation


def word_frequencies(
    tokens: DataFrame, word_col: str = "w", top_v: int = 100_000
) -> list[tuple[str, int]]:
    """(word, freq) for the ``top_v`` most frequent words, ties broken
    lexicographically. `tokens` = one row per token occurrence. The
    returned table is BOUNDED (<= top_v rows) regardless of corpus
    size; only it crosses the driver."""
    rows = (
        tokens.groupBy(word_col)
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.desc("f"), F.asc(word_col))
        .limit(top_v)
        .collect()
    )
    return [(r[word_col], r["f"]) for r in rows]


def train_bpe(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a word-frequency table
    (driver-side; the table is bounded by construction). Each round
    merges the most frequent adjacent symbol pair; ties break to the
    lexicographically smallest pair."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (END,): f for w, f in word_freqs if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for sym, f in vocab.items():
            for pair in zip(sym, sym[1:]):
                counts[pair] += f
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment one word with the learned merges, applied in training
    order (reproduces the training segmentation exactly)."""
    sym = list(word) + [END]
    for a, b in merges:
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    tokens_expr,
    group_cols: list[str],
) -> DataFrame:
    """Per-``group_cols`` BPE token totals: distributed encode via
    mapInPandas with a per-word memo (word types repeat heavily, so
    the memo amortizes the merge loop to ~once per distinct word per
    task). `tokens_expr` = Column producing the array of words."""
    base = docs.select(*group_cols, F.explode(tokens_expr).alias("w"))

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in it:
            n = []
            for w in pdf["w"]:
                k = memo.get(w)
                if k is None:
                    k = len(encode_word(w, merges))
                    memo[w] = k
                n.append(k)
            out = pdf[group_cols].copy()
            out["n_bpe"] = n
            yield out

    schema = ", ".join(f"{c} string" for c in group_cols) + ", n_bpe long"
    # group cols here are strings (lang); adjust via the caller if not
    return (
        base.mapInPandas(enc, schema)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_bpe").alias("n_bpe_tokens"),
        )
    )
