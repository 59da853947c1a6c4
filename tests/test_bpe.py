"""BPE trainer/encoder (operators/bpe.py): the classic Sennrich merge
sequence, reconstruction and determinism properties, and distributed
encode equality with the driver-side encoder."""

import pyspark.sql.functions as F

from vbpl_web_crawl_spark.operators.bpe import (
    END,
    bpe_token_counts,
    encode_word,
    train_bpe,
    word_frequencies,
)


def test_sennrich_example_merge_sequence():
    """The worked example from Sennrich et al. 2016 (low/lower/newest/
    widest): first merges are es, es+t, est+</w>, then l+o, lo+w
    (ties at equal count resolve to the lexicographically smallest
    pair, which puts (e,s) before (s,t) and (t,</w>))."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(wf, 5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_encode_reconstructs_and_respects_merges():
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(wf, 5)
    for w in ("newest", "lowest", "low", "wide"):
        toks = encode_word(w, merges)
        assert "".join(toks) == w + END, (w, toks)
        assert len(toks) <= len(w) + 1
    # trained words segment with the learned units
    assert "est" + END in encode_word("newest", merges)
    assert "low" in encode_word("low", merges)


def test_train_deterministic_and_monotone():
    wf = [("abab", 4), ("abba", 3), ("baba", 2), ("aa", 7)]
    a = train_bpe(wf, 8)
    b = train_bpe(list(reversed(wf)), 8)
    assert a == b, "merge sequence must not depend on input order"
    # more merges never changes the earlier prefix
    assert train_bpe(wf, 4) == a[:4]


def test_word_frequencies_bounded_and_ordered(spark):
    docs = spark.createDataFrame(
        [("a b b c c c",), ("c b",)], "text string"
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    wf = word_frequencies(toks, top_v=2)
    assert wf == [("c", 4), ("b", 3)]


def test_distributed_encode_equals_driver_encode(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tokens_expr = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    toks = docs.select(F.explode(tokens_expr).alias("w"))
    merges = train_bpe(word_frequencies(toks, top_v=5000), n_merges=30)
    got = {
        r.lang: (r.n_words, r.n_bpe_tokens)
        for r in bpe_token_counts(docs, merges, tokens_expr, ["lang"]).collect()
    }
    # driver-side reference over the same rows
    ref: dict = {}
    for r in docs.select("lang", F.explode(tokens_expr).alias("w")).collect():
        n, s = ref.get(r.lang, (0, 0))
        ref[r.lang] = (n + 1, s + len(encode_word(r.w, merges)))
    assert got == ref
