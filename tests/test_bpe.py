"""Distributed BPE training/encoding vs an independent pure-Python
Sennrich mirror: the merge SEQUENCE (with the deterministic count-desc,
pair-asc tie-break) must match exactly, and encoding must reproduce the
mirror's final word segmentations.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import bpe
from real_estate_bigdata_spark.schema import load_table


def _py_bpe(texts, n_merges, min_pair_count=2, max_vocab_words=None):
    """Reference Sennrich BPE: same whitespace pre-tokenization, same
    end-of-word convention, same greedy left-to-right merge scan, same
    tie-break."""
    wc = Counter(
        w for t in texts if t is not None for w in t.split() if w
    )
    if max_vocab_words is not None:
        kept = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
        wc = Counter(dict(kept[:max_vocab_words]))
    vocab = {w: list(w[:-1]) + [w[-1] + bpe.END_OF_WORD] for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, c in wc.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (a, b), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_count:
            break
        merges.append((a, b))
        for w, s in vocab.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low low low low low",
    "lower lower newer newer newer newer newer newer",
    "newest newest newest widest widest",
    None,
    "",
]


def test_merge_sequence_matches_reference_mirror(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = bpe.train_bpe(df, n_merges=15)
    want, _ = _py_bpe(CORPUS, 15)
    assert got == want
    assert len(got) > 3  # the corpus genuinely supports merges


def test_merge_sequence_matches_on_real_testdata(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    texts = [r.text for r in docs.select("text").collect()]
    got = bpe.train_bpe(docs, n_merges=30)
    want, _ = _py_bpe(texts, 30)
    assert got == want


def test_encode_reproduces_mirror_segmentations(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = bpe.train_bpe(df, n_merges=10)
    _, vocab = _py_bpe(CORPUS, 10)
    out = {r.doc_id: r for r in bpe.bpe_encode(df, merges).collect()}
    for i, t in enumerate(CORPUS):
        if t is None:
            assert out[i].bpe_tokens is None and out[i].n_bpe_tokens is None
        elif not t.strip():
            assert out[i].bpe_tokens == [] and out[i].n_bpe_tokens == 0
        else:
            want = [s for w in t.split() for s in vocab[w]]
            assert out[i].bpe_tokens == want, (i, out[i].bpe_tokens, want)
            assert out[i].n_bpe_tokens == len(want)


def test_overlapping_pair_merges_left_to_right(spark):
    # the final char carries </w>, so "aaaa" = [a, a, a, a</w>] and the
    # greedy non-overlapping (a,a) merge gives [aa, a, a</w>]; "aaa"
    # gives [aa, a</w>] — the mirror's scan order, pinned by hand here
    df = spark.createDataFrame(
        [(1, "aaaa aaaa aaa")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(df, n_merges=1, min_pair_count=1)
    assert merges == [("a", "a")]
    out = bpe.bpe_encode(df, merges).collect()[0]
    assert out.bpe_tokens == [
        "aa", "a", "a</w>", "aa", "a", "a</w>", "aa", "a</w>",
    ]


def test_early_stop_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "x y z")], "doc_id long, text string"  # all pairs singleton
    )
    assert bpe.train_bpe(df, n_merges=5, min_pair_count=2) == []
    with pytest.raises(ValueError):
        bpe.train_bpe(df, n_merges=0)
    with pytest.raises(ValueError):
        bpe.train_bpe(df, n_merges=1, min_pair_count=0)


def test_max_vocab_words_truncation_matches_mirror(spark):
    texts = ["aa aa aa bb bb cc", "dd dd dd dd ee"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe.train_bpe(df, n_merges=5, min_pair_count=1, max_vocab_words=3)
    want, _ = _py_bpe(texts, 5, min_pair_count=1, max_vocab_words=3)
    assert got == want


def test_merges_deterministic_under_repartition(spark):
    """The merge sequence must be a pure function of corpus CONTENT:
    the pair aggregate is exact and the argmax tie-break total, so no
    partitioning/row-order change may flip a merge."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    a = bpe.train_bpe(df, n_merges=12)
    b = bpe.train_bpe(df.repartition(13), n_merges=12)
    c = bpe.train_bpe(df.coalesce(1), n_merges=12)
    assert a == b == c
