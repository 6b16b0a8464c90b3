"""DSIR importance resampling (Xie et al. 2023) vs an independent
pure-Python mirror: hashed unigram+bigram multinomials, Laplace-
smoothed log ratios, per-doc weights, and the deterministic Gumbel
top-k selection must match exactly.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import dsir


def _bucket(gram: str, n_buckets: int) -> int:
    return (
        int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16)
        % n_buckets
    )


def _grams(text: str) -> list[str]:
    w = text.split()
    return w + [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]


def _py_dsir(raw, target, n_buckets=64, smoothing=1.0):
    """Mirror of dsir_logweights: raw/target = [(id, text|None)]."""
    q = Counter(
        _bucket(g, n_buckets)
        for _, t in raw
        if t is not None
        for g in _grams(t)
    )
    p = Counter(
        _bucket(g, n_buckets)
        for _, t in target
        if t is not None
        for g in _grams(t)
    )
    qt, pt = sum(q.values()), sum(p.values())
    s = smoothing

    def lr(b):
        return math.log((p.get(b, 0) + s) / (pt + s * n_buckets)) - math.log(
            (q[b] + s) / (qt + s * n_buckets)
        )

    out = {}
    for i, t in raw:
        if t is None:
            out[i] = None
        else:
            out[i] = round(
                math.fsum(lr(_bucket(g, n_buckets)) for g in _grams(t)), 6
            )
    return out


def _py_gumbel(doc_id: int, salt: str = "") -> float:
    h = int(
        hashlib.md5(f"{doc_id}{salt}".encode("utf-8")).hexdigest()[:15], 16
    )
    u = (h % 10_000 + 0.5) / 10_000.0
    return -math.log(-math.log(u))


RAW = [
    (1, "the spark engine shuffles data across the cluster"),
    (2, "spark joins and window functions over big data"),
    (3, "a recipe for onion soup with butter and thyme"),
    (4, "slow cooked onion soup recipe with fresh thyme"),
    (5, ""),
    (6, None),
    (7, "spark data pipelines shuffle and join at scale"),
]
TARGET = [
    (100, "spark data processing with joins and shuffles"),
    (101, "distributed data engine for big data pipelines"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_logweights_match_mirror(spark):
    got = {
        r.doc_id: r.dsir_logweight
        for r in dsir.dsir_logweights(
            _df(spark, RAW), _df(spark, TARGET), n_buckets=64
        ).collect()
    }
    want = _py_dsir(RAW, TARGET, n_buckets=64)
    assert set(got) == set(want)
    for i in want:
        if want[i] is None:
            assert got[i] is None, i
        else:
            assert got[i] == pytest.approx(want[i], abs=2e-6), i
    # the method's point: target-like docs outweigh off-target ones
    assert min(got[1], got[2], got[7]) > max(got[3], got[4])
    assert got[5] == 0.0  # tokenless = log-neutral


def test_select_matches_mirror_and_is_deterministic(spark):
    w = _py_dsir(RAW, TARGET, n_buckets=64)
    keys = sorted(
        (
            (round(w[i] + _py_gumbel(i), 6), i)
            for i, t in RAW
            if t is not None
        ),
        key=lambda kv: (-kv[0], kv[1]),
    )
    want = [i for _, i in keys[:3]]
    got = dsir.dsir_select(
        _df(spark, RAW), _df(spark, TARGET), k=3, n_buckets=64
    ).collect()
    assert [r.doc_id for r in got] == want
    for r in got:
        assert r.gumbel_key == pytest.approx(
            round(w[r.doc_id] + _py_gumbel(r.doc_id), 6), abs=2e-6
        )
    # replay: same rows; repartition: same rows
    again = dsir.dsir_select(
        _df(spark, RAW).repartition(7), _df(spark, TARGET), k=3, n_buckets=64
    ).collect()
    assert [r.doc_id for r in again] == want
    # a different salt redraws the Gumbels (and may reorder)
    salted = dsir.dsir_select(
        _df(spark, RAW), _df(spark, TARGET), k=3, n_buckets=64, salt="s2"
    ).collect()
    assert {r.doc_id for r in salted} <= {i for i, t in RAW if t is not None}
    assert all(r.doc_id != 6 for r in salted)  # NULL text never selected


def test_validation(spark):
    raw, tgt = _df(spark, RAW), _df(spark, TARGET)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir.dsir_logweights(raw, tgt, n_buckets=0)
    with pytest.raises(ValueError, match="smoothing"):
        dsir.dsir_logweights(raw, tgt, smoothing=0.0)
    with pytest.raises(ValueError, match="k must be"):
        dsir.dsir_select(raw, tgt, k=0)


def test_null_id_rows_are_excluded(spark):
    """r8 review: a NULL-id doc used to surface with a fabricated
    0.0 (log-neutral) weight — its real grams landed under a NULL join
    key the shell's equality join can never match — and dsir_select's
    md5-of-concat_ws Gumbel key gave the NULL row a real (selectable)
    key the oracle's md5(NULL) cannot reproduce. Contract now: NULL-id
    rows are excluded entirely, and every OTHER doc's weight is
    unchanged by their presence (their grams stay out of the q fit on
    both sides)."""
    noisy = RAW + [(None, "totally off-target junk text junk junk")]
    got = {
        r.doc_id: r.dsir_logweight
        for r in dsir.dsir_logweights(
            _df(spark, noisy), _df(spark, TARGET), n_buckets=64
        ).collect()
    }
    assert None not in got
    want = _py_dsir(RAW, TARGET, n_buckets=64)
    assert set(got) == set(want)
    for i in want:
        if want[i] is None:
            assert got[i] is None, i
        else:
            assert got[i] == pytest.approx(want[i], abs=2e-6), i
    sel = dsir.dsir_select(
        _df(spark, noisy), _df(spark, TARGET), k=len(RAW) + 1, n_buckets=64
    ).collect()
    assert all(r.doc_id is not None for r in sel)


def test_empty_target_is_uniformly_negative(spark):
    """A target with no tokens fits the all-smoothing multinomial: every
    weight is finite (never -inf/NaN) and tokened docs score below 0
    (uniform target never beats the raw fit on its own mass)."""
    tgt = _df(spark, [(100, ""), (101, None)])
    got = {
        r.doc_id: r.dsir_logweight
        for r in dsir.dsir_logweights(
            _df(spark, RAW), tgt, n_buckets=64
        ).collect()
    }
    for i, t in RAW:
        if t is None:
            assert got[i] is None
        elif not t:
            assert got[i] == 0.0
        else:
            assert got[i] is not None and got[i] < 0 and math.isfinite(got[i])


def test_target_within_raw_matches_direct_fit(spark):
    """r15 subset fast path: deriving the target fit from the raw
    featurization (broadcast semi-join on target ids) must produce
    BIT-IDENTICAL weights to re-featurizing the target rows, whenever
    target is a row-subset of raw."""
    raw = _df(spark, RAW)
    target = raw.filter((F.col("doc_id") % 2) == 1)
    direct = {
        r.doc_id: r.dsir_logweight
        for r in dsir.dsir_logweights(raw, target, n_buckets=64).collect()
    }
    fast = {
        r.doc_id: r.dsir_logweight
        for r in dsir.dsir_logweights(
            raw, target, n_buckets=64, target_within_raw=True
        ).collect()
    }
    assert direct == fast
    sel_direct = [
        tuple(r)
        for r in dsir.dsir_select(raw, target, k=4, n_buckets=64).collect()
    ]
    sel_fast = [
        tuple(r)
        for r in dsir.dsir_select(
            raw, target, k=4, n_buckets=64, target_within_raw=True
        ).collect()
    ]
    assert sel_direct == sel_fast
