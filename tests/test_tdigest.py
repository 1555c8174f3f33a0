"""Pure-numpy contract tests for operators/tdigest.py — no Spark
needed: the Spark plumbing is exercised by tdigest_quantile_gate
(driver-sim + CORRECTNESS); these pin the sketch math itself."""

import numpy as np

from eventstreams_spark.operators.tdigest import build, compress, merge, quantile


def _rng(seed=7):
    return np.random.RandomState(seed)


def test_compression_bound_and_exact_tails():
    v = _rng().exponential(scale=3.0, size=50_000)
    m, w = build(v, delta=100.0)
    assert len(m) <= 200  # k1 total span is δ/2 → ~50-100 clusters
    assert w.sum() == 50_000
    # k1 slope →∞ at q→0/1: edge clusters hold ≲0.1% of the mass
    # (left edge absorbs while q0 pins at 0; right edge ends singleton)
    assert w[0] <= 50_000 * 0.002 and w[-1] == 1.0
    assert v.min() <= m[0] <= np.quantile(v, 0.002)
    assert m[-1] == v.max()


def test_quantile_rank_error_within_2pct():
    v = _rng(11).lognormal(mean=0.0, sigma=1.5, size=40_000)
    m, w = build(v, delta=100.0)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
        est = quantile(m, w, q)
        rank = (v <= est).mean()
        assert abs(rank - q) <= 0.02, (q, rank)


def test_tail_accuracy_beats_midrange_capacity():
    # the t-digest point: p999 rank error stays far under the uniform
    # 1/δ midrange capacity
    v = _rng(13).standard_cauchy(size=60_000)
    m, w = build(v, delta=100.0)
    est = quantile(m, w, 0.999)
    assert abs((v <= est).mean() - 0.999) <= 0.002


def test_merge_preserves_accuracy_and_weight():
    v = _rng(17).normal(loc=10.0, scale=4.0, size=48_000)
    shards = np.array_split(v, 8)
    merged = merge([build(s, delta=100.0) for s in shards], delta=100.0)
    assert merged[1].sum() == 48_000
    assert len(merged[0]) <= 200
    for q in (0.5, 0.9, 0.99):
        est = quantile(*merged, q)
        assert abs((v <= est).mean() - q) <= 0.02, q


def test_deterministic_rebuild():
    v = _rng(19).uniform(size=10_000)
    a, b = build(v, delta=50.0), build(v, delta=50.0)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_compress_empty_and_singleton():
    m, w = compress(np.array([]), np.array([]))
    assert len(m) == 0
    m, w = build(np.array([42.0]))
    assert list(m) == [42.0] and list(w) == [1.0]
    assert quantile(m, w, 0.5) == 42.0
