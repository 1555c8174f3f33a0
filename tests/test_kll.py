"""Numpy-level tests for the KLL quantile sketch (operators/kll.py).

Mirror of test_tdigest.py: accuracy, boundedness, mergeability,
determinism — all without a SparkSession (the distributed wrapper is
exercised by the kll_tdigest_shootout_gate oracle query).
"""

from __future__ import annotations

import numpy as np

from eventstreams_spark.operators.kll import KLL


def _build_sharded(data: np.ndarray, n_shards: int = 8, k: int = 200) -> KLL:
    shards = [KLL(k=k) for _ in range(n_shards)]
    for i, sk in enumerate(shards):
        sk.update_batch(data[i::n_shards])
    merged = KLL(k=k)
    for sk in shards:
        merged.merge(sk)
    return merged


def test_rank_error_within_1pct_at_200k():
    rng = np.random.default_rng(7)
    data = rng.lognormal(0.0, 1.0, 200_000)
    sk = _build_sharded(data)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = sk.quantile(q)
        rank = float((data <= est).mean())
        assert abs(rank - q) <= 0.01, (q, rank)


def test_bounded_retention_and_weight_conservation():
    rng = np.random.default_rng(11)
    data = rng.normal(0.0, 1.0, 500_000)
    sk = _build_sharded(data)
    # O(k log(n/k)) retention: 200 * log2(500k/200) ~ 2.3k worst case,
    # measured far below; weight conserved to odd-buffer rounding
    assert sk.n_retained() <= 1200
    assert abs(sk.total_weight() - len(data)) <= 0.02 * len(data)


def test_small_input_is_exact():
    data = np.arange(50, dtype=np.float64)
    sk = KLL()
    sk.update_batch(data)
    assert sk.n_retained() == 50
    assert sk.total_weight() == 50.0
    assert sk.quantile(0.5) in data
    rank = float((data <= sk.quantile(0.5)).mean())
    assert abs(rank - 0.5) <= 1.0 / 50.0 + 1e-12


def test_deterministic_and_input_order_invariant():
    rng = np.random.default_rng(3)
    data = rng.exponential(2.0, 100_000)
    a = _build_sharded(data)
    b = _build_sharded(data)
    assert a.quantile(0.5) == b.quantile(0.5)
    assert a.n_retained() == b.n_retained()
    sk1, sk2 = KLL(), KLL()
    sk1.update_batch(data[:20_000])
    sk2.update_batch(rng.permutation(data[:20_000]))
    assert sk1.quantile(0.9) == sk2.quantile(0.9)


def test_serialize_roundtrip():
    rng = np.random.default_rng(5)
    sk = KLL()
    sk.update_batch(rng.uniform(0, 1, 50_000))
    items, levels, flips = sk.serialize()
    back = KLL.deserialize(items, levels, flips)
    for q in (0.25, 0.5, 0.75):
        assert back.quantile(q) == sk.quantile(q)
    assert back.n_retained() == sk.n_retained()


def test_merge_matches_single_build_accuracy():
    rng = np.random.default_rng(13)
    data = rng.gamma(2.0, 3.0, 300_000)
    merged = _build_sharded(data, n_shards=16)
    single = KLL()
    single.update_batch(data)
    for q in (0.5, 0.95):
        r_m = float((data <= merged.quantile(q)).mean())
        r_s = float((data <= single.quantile(q)).mean())
        assert abs(r_m - q) <= 0.015
        assert abs(r_s - q) <= 0.015


def test_nan_values_dropped():
    data = np.array([1.0, np.nan, 2.0, 3.0, np.nan])
    sk = KLL()
    sk.update_batch(data)
    assert sk.n_retained() == 3
    assert sk.total_weight() == 3.0
