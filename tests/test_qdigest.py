"""Tests for the q-digest integer-domain quantile sketch
(operators/qdigest.py): hard size bound, EXACT weight conservation,
rank-error bound, merge losslessness, determinism."""

from __future__ import annotations

import numpy as np

from eventstreams_spark.operators.qdigest import QDigest


def _sharded(data, n_shards=8, **kw) -> QDigest:
    shards = [QDigest(**kw) for _ in range(n_shards)]
    for i, sk in enumerate(shards):
        sk.update_batch(data[i::n_shards])
    merged = QDigest(**kw)
    for sk in shards:
        merged.merge(sk)
    return merged


def test_rank_error_within_bound():
    rng = np.random.default_rng(7)
    data = np.clip((rng.lognormal(3, 1, 200_000) * 100).astype(int), 0, 65535)
    sk = _sharded(data)
    eps = 16.0 / 1024.0  # log2(U)/k
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = sk.quantile(q)
        rank = float((data <= est).mean())
        assert abs(rank - q) <= eps, (q, rank)


def test_size_bound_and_exact_weight():
    rng = np.random.default_rng(11)
    data = rng.integers(0, 65536, 500_000)
    sk = _sharded(data)
    assert sk.n_nodes() <= 3 * 1024
    assert sk.total_weight() == 500_000  # exact, not approximate


def test_small_input_keeps_exact_leaves():
    data = [5, 5, 9, 100, 65535]
    sk = QDigest()
    sk.update_batch(data)
    # n//k == 0 -> no compression: every leaf survives
    assert sk.n_nodes() == 4
    assert sk.total_weight() == 5
    assert sk.quantile(0.5) == 9


def test_clamping_out_of_domain():
    sk = QDigest(bits=8)
    sk.update_batch([-5, 300, 10])
    assert sk.total_weight() == 3
    assert sk.quantile(1.0) == 255


def test_merge_lossless_weight_and_deterministic():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 4096, 100_000)
    a = _sharded(data, n_shards=4)
    b = _sharded(data, n_shards=4)
    assert a.total_weight() == b.total_weight() == 100_000
    assert a.quantile(0.5) == b.quantile(0.5)
    assert sorted(a.counts.items()) == sorted(b.counts.items())


def test_serialize_roundtrip():
    rng = np.random.default_rng(5)
    sk = QDigest()
    sk.update_batch(rng.integers(0, 65536, 50_000))
    ids, weights, n = sk.serialize()
    back = QDigest.deserialize(ids, weights, n)
    assert back.quantile(0.9) == sk.quantile(0.9)
    assert back.total_weight() == sk.total_weight()


def test_estimate_is_dyadic_range_hi():
    # every estimate is the hi end of some stored dyadic range
    rng = np.random.default_rng(9)
    sk = QDigest()
    sk.update_batch(rng.integers(0, 65536, 200_000))
    his = {hi for hi, _lo, _w in sk._ranges()}
    for q in (0.1, 0.5, 0.9):
        assert sk.quantile(q) in his
