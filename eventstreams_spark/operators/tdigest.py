"""t-digest with real centroid compression (Dunning's merging digest).

The repo's quantile story so far: exact percentiles (A6), the GK
sketch via approx_percentile (A3), and the fixed-boundary mergeable
histogram whose gate covers the *mergeability contract*
(queries/gates.py::histogram_quantile_gate). This module adds the
t-digest itself — the sketch production systems actually merge across
shards — with the k1 scale function, so centroid capacity shrinks
toward the tails and extreme quantiles (p99/p999) stay tight where a
fixed-width histogram goes coarse.

Layout (the 100 TB shape): values are digested per (group, shard)
with ``applyInPandas`` — each shard builds one bounded O(δ) summary
from its sorted slice — then shard digests MERGE per group in a
second ``applyInPandas`` (sorted by shard id, so merge order is
deterministic). Nothing corpus-sized ever leaves an executor; the
merged digest is O(δ) floats per group regardless of input size.
Shards are minted from the data (hash % n_shards), not from Spark
partitioning, so the digest is partitioning-invariant and re-runs
bit-identically.

Pure-numpy core, Arrow-batched at the Spark boundary — no row-at-a-
time Python.
"""

from __future__ import annotations

import math

import numpy as np


def _k1(q: float, delta: float) -> float:
    """The k1 scale function: k(q) = δ/(2π)·asin(2q−1). Its slope
    →∞ at q∈{0,1}, which is what forces 1-point centroids at the
    tails (exact min/max) while mid-range centroids hold ~n/δ."""
    return delta / (2.0 * math.pi) * math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))


def compress(means: np.ndarray, weights: np.ndarray, delta: float = 100.0):
    """Merge-compress a mean-sorted centroid stream into ≤ ~2δ
    centroids: greedily absorb the next centroid into the current one
    while the k1 span of the combined cluster stays ≤ 1.

    Deterministic: input order fixed (sorted by mean, stable), the
    greedy scan is sequential, and the weighted-mean update is a
    fixed op sequence.
    """
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0  # total weight strictly before the current cluster
    for m, w in zip(means[1:], weights[1:]):
        q0 = w_before / total
        q2 = (w_before + cur_w + w) / total
        if _k1(q2, delta) - _k1(q0, delta) <= 1.0:
            cur_w += w
            cur_m += (m - cur_m) * w / cur_w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def build(values: np.ndarray, delta: float = 100.0):
    """Digest a raw value array: sort, then compress 1-weight points."""
    v = np.sort(np.asarray(values, dtype=np.float64), kind="mergesort")
    return compress(v, np.ones(len(v)), delta=delta)


def merge(parts, delta: float = 100.0):
    """Merge shard digests: concatenate centroids, recompress. The
    t-digest mergeability property — accuracy survives because
    compress() re-applies the same k1 capacity rule to the union."""
    means = np.concatenate([p[0] for p in parts])
    weights = np.concatenate([p[1] for p in parts])
    return compress(means, weights, delta=delta)


def quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Estimate the q-quantile by linear interpolation between
    centroid means in cumulative-weight space (centroid i sits at the
    midpoint of its own weight span — Dunning's standard estimator)."""
    n = len(means)
    if n == 0:
        return float("nan")
    if n == 1:
        return float(means[0])
    total = float(weights.sum())
    target = q * total
    cum = np.cumsum(weights) - weights / 2.0  # centroid midpoints
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target)) - 1
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + frac * (means[i + 1] - means[i]))


def tdigest_quantiles(
    df,
    group_col: str,
    value_col: str,
    shard_col,
    qs=(0.5, 0.9, 0.99),
    delta: float = 100.0,
    n_shards: int = 8,
):
    """Distributed two-level t-digest build → per-group quantile
    estimates. ``shard_col`` is a deterministic data-derived integer
    Column (e.g. ``user_id % 8``) so shard membership — and therefore
    the digest — is partitioning-invariant.

    Returns one row per group: the quantile estimates, the merged
    digest's centroid count, and the total weight it carries.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    qs = list(qs)

    def shard_digest(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = build(pdf["_v"].to_numpy(), delta=delta)
        return pd.DataFrame(
            {
                "g": [pdf["_g"].iloc[0]],
                "shard": [int(pdf["_s"].iloc[0])],
                "means": [m.tolist()],
                "weights": [w.tolist()],
            }
        )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("shard", kind="mergesort")  # deterministic merge order
        m, w = merge(
            [
                (np.asarray(mm, dtype=np.float64), np.asarray(ww, dtype=np.float64))
                for mm, ww in zip(pdf["means"], pdf["weights"])
            ],
            delta=delta,
        )
        row = {"g": [pdf["g"].iloc[0]]}
        for q in qs:
            row[f"q{int(q * 1000)}"] = [quantile(m, w, q)]
        row["n_centroids"] = [int(len(m))]
        row["total_weight"] = [float(w.sum())]
        return pd.DataFrame(row)

    shards = (
        df.select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("double").alias("_v"),
            shard_col.cast("int").alias("_s"),
        )
        .groupBy("_g", "_s")
        .applyInPandas(
            shard_digest,
            "g string, shard int, means array<double>, weights array<double>",
        )
    )
    q_fields = ", ".join(f"q{int(q * 1000)} double" for q in qs)
    return shards.groupBy("g").applyInPandas(
        merge_group,
        f"g string, {q_fields}, n_centroids int, total_weight double",
    )
