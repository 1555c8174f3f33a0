#!/usr/bin/env python3
"""Measure MASS (FFT) vs quadratic matrix-profile kernels as the
series grows — the evidence behind matrix_profile_mass_gate's claim
that MASS is the production path for long series (SCALE.md §16).

Both kernels compute the SAME z-normalized squared-distance profile
(window m=24, exclusion 12) on a deterministic synthetic integer
series (md5-free: x_t = 50 + 20·sin(2πt/24) + (t·2654435761 mod 17),
mirroring an hourly count with daily shape + noise). Quadratic =
per-pair integer dot via numpy einsum on a strided window matrix
(the in-engine zip_with analog); MASS = one rfft of the series per
window + pointwise multiply + irfft.

Run: python tools/exp_mass_scaling.py [n1 n2 ...]  (default
240 960 3840 15360). Prints one line per n with both times and the
max |Δ| between the two profiles (must stay < 1e-6).
"""

from __future__ import annotations

import sys
import time

import numpy as np

M, EXCL = 24, 12  # M is overridden by the m-sweep in main()


def series(n: int) -> np.ndarray:
    t = np.arange(n, dtype=np.float64)
    return (
        50.0
        + np.round(20.0 * np.sin(2.0 * np.pi * t / 24.0))
        + ((np.arange(n, dtype=np.int64) * 2654435761) % 17)
    ).astype(np.float64)


def moments(x: np.ndarray):
    c1 = np.concatenate([[0.0], np.cumsum(x)])
    c2 = np.concatenate([[0.0], np.cumsum(x * x)])
    nw = len(x) - M + 1
    sw = c1[M : nw + M] - c1[:nw]
    sww = c2[M : nw + M] - c2[:nw]
    var = M * sww - sw * sw
    return sw, sww, var, nw


def d2_from_dp(dp, i, sw, var):
    with np.errstate(divide="ignore", invalid="ignore"):
        return 2.0 * M * (1.0 - (M * dp - sw[i] * sw) / np.sqrt(var[i] * var))


def profile_quadratic(x: np.ndarray) -> np.ndarray:
    sw, _, var, nw = moments(x)
    win = np.lib.stride_tricks.sliding_window_view(x, M)  # (nw, M)
    js = np.arange(nw)
    out = np.full(nw, np.nan)
    for i in range(nw):
        if var[i] <= 0.5:
            continue
        dp = win @ win[i]  # O(nw·m) per window
        d2 = d2_from_dp(dp, i, sw, var)
        mask = (var > 0.5) & (np.abs(js - i) >= EXCL)
        if mask.any():
            out[i] = np.where(mask, d2, np.inf).min()
    return out


def profile_mass(x: np.ndarray) -> np.ndarray:
    sw, _, var, nw = moments(x)
    n = len(x)
    L = 2 * n
    xf = np.fft.rfft(x, L)
    js = np.arange(nw)
    out = np.full(nw, np.nan)
    for i in range(nw):
        if var[i] <= 0.5:
            continue
        qf = np.fft.rfft(x[i : i + M][::-1], L)
        dp = np.fft.irfft(xf * qf, L)[M - 1 : M - 1 + nw]  # O(n log n)
        d2 = d2_from_dp(dp, i, sw, var)
        mask = (var > 0.5) & (np.abs(js - i) >= EXCL)
        if mask.any():
            out[i] = np.where(mask, d2, np.inf).min()
    return out


def main() -> None:
    global M, EXCL
    ns = [int(a) for a in sys.argv[1:]] or [3840, 15360]
    for n in ns:
        for m in (24, 128, 512):
            M, EXCL = m, m // 2
            x = series(n)
            t0 = time.perf_counter()
            pq = profile_quadratic(x)
            tq = time.perf_counter() - t0
            t0 = time.perf_counter()
            pm = profile_mass(x)
            tm = time.perf_counter() - t0
            both = ~(np.isnan(pq) | np.isnan(pm))
            delta = (
                float(np.max(np.abs(pq[both] - pm[both]))) if both.any() else 0.0
            )
            print(
                f"n={n:6d} m={m:4d}  quadratic={tq:8.3f}s  mass={tm:8.3f}s  "
                f"quad/mass={tq / tm:6.2f}x  max|delta|={delta:.2e}"
            )


if __name__ == "__main__":
    main()
