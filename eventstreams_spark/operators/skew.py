"""Skew mitigation: salting (SCALE.md §3, SURVEY §4.2).

AQE's skew-join splitting handles skewed *joins* automatically, but
two shapes still serialize on a hot key at 100 TB:

- **skewed aggregation**: one reducer owns the hot key's partition —
  AQE cannot split a single group. Fix: two-phase salted agg
  (``salted_agg``): aggregate on (key, salt) first — the hot key's
  rows spread over ``n_salts`` reducers — then combine the partials
  per key. Works for any reassociable aggregate (sum/count/min/max,
  and avg via sum+count).
- **skewed join against a non-broadcastable mid-size side**
  (``salted_join``): salt the skewed side's key with rand-free
  ``pmod(hash(row-unique), n)`` and EXPLODE the other side n× so every
  (key, salt) pair still meets. Shuffle volume: skewed side unchanged,
  other side ×n — choose n ≈ hot-key-rows / target-partition-rows.

Both are pure plan builders; no configuration, no driver-side
statistics needed (pick ``n_salts`` from the known hot-key profile, or
leave AQE to handle mild skew and reserve salting for the
bot-user/null-key pathologies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-phase aggregation with a salt spreading each key's rows.

    ``aggs``: output_name → (function, column), function in
    {sum, count, min, max}. The partial phase computes per
    (keys, salt); the final phase combines partials per keys —
    count combines by sum, min/max by themselves.

    ``salt_source``: a column expression whose hash spreads rows
    (default: ``monotonically_increasing_id()`` — row-unique, no RNG,
    deterministic per partition layout).
    """
    supported = {"sum", "count", "min", "max"}
    for name, (fn, _col) in aggs.items():
        if fn not in supported:
            raise ValueError(f"{name}: {fn!r} not reassociable (use sum/count/min/max)")
    src = salt_source if salt_source is not None else F.monotonically_increasing_id()
    if isinstance(src, str):
        src = F.col(src)
    salted = df.withColumn("_salt", F.pmod(F.hash(src), F.lit(n_salts)))

    partial_aggs = [
        getattr(F, fn)(col).alias(f"_p_{name}") for name, (fn, col) in aggs.items()
    ]
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)

    combine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    final_aggs = [
        getattr(F, combine[fn])(f"_p_{name}").alias(name)
        for name, (fn, _col) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is pathological.

    The skewed side gets a per-row salt; ``other`` is exploded to all
    ``n_salts`` values so every (key, salt) partition pair joins.
    Equivalent rows to a plain join (verified by test); shuffle of the
    skewed side is now uniform over key×salt.
    """
    s = skewed.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return s.join(o, [on, "_salt"], how).drop("_salt")
