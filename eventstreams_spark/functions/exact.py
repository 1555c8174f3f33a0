"""Cross-engine bit-exact aggregation helpers.

Problem (SURVEY.md §5.2 determinism rules): a double SUM's value
depends on accumulation order. Single-table scans aggregate in file
order in both engines (bit-exact), but any sum AFTER a join/shuffle
accumulates in engine-specific order — at revenue magnitudes ~1e6 the
drift reaches ~1e-3, which an exact value-hash flags as a mismatch.

Fix: the per-row PRODUCT of identical doubles is bit-identical across
engines (IEEE 754, same expression tree). So scale each row's value to
an exact integer, sum as bigint (order-insensitive, exact), and divide
back once. The matching oracle-SQL pattern is:

    sum(CAST(floor(<expr> * 10000 + 0.5) AS BIGINT)) / 10000.0

Totals up to 2^53/1e4 ≈ 9e11 stay exact — far above any sf here; at
true 100 TB scale widen the scale factor or keep the scaled bigint.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_SCALE = 10_000  # 4 decimal digits: price(2dp) × discount(2dp)


def exact_money_sum(expr: Column, scale: int = MONEY_SCALE) -> Column:
    """Order-insensitive, cross-engine-exact SUM of a money-like double."""
    scaled = F.floor(expr * scale + F.lit(0.5)).cast("long")
    return F.sum(scaled) / F.lit(float(scale))
