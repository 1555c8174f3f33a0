"""Deterministic sampling primitives.

md5_uniform mints a reproducible uniform in (0,1) from a SQL
expression — the RNG-free basis of the Efraimidis-Spirakis weighted
samplers: stable across runs, engines, partitionings, and restarts
because it is a pure projection of the data itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_uniform(expr_sql: str) -> Column:
    """Uniform in (0,1) from the first 8 hex digits of md5(expr_sql),
    parsed positionally (locate over the hex alphabet — no engine-
    specific hex-to-int builtin needed). EXACT twin of
    queries/_shared.py::md5_uniform_sql — change both together.
    """
    u = F.lit(0.0)
    for i in range(1, 9):
        digit = F.expr(
            f"locate(substr(md5({expr_sql}), {i}, 1), '0123456789abcdef') - 1"
        )
        u = u + digit * float(16 ** (8 - i))
    return (u + 0.5) / float(16**8)
