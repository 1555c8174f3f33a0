"""Multi-dimensional data layout: z-order clustering for scan pruning.

Parquet skips row groups / files via min-max stats, which only helps
if values are clustered. Sorting clusters ONE column; interleaving the
bits of several columns (Morton / z-order curve) clusters ALL of them
partially, so point/range predicates on ANY of the z-columns touch
~N^(1/d) of the files instead of all of them. This is the standard
lakehouse OPTIMIZE ZORDER BY layout, built here from plain Spark
expressions: bin each column to a fixed-width integer, interleave the
bits, range-partition + sort by the interleaved key, write.

All driver-side work is two tiny aggregates (per-column min/max); the
binning + interleave is a narrow map, and the clustered write is one
range exchange — the same cost as any global sort-write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; 2 dims * 16 bits = 32-bit z-key (fits BIGINT).
DEFAULT_BITS = 16


def _bin_linear(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linearly bin a numeric column into [0, 2^bits) (clamped)."""
    n = (1 << bits) - 1
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    scaled = F.floor((col.cast("double") - lo) / span * n)
    return F.greatest(F.lit(0), F.least(F.lit(n), scaled)).cast("long")


def zorder_key(binned: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Interleave the bits of pre-binned integer columns (Morton code).

    With d columns, output bit (i*d + j) = bit i of column j — a pure
    shift/or expression tree that stays in whole-stage codegen.
    """
    d = len(binned)
    terms = []
    for j, c in enumerate(binned):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def rewrite_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the
    z-order curve over ``cols``.

    Bin bounds come from one min/max aggregate (collected as 2*d
    scalars, never rows); repartitionByRange on the z-key gives files
    with disjoint z-ranges, and the within-file sort tightens each
    file's per-column min-max stats so the parquet reader can skip.
    """
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    binned = [
        _bin_linear(
            F.col(c),
            F.lit(float(bounds[f"lo_{c}"])),
            F.lit(float(bounds[f"hi_{c}"])),
            bits,
        )
        for c in cols
    ]
    zkey = zorder_key(binned, bits)
    (
        df.withColumn("_zkey", zkey)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
