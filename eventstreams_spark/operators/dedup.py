"""Deduplication operators (SURVEY §2.11 L1/L2): exact and near-dup.

Exact dedup keeps a deterministic winner per content hash; near-dup
builds MinHash-LSH candidates (see queries/llm.py for the full banded
construction with oracle). SimHash offers a one-signature alternative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def content_fingerprint(text: Column) -> Column:
    """128-bit content hash (md5 hex) — the exact-dedup key."""
    return F.md5(text.cast("binary"))


def drop_exact_duplicates(df: DataFrame, text_col: str, order_col: str) -> DataFrame:
    """Keep one deterministic winner (lowest ``order_col``) per distinct
    ``text_col`` content.

    row_number()=1 over (hash, order) rather than dropDuplicates: the
    winner is stable across partitionings, which dropDuplicates does
    not guarantee. Scale: one shuffle on the 16-byte digest; text
    itself never shuffles if the plan prunes it after hashing.
    """
    w = Window.partitionBy("_fp").orderBy(order_col)
    return (
        df.withColumn("_fp", content_fingerprint(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def simhash64_signature(tokens: Column, n_bits: int = 64) -> Column:
    """SimHash signature as a long, pure Catalyst exprs.

    Each token hashes to 64 bits (xxhash64); signature bit b is the
    sign of Σ_tokens (bit(token_hash, b) ? +1 : -1). Near-dup
    candidates = small Hamming distance between signatures. The bit
    loop unrolls in Python (shift amounts must be literals), producing
    one JVM expression tree — O(tokens × n_bits) per row, no shuffle.
    """
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def fold_bit(b: int) -> Column:
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        weight = (1 << b) if b < 63 else -(1 << 63)  # bit 63 = sign bit of long
        return F.when(votes >= 0, F.lit(weight).cast("long")).otherwise(F.lit(0).cast("long"))

    sig = fold_bit(0)
    for b in range(1, n_bits):
        sig = sig + fold_bit(b)
    return sig


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures."""
    return F.bit_count(a.bitwiseXOR(b))


def rolling_hash_fingerprint(tokens: Column, window: int = 8, keep: int = 4) -> Column:
    """Karp-Rabin rolling-hash document fingerprint (winnowing-lite).

    Hash every ``window``-token gram with xxhash64 over its joined text,
    then keep the ``keep`` smallest hashes (bottom-k sketch of the gram
    set) as a sorted array — robust to small edits anywhere outside the
    changed grams. Spark-only (xxhash64); cross-engine fingerprinting
    uses the md5 bottom-k form in queries/textqa.py.

    Scale: map-side only — O(tokens × window) concat + hash per row,
    then an array sort of doc-bounded size; no shuffle.
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (window - 1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens, i, window))),
    )
    # sequence(1, n) counts DOWN when n < 1 — guard short docs explicitly
    return F.when(
        F.size(tokens) >= window, F.slice(F.array_sort(F.array_distinct(grams)), 1, keep)
    ).otherwise(F.array().cast("array<bigint>"))
