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


def token_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-gram token shingles (lowercased [a-z]+ words) as an
    array — the similarity-join set representation. Map-side only."""
    ws = F.filter(F.split(F.lower(text), "[^a-z]+"), lambda x: x != "")
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.array_join(F.slice(ws, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def minhash_band_candidates(
    shingled: DataFrame,
    id_col: str,
    shingle_col: str,
    *,
    n_hashes: int = 16,
    band_size: int = 2,
) -> DataFrame:
    """MinHash-LSH candidate pairs (id1 < id2) from a (id, shingles)
    frame — the MMDS banded construction: per-seed min of md5(seed |
    shingle) is the MinHash; ``band_size`` consecutive signatures
    concatenate into a band key; any shared (band, key) bucket emits
    the pair. One shuffle per stage, no doc×doc comparison anywhere;
    collision probability per band = J^band_size, so recall at a
    Jaccard threshold is tuned by (n_hashes, band_size) exactly as in
    queries/llm.neardup_minhash_candidates (the oracle-checked
    construction this generalizes)."""
    if n_hashes % band_size:
        raise ValueError("n_hashes must be a multiple of band_size")
    seeds = (
        shingled.sparkSession.range(n_hashes)
        .select(F.col("id").alias("_seed"))
    )
    exploded = shingled.select(
        F.col(id_col).alias("_id"), F.explode(shingle_col).alias("_sh")
    )
    mh = (
        exploded.crossJoin(F.broadcast(seeds))
        .groupBy("_id", "_seed")
        .agg(
            F.min(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("_seed").cast("string"),
                            F.lit("|"),
                            F.col("_sh"),
                        ).cast("binary")
                    ),
                    1,
                    16,
                )
            ).alias("_h")
        )
    )
    # band signature is SEED-POSITIONAL (ADVICE r9 #2): collect
    # (seed, hash) structs and array_sort — struct ordering sorts by
    # _seed first, so the concat reads the hashes in seed order
    # regardless of collect_list's arrival order. A multiset
    # signature (sorting the hashes alone) would let cross-seed
    # coincidences collide, inflating candidates beyond the MMDS
    # J^band_size per-band probability this construction is tuned by.
    bands = mh.groupBy(
        "_id", F.floor(F.col("_seed") / band_size).alias("_band")
    ).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_seed", "_h"))),
                lambda s: s["_h"],
            ),
        ).alias("_sig")
    )
    b1 = bands.select(F.col("_id").alias("id1"), "_band", "_sig")
    b2 = bands.select(F.col("_id").alias("id2"), "_band", "_sig")
    return (
        b1.join(b2, ["_band", "_sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def drop_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.6,
    n_hashes: int = 16,
    band_size: int = 2,
    ngram: int = 3,
) -> DataFrame:
    """Near-duplicate DEDUP keeping one canonical doc per duplicate
    cluster: shingle → MinHash-LSH candidates → exact-Jaccard verify
    at ``threshold`` → connected components → keep each cluster's
    min-``id_col`` member plus every unclustered row. The generic
    form of queries/textqa.neardup_dedup_end_to_end (which pins the
    same composition against a recursive-CTE oracle on injected
    duplicates); candidates here come from LSH banding instead of a
    known injection list, so it runs on arbitrary corpora.

    Scale: every stage is a bounded-key shuffle (id, band, pair);
    verification joins shingle ARRAYS only for LSH-surviving pairs;
    CC is the log-round min-label propagation. No doc×doc blowup."""
    from .graph import connected_components

    shingled = df.select(
        F.col(id_col).alias("_id"),
        token_shingles(F.col(text_col), ngram).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    cand = minhash_band_candidates(
        shingled, "_id", "_sh", n_hashes=n_hashes, band_size=band_size
    )
    a = shingled.select(F.col("_id").alias("id1"), F.col("_sh").alias("_sh1"))
    b = shingled.select(F.col("_id").alias("id2"), F.col("_sh").alias("_sh2"))
    inter = F.size(F.array_intersect("_sh1", "_sh2"))
    union = F.size("_sh1") + F.size("_sh2") - inter
    verified = (
        cand.join(a, "id1")
        .join(b, "id2")
        .filter(inter / F.greatest(union, F.lit(1)) >= threshold)
        .select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    )
    cc = connected_components(verified, "src", "dst")
    losers = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("_loser")
    )
    return df.join(
        losers, df[id_col] == losers["_loser"], "left_anti"
    )
