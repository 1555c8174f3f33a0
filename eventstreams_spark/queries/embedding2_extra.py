"""Embedding retrieval II: Matryoshka prefix-dimension recall and
sign-binarized Hamming recall — the two modern cheap-retrieval tricks
(MRL-style truncation; 1-bit quantization) evaluated EXACTLY against
full-precision cosine, extending the L3/L4 family (exact knn, LSH /
IVF / PQ ANN, sign-LSH near-dup live elsewhere).

Both queries are hash-checkable because every quantity is exact: the
candidate sets are complete (one broadcast-query scan, no sampling),
ranks are minted over 6dp-rounded scores with id tiebreaks (the
rounded-score total order from oracle_conventions), Hamming distances
are integers, and recall is a count of set intersections — so unlike
the ANN recall probes (rows-only), these cheap-retrieval evaluations
certify their own numbers.

Scale: one scan of the embedding table per query vector (broadcast
1-row query), TakeOrdered heaps for the top-k lists, intersection on
k-row frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import cosine_similarity, to_double_array
from ..registry import query

_PREFIX = 16
_K = 10


@query(
    "matryoshka_prefix_recall",
    category="L4-mrl",
    oracle=f"""
        WITH q AS (
            SELECT embedding FROM embeddings WHERE vec_id = 0
        ), scored AS (
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])), 6) AS full_sim,
                   round(list_cosine_similarity(
                       CAST(e.embedding[1:{_PREFIX}] AS DOUBLE[]),
                       CAST(q.embedding[1:{_PREFIX}] AS DOUBLE[])), 6)
                       AS prefix_sim
            FROM embeddings e, q WHERE e.vec_id <> 0
        ), fr AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY full_sim DESC, vec_id) AS r
            FROM scored
        ), pr AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY prefix_sim DESC, vec_id) AS r
            FROM scored
        )
        SELECT CAST({_K} AS BIGINT) AS k,
               CAST({_PREFIX} AS BIGINT) AS prefix_dims,
               CAST((SELECT count(*) FROM fr JOIN pr USING (vec_id)
                     WHERE fr.r <= {_K} AND pr.r <= {_K}) AS BIGINT)
                   AS n_overlap,
               CAST((SELECT count(*) FROM scored) AS BIGINT) AS n_candidates
    """,
)
def matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncated retrieval, evaluated exactly: rank
    all candidates against query vec 0 by full-64-dim cosine AND by
    first-{_PREFIX}-dim prefix cosine, and count the top-10 overlap —
    the recall@k a team measures before shipping truncated embeddings
    (¼ the bytes, most of the recall). Unlike the ANN probes this is
    EXHAUSTIVE on both sides, so the overlap is an exact integer and
    the whole result hash-checks.

    Scale: both rankings share ONE scan with the 1-row query
    broadcast; prefix cosine is a slice before the same zip_with
    fold. The unpartitioned rank windows are BOUNDED by the planner:
    row_number + filter r <= K pushes down as
    TakeOrderedAndProject(limit=K) (LimitPushDownThroughWindow), so
    each input partition ships a K-row heap and the single-partition
    window sees K rows total — plan-asserted in test_plans.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        to_double_array("embedding").alias("qe")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                cosine_similarity(to_double_array("embedding"), F.col("qe")), 6
            ).alias("full_sim"),
            F.round(
                cosine_similarity(
                    to_double_array(F.slice("embedding", 1, _PREFIX)),
                    F.slice("qe", 1, _PREFIX),
                ),
                6,
            ).alias("prefix_sim"),
        )
    )
    fr = scored.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("full_sim").desc(), "vec_id"))
    ).filter(F.col("r") <= _K)
    pr = scored.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("prefix_sim").desc(), "vec_id"))
    ).filter(F.col("r") <= _K)
    overlap = fr.join(pr, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    n_cand = scored.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    return (
        overlap.crossJoin(F.broadcast(n_cand))
        .select(
            F.lit(_K).cast("long").alias("k"),
            F.lit(_PREFIX).cast("long").alias("prefix_dims"),
            "n_overlap",
            "n_candidates",
        )
    )


@query(
    "binary_hamming_recall",
    category="L4-binary",
    oracle=f"""
        WITH q AS (
            SELECT embedding FROM embeddings WHERE vec_id = 0
        ), scored AS (
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])), 6) AS full_sim,
                   CAST(list_sum([CASE WHEN (e.embedding[i] > 0)
                                            <> (q.embedding[i] > 0)
                                       THEN 1 ELSE 0 END
                                  FOR i IN range(1, 65)]) AS BIGINT)
                       AS hamming
            FROM embeddings e, q WHERE e.vec_id <> 0
        ), fr AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY full_sim DESC, vec_id) AS r
            FROM scored
        ), hr AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY hamming, vec_id) AS r
            FROM scored
        )
        SELECT CAST({_K} AS BIGINT) AS k,
               CAST((SELECT count(*) FROM fr JOIN hr USING (vec_id)
                     WHERE fr.r <= {_K} AND hr.r <= {_K}) AS BIGINT)
                   AS n_overlap,
               CAST((SELECT min(hamming) FROM scored) AS BIGINT)
                   AS min_hamming,
               CAST((SELECT max(hamming) FROM scored) AS BIGINT)
                   AS max_hamming
    """,
)
def binary_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit embedding quantization, evaluated exactly: binarize every
    dimension by sign, rank candidates by integer Hamming distance to
    the binarized query, and count the overlap with the exact-cosine
    top-10 — the 64×-compression recall check (binary embeddings are
    the storage floor for billion-vector stores; rerank-with-floats
    recovers the rest). Hamming distances are exact integers from the
    same zip_with fold family as the cosine; ranks tiebreak on id.

    Scale: one scan + broadcast query; the XOR-popcount is a bounded
    64-term fold per row inside codegen — at 100 TB the real layout
    packs bits into longs and uses bit_count, the same plan shape.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        to_double_array("embedding").alias("qe")
    )
    hamming = F.aggregate(
        F.zip_with(
            "embedding",
            "qe",
            lambda x, y: ((x > 0) != (y > 0)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                cosine_similarity(to_double_array("embedding"), F.col("qe")), 6
            ).alias("full_sim"),
            hamming.alias("hamming"),
        )
    )
    fr = scored.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("full_sim").desc(), "vec_id"))
    ).filter(F.col("r") <= _K)
    hr = scored.withColumn(
        "r", F.row_number().over(Window.orderBy("hamming", "vec_id"))
    ).filter(F.col("r") <= _K)
    overlap = fr.join(hr, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    hstats = scored.agg(
        F.min("hamming").cast("long").alias("min_hamming"),
        F.max("hamming").cast("long").alias("max_hamming"),
    )
    return overlap.crossJoin(F.broadcast(hstats)).select(
        F.lit(_K).cast("long").alias("k"),
        "n_overlap",
        "min_hamming",
        "max_hamming",
    )
