"""Product quantization: codebook shape, encode determinism, ADC
self-retrieval, recall probe plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstreams_spark.catalog import load_table
from eventstreams_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_train,
    split_subvectors,
)

M, K = 8, 16


def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )


def test_split_subvectors_covers_vector(spark, sf_dir):
    subs = split_subvectors(emb(spark, sf_dir).limit(3), "vec", "vec_id", M)
    rows = subs.collect()
    assert len(rows) == 3 * M
    assert all(len(r["subvec"]) == 64 // M for r in rows)
    # reassembling sub_id order restores the original vector length
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["vid"], []).append((r["sub_id"], r["subvec"]))
    for vid, parts in by_vid.items():
        flat = [x for _, sv in sorted(parts) for x in sv]
        assert len(flat) == 64


def test_codebooks_and_codes_shape(spark, sf_dir):
    e = emb(spark, sf_dir)
    cb = pq_train(e, "vec", "vec_id", m=M, k=K, n_iters=1)
    assert cb.count() == M * K
    assert cb.select("sub_id").distinct().count() == M
    codes = pq_encode(e.limit(20), "vec", "vec_id", cb, m=M)
    rows = codes.collect()
    assert len(rows) == 20
    assert all(len(r["codes"]) == M for r in rows)
    assert all(0 <= c < K for r in rows for c in r["codes"])


def test_encode_is_deterministic(spark, sf_dir):
    e = emb(spark, sf_dir)
    cb = pq_train(e, "vec", "vec_id", m=M, k=K, n_iters=2)
    c1 = {r["vid"]: r["codes"] for r in pq_encode(e, "vec", "vec_id", cb, m=M).collect()}
    c2 = {r["vid"]: r["codes"] for r in pq_encode(e, "vec", "vec_id", cb, m=M).collect()}
    assert c1 == c2


def test_adc_retrieves_encoded_query_first(spark, sf_dir):
    """Searching with vector v against a corpus CONTAINING v must rank
    v first: ADC(v, codes(v)) is the minimal quantization error."""
    e = emb(spark, sf_dir)
    cb = pq_train(e, "vec", "vec_id", m=M, k=K, n_iters=2)
    codes = pq_encode(e, "vec", "vec_id", cb, m=M)
    q = e.filter(F.col("vec_id") == 0).select(F.col("vec").alias("qvec"))
    top = pq_adc_topk(codes, cb, q, "qvec", 1, M).collect()
    assert top[0]["vid"] == 0


def test_ivfpq_rerank_recall_hits_ivf_ceiling(spark, sf_dir):
    """With exact re-rank of the ADC shortlist, hybrid recall must be
    bounded by (and typically equal) IVF candidate coverage — PQ
    quantization error must not cost recall below the pruning level."""
    from eventstreams_spark import registry

    registry._ensure_loaded()
    row = registry.REGISTRY["ann_ivfpq_recall_probe"].builder(
        spark, sf_dir
    ).collect()[0]
    assert 0.0 < row["candidate_frac"] < 1.0
    assert row["recall_at_5"] >= 0.2  # sanity floor at tiny sf
