"""Measured scaling curves for the LLM-pipeline heavies (VERDICT r9 #3).

The headline bench set got 1x/8x/64x fitted exponents in SCALE.md
§24; the 100 TB claim, though, rides on the corpus-prep operators.
This experiment sweeps THEM over 1x/4x/16x mints of sf0.1's
documents/embeddings (same key-shift mint as exp_headline_scale:
doc_id/vec_id shifted per copy, text suffixed so dedup output scales
with input instead of collapsing to the 1x distinct set):

- sa_lcp_build         — _build_suffix_array_lcp, the SA+LCP+BWT
                         index CONSTRUCTION the fingerprint cache
                         amortizes (not the cached read). Prefix
                         doubling runs ceil(log2 maxlen) global-sort
                         rounds, so the model is t ~ a * (m log m)^b;
                         we report b fitted on log t vs log m and
                         expect slightly >1 from the log factor.
- neardup_dedup_e2e    — operators/dedup.drop_near_duplicates over
                         documents (shingle → MinHash-LSH bands →
                         Jaccard verify → connected components →
                         keep canonical), the `neardup_dedup`
                         pipeline step's engine.
- semantic_dedup_fixed_k — registry semantic_dedup_end_to_end verbatim:
                         k=8 centroids REGARDLESS of corpus size. The
                         measured pathology (§25): buckets hold n/k
                         vectors, in-bucket pair work ∝ (n/k)², so
                         fixed k ⇒ b → 2.
- semantic_dedup_scaled_k — semantic_dedup_pipeline with k = 8·m (the
                         IVF discipline: bucket occupancy constant);
                         the same corpus scales linearly.
- ann_ivfpq_probe      — registry ann_ivfpq_recall_probe, which
                         REBUILDS the IVF+PQ index per call (coarse
                         k-means + per-subspace Lloyd + ADC): the
                         index-build cost is the scaled part.

Each point: 1 cold + N warm runs (median warm reported). Output: one
JSON line; SCALE.md §25 records the table. Any exponent markedly >1
(beyond sa_lcp_build's log factor) is a defect to fix or tripwire.

Run: python tools/exp_llm_scale.py [warm_reps]   (~20 min at reps=2)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SCALES = tuple(
    int(m) for m in os.environ.get("LLM_SCALE_POINTS", "1,4,16").split(",")
)
WORK = "/tmp/exp_headline_scale"  # shared mint cache with exp_headline_scale


def _ops(spark):
    """name -> zero-arg-per-sf_dir callables returning a DataFrame."""
    from eventstreams_spark import registry
    from eventstreams_spark.operators.dedup import drop_near_duplicates
    from eventstreams_spark.catalog import load_table
    from eventstreams_spark.queries.llm import _build_suffix_array_lcp

    registry._ensure_loaded()

    def sa_build(sf_dir):
        return _build_suffix_array_lcp(spark, sf_dir)

    def neardup(sf_dir):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        return drop_near_duplicates(docs, "text", "doc_id")

    def semantic_fixed(sf_dir):
        # the pinned registry query: k=8 centroids REGARDLESS of
        # corpus size — measures the fixed-bucket pathology (§25)
        return registry.REGISTRY["semantic_dedup_end_to_end"].builder(
            spark, sf_dir
        )

    def semantic_scaled(sf_dir):
        # the production discipline: k ∝ n holds bucket occupancy
        # constant (IVF-style), so pair work scales linearly
        from eventstreams_spark.queries.analysis_extra import (
            semantic_dedup_pipeline,
        )

        m = int(os.path.basename(sf_dir.rstrip("/")).lstrip("x"))
        emb = load_table(spark, sf_dir, "embeddings")
        return semantic_dedup_pipeline(emb, k=8 * m)

    def ivfpq(sf_dir):
        return registry.REGISTRY["ann_ivfpq_recall_probe"].builder(
            spark, sf_dir
        )

    return {
        "sa_lcp_build": sa_build,
        "neardup_dedup_e2e": neardup,
        "semantic_dedup_fixed_k": semantic_fixed,
        "semantic_dedup_scaled_k": semantic_scaled,
        "ann_ivfpq_probe": ivfpq,
    }


def main() -> None:
    warm_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )  # 16g GC-thrashed on the x16 SA build (27M suffix rows):
        # GCLocker retry storms -> task crashes -> shuffle-file loss
        .config("spark.ui.enabled", "false")
        .appName("exp-llm-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from eventstreams_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)

    # reuse exp_headline_scale's mint (x1/x4/x16 dirs are cached there)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exp_headline_scale import mint

    ops = _ops(spark)
    results: dict[str, dict[int, float]] = {q: {} for q in ops}
    for m in SCALES:
        sf_dir = mint(spark, m)
        for name, fn in ops.items():
            warm: list[float] = []
            for run in range(1 + warm_reps):
                t0 = time.perf_counter()
                n = fn(sf_dir).count()
                dt = time.perf_counter() - t0
                if run > 0:
                    warm.append(dt)
            warm.sort()
            results[name][m] = round(warm[len(warm) // 2], 4)
            print(
                f"  x{m} {name}: {results[name][m]:.3f}s ({n} rows)",
                file=sys.stderr,
            )

    lx = [math.log(m) for m in SCALES]
    mx = sum(lx) / len(lx)
    out = {}
    for q, times in results.items():
        if len(SCALES) >= 2:
            ly = [math.log(times[m]) for m in SCALES]
            my = sum(ly) / len(ly)
            b = round(sum(
                (x - mx) * (y - my) for x, y in zip(lx, ly)
            ) / sum((x - mx) ** 2 for x in lx), 3)
        else:
            b = None  # single point (merge run): no fit
        out[q] = {
            **{f"t_x{m}": times[m] for m in SCALES},
            "exponent": b,
        }
    print(json.dumps({
        "experiment": "llm_scale",
        "scales": list(SCALES),
        "warm_reps": warm_reps,
        "loadavg": [round(v, 2) for v in os.getloadavg()],
        "ops": out,
    }))


if __name__ == "__main__":
    main()
