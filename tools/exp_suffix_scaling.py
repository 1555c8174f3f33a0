#!/usr/bin/env python3
"""Measure suffix-array prefix-doubling scaling across SFs: rounds
(should grow with log2 of max DOC length, not corpus size), wall
time of construction vs the bounded string-carry certifier, and
corpus stats. Writes one JSON line per SF; evidence for SCALE.md.

Usage: python tools/exp_suffix_scaling.py [sf_dir ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    sfs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from eventstreams_spark.catalog import load_table
    # measure the CONSTRUCTION, not the materialization cache
    from eventstreams_spark.queries.llm import (
        _build_suffix_array_lcp as _suffix_array_lcp_frame,
    )

    for sf in sfs:
        docs = load_table(spark, sf, "documents")
        n_docs, n_chars, max_len = docs.agg(
            F.count(F.lit(1)), F.sum(F.length("text")),
            F.max(F.length("text")),
        ).head()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        frame = _suffix_array_lcp_frame(spark, sf)
        t_build = time.perf_counter() - t0
        t1 = time.perf_counter()
        stats = frame.agg(
            F.count(F.lit(1)).alias("n"),
            F.max("lcp_next").alias("lrs"),
            F.min(F.col("ok").cast("int")).alias("sorted_ok"),
        ).head()
        t_certify = time.perf_counter() - t1
        print(json.dumps({
            "sf_dir": sf, "n_docs": n_docs, "n_chars": int(n_chars),
            "max_doc_len": max_len,
            "n_suffixes": stats["n"], "lrs_len": stats["lrs"],
            "sorted_ok": bool(stats["sorted_ok"]),
            "t_construct_s": round(t_build, 2),
            "t_certify_s": round(t_certify, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
