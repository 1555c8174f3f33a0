"""Measure Aho-Corasick single-pass vs K separate substring passes
(SCALE.md §20): the automaton's per-doc cost is ~flat in the
watchlist size K, while the no-multi-pattern alternative (one
JVM substring-count aggregation per keyword) grows linearly in K.

Usage: python tools/exp_aho_scaling.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from eventstreams_spark.catalog import load_table  # noqa: E402
from eventstreams_spark.queries.secops_extra import (  # noqa: E402
    _AC_WATCHLIST,
)

VOCAB = (
    "scan column window order sort part agg value line key join "
    "merge group query data table filter stream batch spark row "
    "hash small slow fast big dup customer"
).split()


def watchlist(k: int) -> list[str]:
    """First k entries of a deterministic keyword list: the real
    watchlist, then sliced vocab substrings (lengths 3..6)."""
    base = list(_AC_WATCHLIST)
    for w in VOCAB:
        for ln in (3, 4, 5, 6):
            if len(w) >= ln and w[:ln] not in base:
                base.append(w[:ln])
    return base[:k]


def ac_scan(docs, kws):
    import pandas as pd
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from eventstreams_spark.queries import secops_extra as se

    fn_src = se.aho_corasick_watchlist_scan  # reuse module automaton
    # rebuild the scan closure locally with the given keyword list
    def build_ac(words):
        nxt = [{}]
        out = [[]]
        for wi, w in enumerate(words):
            node = 0
            for ch in w:
                if ch not in nxt[node]:
                    nxt.append({})
                    out.append([])
                    nxt[node][ch] = len(nxt) - 1
                node = nxt[node][ch]
            out[node].append(wi)
        fail = [0] * len(nxt)
        queue = list(nxt[0].values())
        i = 0
        while i < len(queue):
            node = queue[i]
            i += 1
            for ch, child in nxt[node].items():
                f = fail[node]
                while f and ch not in nxt[f]:
                    f = fail[f]
                fail[child] = (
                    nxt[f][ch]
                    if (ch in nxt[f] and nxt[f][ch] != child)
                    else 0
                )
                out[child] = out[child] + out[fail[child]]
                queue.append(child)
        return nxt, fail, out

    def scan(it):
        nxt, fail, out = build_ac(kws)
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                counts = [0] * len(kws)
                node = 0
                for ch in text:
                    while node and ch not in nxt[node]:
                        node = fail[node]
                    node = nxt[node].get(ch, 0)
                    for wi in out[node]:
                        counts[wi] += 1
                for wi, c in enumerate(counts):
                    if c:
                        rows.append((kws[wi], int(doc_id), c))
            yield pd.DataFrame(rows, columns=["keyword", "doc_id", "n"])

    schema = StructType([
        StructField("keyword", StringType()),
        StructField("doc_id", LongType()),
        StructField("n", LongType()),
    ])
    return (
        docs.mapInPandas(scan, schema)
        .groupBy("keyword")
        .agg(F.sum("n").alias("n"))
    )


def naive_passes(docs, kws):
    """One JVM aggregate() substring-count pass PER keyword."""
    totals = {}
    for w in kws:
        L = len(w)
        cnt = docs.select(
            F.expr(
                f"aggregate(sequence(1, length(text) - {L} + 1), 0L,"
                f" (acc, o) -> acc + IF(substring(text, o, {L})"
                f" = '{w}', 1L, 0L))"
            ).alias("c")
        ).agg(F.sum("c")).head()[0]
        totals[w] = cnt
    return totals


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).persist()
    n = docs.count()
    print(f"docs={n} sf_dir={sf_dir}")
    for k in (15, 60):
        kws = watchlist(k)
        t0 = time.time()
        ac = {r["keyword"]: r["n"] for r in ac_scan(docs, kws).collect()}
        t_ac = time.time() - t0
        t0 = time.time()
        nv = naive_passes(docs, kws)
        t_nv = time.time() - t0
        agree = all(ac.get(w, 0) == nv[w] for w in kws)
        print(
            f"K={k}: ac={t_ac:.2f}s naive_k_passes={t_nv:.2f}s "
            f"agree={agree}"
        )


if __name__ == "__main__":
    main()
