"""Public-Suffix-List suffix matching as broadcast joins.

The pipeline ``tld`` step (pipeline.py::_tld) resolves multi-label
suffixes with an 18-entry when-chain — fine for a hot shortlist,
wrong shape for the real PSL (~9k rules: a 9k-deep when-chain won't
codegen). This module is the data-driven form: rules live in a
packaged text file (eventstreams_spark/data/public_suffix_subset.txt,
a curated subset of publicsuffix.org — swapping in the full list is a
file replacement), each host mints its last-1..4 label candidate
suffixes as four columns, each candidate left-joins the broadcast
rule table, and the LONGEST matching rule wins via coalesce in
longest-first order (the PSL's prevailing-rule algorithm, restricted
to this subset's rule shapes: no wildcard/exception rules —
documented limitation). Unmatched hosts fall back to the last label,
matching the ``tld`` step's documented fallback. A host EQUAL to a
rule is a pure public suffix (suffix = host, NULL sld/domain); a
dotless unmatched host ('localhost') gets suffix = '' and
sld = domain = host.

Scale: the rule table is a few-KB broadcast hit 4×; every join is a
map-side BroadcastHashJoin, there is NO explode, NO groupBy, and row
identity/multiplicity is untouched — the operator composes into any
plan as a pure per-row enrichment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PSL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_subset.txt",
)

_MAX_SUFFIX_LABELS = 4


def load_psl(spark: SparkSession) -> DataFrame:
    """The packaged PSL subset as a DataFrame of rules
    (comments/blank lines dropped, lowercased)."""
    with open(_PSL_PATH, encoding="utf-8") as fh:
        rules = [
            ln.strip().lower()
            for ln in fh
            if ln.strip() and not ln.strip().startswith("//")
        ]
    return spark.createDataFrame([(r,) for r in rules], "suffix string")


def extract_registered_domain(
    df: DataFrame, host_col: str, psl: DataFrame, out: str = "psl"
) -> DataFrame:
    """Append a struct column ``out`` = (suffix, sld, domain) resolved
    against the PSL rule table by longest-suffix match. ``domain`` is
    the registered (registrable) domain: sld + '.' + suffix. Hosts
    matching no rule fall back to suffix = last label.
    """
    labels = F.split(F.lower(F.col(host_col)), r"\.")
    n = F.size(labels)
    cur = df.withColumn("_host_lc", F.lower(F.col(host_col)))
    # candidate suffixes, one column per length; the k == n candidate
    # is minted too so a host EQUAL to a rule (e.g. 'co.uk') matches —
    # PSL prevailing-rule behavior: such a host is a pure public
    # suffix and has NO registrable domain (sld/domain come out NULL)
    for k in range(1, _MAX_SUFFIX_LABELS + 1):
        cur = cur.withColumn(
            f"_c{k}",
            F.when(
                n >= F.lit(k),
                F.array_join(F.slice(labels, n - F.lit(k) + 1, F.lit(k)), "."),
            ),
        )
    # one broadcast left join per candidate length
    for k in range(1, _MAX_SUFFIX_LABELS + 1):
        rules_k = psl.filter(
            F.size(F.split("suffix", r"\.")) == k
        ).withColumnRenamed("suffix", f"_m{k}")
        cur = cur.join(
            F.broadcast(rules_k), cur[f"_c{k}"] == rules_k[f"_m{k}"], "left"
        )
    suffix = F.coalesce(
        *[F.col(f"_m{k}") for k in range(_MAX_SUFFIX_LABELS, 0, -1)],
        F.regexp_extract("_host_lc", r"\.([^.]+)$", 1),
    )
    rest = F.expr(
        "substring(_host_lc, 1, length(_host_lc) - length(_suffix_c) - 1)"
    )
    # three edge shapes besides the common case:
    #  - host == matched rule → pure public suffix: NULL sld/domain
    #  - dotless unmatched host ('localhost') → empty suffix; sld and
    #    domain are the host itself (no substring/concat mangling)
    is_pure_suffix = F.col("_suffix_c") == F.col("_host_lc")
    no_suffix = F.col("_suffix_c") == ""
    sld_raw = F.regexp_extract(rest, r"([^.]+)$", 1)
    sld = (
        F.when(is_pure_suffix, F.lit(None).cast("string"))
        .when(no_suffix, F.col("_host_lc"))
        .otherwise(sld_raw)
    )
    domain = (
        F.when(is_pure_suffix, F.lit(None).cast("string"))
        .when(no_suffix, F.col("_host_lc"))
        .when(sld_raw != "", F.concat_ws(".", sld_raw, F.col("_suffix_c")))
        .otherwise(F.col("_suffix_c"))
    )
    drop_cols = (
        ["_host_lc", "_suffix_c"]
        + [f"_c{k}" for k in range(1, _MAX_SUFFIX_LABELS + 1)]
        + [f"_m{k}" for k in range(1, _MAX_SUFFIX_LABELS + 1)]
    )
    return (
        cur.withColumn("_suffix_c", suffix)
        .withColumn(
            out,
            F.struct(
                F.col("_suffix_c").alias("suffix"),
                sld.alias("sld"),
                domain.alias("domain"),
            ),
        )
        .drop(*drop_cols)
    )
