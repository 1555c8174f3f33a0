"""Centralized table loading — the single oracle-parity chokepoint.

Every query MUST read tables through ``load_table``/``register_views``
(SURVEY.md §7 M0.2): the events table needs the ns→µs timestamp
conversion (SURVEY.md §1.4) and any drift between how our engine and
the DuckDB oracle see the data breaks every hash check.

Scale notes: reads are plain ``spark.read.parquet`` — columnar
vectorized scan with predicate pushdown and column pruning left to
Catalyst. At 100 TB these paths would be date-partitioned directories;
the loader keeps a single entry point so partition-pruning hints /
bucketing specs can be added in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Plan cache: reusing the same DataFrame object lets Spark reuse shuffle
# output across repeated runs of identical lineage and avoids re-reading
# the footer/schema on every builder call. Keyed by session appId so a
# restarted session never sees stale plans.
_df_cache: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with oracle-parity normalization applied."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _df_cache.get(key)
    if cached is not None:
        return cached
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Parquet TIMESTAMP(NANOS) arrives as ns-since-epoch bigint under
        # nanosAsLong. Integer `div` (not `/`) keeps the arithmetic exact:
        # bigint/int promotes to double whose 53-bit mantissa cannot hold
        # ~1.7e18 ns values. Verified lossless: all ts have zero sub-µs
        # component at every sf (SURVEY.md §1.4).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Defensive: if NTZ inference is active anyway (static conf on an odd
    # build), normalize every TIMESTAMP_NTZ column to TIMESTAMP_LTZ. With
    # session tz pinned to UTC the cast is epoch-identical to DuckDB's
    # naive read, and LTZ is the type every oracle check was verified on.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    _df_cache[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views named exactly as the oracle does."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
