"""A-series: aggregation operators (SURVEY §2.5).

Float discipline: single-table sums are bit-exact across engines (scan
order); anything summed after a join/shuffle uses exact_money_sum;
multi-pass statistics (stddev/var/corr) round to a fixed precision on
BOTH sides because the engines' accumulation algebra differs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import exact_money_sum
from ..registry import query


@query(
    "agg_count_distinct_users_per_type",
    category="A2",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               count(DISTINCT user_id % 10) AS n_user_buckets
        FROM events
        GROUP BY event_type
    """,
)
def agg_count_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count + multi count-distinct (expand + two-phase aggregate).

    Scale: exact distinct costs an Expand (row multiplication per
    distinct column); for dashboards at 100 TB prefer
    approx_count_distinct (HLL++) — covered by a tolerance unit test
    since approx results can't hash-match an oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.col("user_id") % 10).alias("n_user_buckets"),
    )


@query(
    "agg_collect_sorted",
    category="A4",
    oracle="""
        -- nations is serialized to a CSV string on BOTH sides: array-typed
        -- result columns crash the driver canonicalizer (unhashable list).
        SELECT r_name,
               array_to_string(list(n_name ORDER BY n_name), ',') AS nations,
               count(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list wrapped in sort_array — the only deterministic form
    (collect order is partition-arrival order otherwise). The array is
    serialized with concat_ws for the comparison: list-valued result
    columns are unhashable in the driver's canonicalizer."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@query(
    "agg_rollup_nation_region",
    category="A5",
    oracle="""
        SELECT r_name, n_name,
               count(*) AS n_customers,
               sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_money_sum(F.col("c_acctbal"), 100).alias("total_acctbal"),
        )
    )


@query(
    "agg_percentile_exact",
    category="A6",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY event_type
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`), rounded 6dp — the interpolation arithmetic
    differs in the last ulps between engines.

    Scale: exact percentile sorts each group; at 100 TB switch to
    percentile_approx (t-digest class, mergeable sketches).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query(
    "agg_stats_value_by_type",
    category="A7",
    oracle="""
        SELECT event_type,
               round(avg(value), 6)         AS avg_value,
               round(stddev_samp(value), 6) AS sd_value,
               round(var_samp(value), 6)    AS var_value,
               round(corr(value, CAST(json_extract(props, '$.k') AS INTEGER)), 6) AS corr_vk
        FROM events
        GROUP BY event_type
    """,
)
def agg_stats_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates; 6dp rounding on both sides (the engines
    use different one-pass update formulas). Skewness/kurtosis are
    exercised in unit tests instead: DuckDB's definitions include bias
    corrections Spark's don't, so no rounding reconciles them."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.corr(F.col("value"), k), 6).alias("corr_vk"),
    )


@query(
    "agg_pivot_event_type",
    category="A9",
    oracle="""
        SELECT user_id % 10 AS user_bucket,
               count(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
               count(CASE WHEN event_type = 'view'     THEN 1 END) AS view,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               count(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
               count(CASE WHEN event_type = 'error'    THEN 1 END) AS error
        FROM events
        GROUP BY user_bucket
    """,
)
def agg_pivot_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never inferred — inference
    is a separate job and nondeterministic column order)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    piv = (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # pivot yields NULL for empty cells; oracle's count(CASE) yields 0
    return piv.select(
        "user_bucket", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


@query(
    "agg_conditional_casewhen",
    category="A11",
    oracle="""
        SELECT l_linestatus,
               sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END) AS returned_value,
               count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted,
               sum(l_quantity) FILTER (WHERE l_tax > 0.04) AS taxed_qty
        FROM lineitem
        GROUP BY l_linestatus
    """,
)
def agg_conditional_casewhen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: sum(when), count_if, FILTER clause."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)).alias(
            "returned_value"
        ),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_discounted"),
        F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_quantity"))).alias("taxed_qty"),
    )


@query(
    "udaf_weighted_avg",
    category="A12",
    oracle="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS weighted_avg_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate via GROUPED_AGG pandas_udf (Arrow path).

    Demonstrates the §2.10 UDAF surface; numpy's pairwise summation
    differs from sequential SQL sums, hence 4dp rounding on both
    sides. Built-in expressions remain the preferred path — this
    exists to prove the extension point.
    """
    li = load_table(spark, sf_dir, "lineitem")

    @F.pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 4).alias("weighted_avg_price")
    )


@query(
    "agg_cube_grouping_sets",
    category="A5",
    oracle="""
        SELECT coalesce(r_name, 'ALL') AS region,
               coalesce(n_name, 'ALL') AS nation,
               count(*) AS n_suppliers,
               -- outer CAST: sum(BIGINT) is HUGEINT in DuckDB -> float64 in
               -- the driver canonicalizer -> hash red vs Spark int64
               CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY CUBE (r_name, n_name)
    """,
)
def agg_cube_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, nation): all four grouping sets in one pass
    (A5 companion to agg_rollup_nation_region, which only walks the
    hierarchy). NULL group markers are collapsed to 'ALL' sentinels so
    the result is oracle-hashable (neither dim contains real NULLs).

    Money is summed as half-up-rounded cents (BIGINT) on both sides —
    order-insensitive and exact after the join reshuffles row order.
    Scale: two broadcast joins (nation/region are tiny) then ONE
    partial+final hash aggregate over the Expand (4 grouping sets =
    4x map-side rows, combined before the single shuffle).
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.cube("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("long")).alias(
                "acctbal_cents"
            ),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_suppliers",
            "acctbal_cents",
        )
    )


@query(
    "agg_histogram_width_bucket",
    category="A14-histogram",
    oracle="""
        SELECT CASE WHEN value < 0 THEN 0
                    WHEN value >= 500 THEN 26
                    ELSE CAST(floor(value / 20.0) AS BIGINT) + 1 END AS bucket,
               count(*) AS n,
               min(value) AS min_v,
               max(value) AS max_v
        FROM events
        GROUP BY bucket
    """,
)
def agg_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-range histogram via ``width_bucket(value, 0, 500, 25)``
    (25 equi-width bins + underflow 0 / overflow 26) — the value
    distribution profile every metrics backend exposes.

    The oracle states the binning arithmetic explicitly, pinning
    width_bucket's edge conventions (left-closed bins, overflow =
    n+1). One partial+final hash aggregate; bucket ids are dense
    small ints so the shuffle is trivially skew-free.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.width_bucket("value", F.lit(0.0), F.lit(500.0), F.lit(25)).alias(
                "bucket"
            )
        )
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )


@query(
    "agg_grouping_sets_explicit",
    category="A5-gsets",
    oracle="""
        SELECT coalesce(r_name, 'ALL') AS region,
               coalesce(n_name, 'ALL') AS nation,
               grouping(r_name) AS g_region,
               grouping(n_name) AS g_nation,
               count(*) AS n_suppliers
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
    """,
)
def agg_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the non-hierarchical sibling of
    cube/rollup: exactly the (region), (nation), (grand-total) sets,
    NOT their cross product. grouping() markers disambiguate a real
    'ALL' value from a set-collapsed slot.

    Planned as one Expand (3x map-side rows) feeding a single
    partial+final aggregate — same single-shuffle shape as cube.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).createOrReplaceTempView("_gs_sup")
    return spark.sql(
        """
        SELECT coalesce(r_name, 'ALL') AS region,
               coalesce(n_name, 'ALL') AS nation,
               grouping(r_name) AS g_region,
               grouping(n_name) AS g_nation,
               count(*) AS n_suppliers
        FROM _gs_sup
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """
    )


@query(
    "agg_distinct_hll_mergeable",
    category="A3-sketch",
    oracle="""
        SELECT event_type,
               count(DISTINCT CAST(ts AS DATE)) AS n_daily_sketches,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS union_within_5pct
        FROM events
        GROUP BY event_type
    """,
)
def agg_distinct_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting (Apache DataSketches HLL):
    build one sketch per (day, event_type) partial, then union the
    per-day sketches into a per-type total — the ONLY layout that lets
    a 100 TB pipeline maintain rolling distincts incrementally (per-day
    sketches persist; re-aggregation unions bytes instead of rescanning
    raw events; approx_count_distinct's HLL++ cannot be re-merged once
    estimated).

    SELF-CERTIFYING since r4 (rows-only through r3): the estimate
    itself is engine-specific, so the output states the sketch-count
    deterministically instead — per type, the number of daily sketches
    unioned, the exact distinct-user count, and a verdict that the
    unioned HLL estimate landed within 5% of exact (lgK=12 → rsd
    ~1.6%). The oracle asserts the same counts and an all-TRUE
    verdict; a drifting union fails the hash. The unit test keeps the
    tighter relative-error bound.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12)).alias("sk"),
        F.collect_set("user_id").alias("users"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_daily_sketches"),
            F.size(F.array_distinct(F.flatten(F.collect_list("users")))).cast(
                "long"
            ).alias("exact_users"),
            (
                F.abs(
                    F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("double")
                    - F.size(
                        F.array_distinct(F.flatten(F.collect_list("users")))
                    ).cast("double")
                )
                <= 0.05
                * F.size(F.array_distinct(F.flatten(F.collect_list("users"))))
            ).alias("union_within_5pct"),
        )
    )


@query(
    "agg_approx_percentile_sketch",
    category="A6-approx",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.45), 6) AS p45_exact,
               round(quantile_cont(value, 0.55), 6) AS p55_exact,
               TRUE AS p50_in_band,
               TRUE AS p99_in_band
        FROM events
        GROUP BY event_type
    """,
)
def agg_approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch, accuracy 10000):
    the mergeable replacement for exact per-group sorts once groups
    stop fitting in memory — partials combine map-side like any agg.

    SELF-CERTIFYING since r4 (rows-only through r3): GK output is
    engine-specific, so the query emits the exact p45/p55 band
    (cross-engine via the agg_percentile_exact convention) plus
    verdicts that each GK estimate lies inside its exact band — GK
    rank error is 1/10000 ≪ the 0.05 band half-width, and a discrete
    in-band data value is bracketed by the interpolated band edges
    once groups exceed ~60 rows (the smallest test group is ~190);
    the oracle asserts the bands and all-TRUE verdicts. The unit test
    keeps the tighter neighboring-exact-rank bound.
    """
    ev = load_table(spark, sf_dir, "events")
    gk = ev.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("p99_approx"),
        F.round(F.percentile("value", F.lit(0.45)), 6).alias("p45_exact"),
        F.round(F.percentile("value", F.lit(0.55)), 6).alias("p55_exact"),
        F.percentile("value", F.lit(0.98)).alias("_p98"),
        F.max("value").alias("_vmax"),
    )
    return gk.select(
        "event_type",
        "p45_exact",
        "p55_exact",
        (
            (F.col("p50_approx") >= F.col("p45_exact"))
            & (F.col("p50_approx") <= F.col("p55_exact"))
        ).alias("p50_in_band"),
        (
            (F.col("p99_approx") >= F.col("_p98"))
            & (F.col("p99_approx") <= F.col("_vmax"))
        ).alias("p99_in_band"),
    )


@query(
    "agg_listagg_bool_mode",
    category="A15-misc",
    oracle="""
        SELECT r_name,
               string_agg(n_name, '|' ORDER BY n_name) AS nations_csv,
               bool_or(n_nationkey > 20)  AS any_high_key,
               bool_and(n_nationkey >= 0) AS all_nonneg,
               count(*) FILTER (WHERE n_nationkey % 2 = 0) AS n_even,
               min(n_name) AS mode_first_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
)
def agg_listagg_bool_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining everyday aggregate family: ordered string
    concatenation (listagg/string_agg), boolean any/every, filtered
    count, and a DETERMINISTIC mode. Spark's ``mode()`` breaks
    frequency ties arbitrarily, so the cross-engine-safe form is
    max_by/min_by over (count, value) — here every name is unique per
    group, making mode == lexicographic min, stated identically in
    both engines.

    listagg is collect_list + sort + concat_ws: the sort is bounded by
    group size, and the whole thing is one partial+final aggregate.
    """
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias(
                "nations_csv"
            ),
            F.bool_or(F.col("n_nationkey") > 20).alias("any_high_key"),
            F.bool_and(F.col("n_nationkey") >= 0).alias("all_nonneg"),
            F.count_if(F.col("n_nationkey") % 2 == 0).alias("n_even"),
            F.min("n_name").alias("mode_first_name"),
        )
    )


@query(
    "agg_decile_equidepth",
    category="A14-equidepth",
    oracle="""
        WITH ranked AS (
            SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS decile
            FROM events
        )
        SELECT decile, count(*) AS n,
               min(value) AS lo, max(value) AS hi
        FROM ranked GROUP BY decile
    """,
)
def agg_decile_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth binning (ntile deciles): equal ROW counts per bucket
    with data-driven boundaries — the complement of width_bucket's
    fixed-width bins. The total-order tiebreak (value, event_id) makes
    bucket membership deterministic.

    Scale-safe form (VERDICT r01): NO unpartitioned ntile window. The
    exact global rank comes from operators/ranking.exact_global_rank —
    approx-percentile range buckets + per-bucket row_number + bucket
    offsets (two bounded metadata jobs, one data shuffle, sorts capped
    at ~N/32) — and the decile is derived from the rank with the exact
    SQL ntile fill formula. Result is bit-identical to the oracle's
    single-partition ntile for any boundary choice; the global ntile
    survives only in the DuckDB oracle as the reference semantics.
    """
    from ..operators.ranking import exact_global_rank, ntile_from_rank

    ev = load_table(spark, sf_dir, "events").select("value", "event_id")
    # total comes free from the construction's bucket counts — no
    # separate full scan, and the input is cached across its 3 reads
    ranked, total = exact_global_rank(
        ev, ["value", "event_id"], rank_col="rnk", with_total=True
    )
    deciled = ranked.withColumn("decile", ntile_from_rank(F.col("rnk"), total, 10))
    return deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@query(
    "agg_bitwise_try_arith",
    category="A16-bitwise",
    oracle="""
        SELECT event_type,
               bit_and(CAST(user_id % 256 AS BIGINT)) AS band,
               bit_or(CAST(user_id % 256 AS BIGINT))  AS bor,
               bit_xor(CAST(user_id % 256 AS BIGINT)) AS bxor,
               CAST(sum(CASE WHEN floor(value) = 0 THEN NULL
                        ELSE CAST(100 // CAST(floor(value) AS BIGINT) AS BIGINT) END)
                   AS BIGINT) AS sum_try_div,
               count(*) AS n
        FROM events
        GROUP BY event_type
    """,
)
def agg_bitwise_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and/bit_or/bit_xor — flag-mask
    rollups) plus ANSI-safe division: under Spark 4's ANSI mode,
    ``100 div value`` on a zero would throw mid-job, so try_divide
    yields NULL and sum skips it — the oracle states the same NULL
    contract with CASE. Divisors go through explicit floor() on BOTH
    sides: DuckDB CAST(double AS BIGINT) rounds half-even while Spark
    cast truncates (recorded in tests/oracle_conventions.md). All single-pass, partial+final.
    """
    ev = load_table(spark, sf_dir, "events")
    ub = (F.col("user_id") % 256).cast("long")
    return ev.groupBy("event_type").agg(
        F.bit_and(ub).alias("band"),
        F.bit_or(ub).alias("bor"),
        F.bit_xor(ub).alias("bxor"),
        F.sum(
            F.try_divide(F.lit(100), F.floor("value").cast("long")).cast("long")
        ).alias("sum_try_div"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_minby_maxby",
    category="A17-argminmax",
    oracle="""
        SELECT event_type,
               arg_min(event_id, value * 1000000 + event_id) AS min_value_event,
               arg_max(event_id, value * 1000000 + event_id) AS max_value_event,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY event_type
    """,
)
def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/arg-max aggregates (which row held the extreme): the
    agg-form alternative to the window row_number pattern — one
    partial+final aggregate, no per-group sort. Ordered by the
    composite value*1e6+event_id because 2-decimal values collide
    within groups and bare min_by/max_by tie-breaking is
    engine-arbitrary.
    """
    ev = load_table(spark, sf_dir, "events")
    order = F.col("value") * 1000000 + F.col("event_id")
    return ev.groupBy("event_type").agg(
        F.min_by("event_id", order).alias("min_value_event"),
        F.max_by("event_id", order).alias("max_value_event"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query(
    "agg_linear_regression",
    category="A18-regr",
    oracle="""
        SELECT event_type,
               round(regr_slope(value, CAST(json_extract(props, '$.k') AS INTEGER)), 6)
                   AS slope,
               round(regr_intercept(value, CAST(json_extract(props, '$.k') AS INTEGER)), 6)
                   AS intercept,
               round(regr_r2(value, CAST(json_extract(props, '$.k') AS INTEGER)), 6)
                   AS r2,
               CAST(regr_count(value, CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
                   AS n_pairs
        FROM events
        GROUP BY event_type
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares regression aggregates (y = value on x = the JSON
    payload's k): slope, intercept, R², pair count — the one-pass
    sufficient-statistics form (sums of x, y, xy, x², shared with
    corr), so trend fitting is a partial+final aggregate, never an
    iterative solver. 6dp rounding: the engines accumulate the
    sufficient statistics in different orders.
    """
    ev = load_table(spark, sf_dir, "events")
    x = F.get_json_object("props", "$.k").cast("int")
    y = F.col("value")
    return ev.groupBy("event_type").agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).cast("long").alias("n_pairs"),
    )


@query(
    "agg_regression_family",
    category="A7-regr",
    oracle="""
        SELECT event_type,
               CAST(regr_count(value, (epoch_us(ts) - 1704067200000000)
                                      / 86400000000.0) AS BIGINT) AS n,
               round(regr_slope(value, (epoch_us(ts) - 1704067200000000)
                                       / 86400000000.0), 6) AS slope,
               round(regr_intercept(value, (epoch_us(ts) - 1704067200000000)
                                           / 86400000000.0), 6) AS intercept,
               round(regr_r2(value, (epoch_us(ts) - 1704067200000000)
                                    / 86400000000.0), 6) AS r2
        FROM events
        WHERE value IS NOT NULL
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def agg_regression_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_slope / intercept /
    r2 / count): trend-per-group in ONE pass — the aggregate form of
    the T14 trend detector (rolling_trend_corr is its windowed twin).

    Conditioning (oracle_conventions): x is days-since-2024-01-01 as
    a small double, NOT raw epoch micros — the naive parameterization
    squares a 1.7e15 offset inside the sums and the cross-engine
    accumulation drift survives rounding. With x ∈ [0, ~400] the
    moment sums stay well inside double precision and round(6) pins
    them. Scale: map-side-combinable moments (count, Σx, Σy, Σxy,
    Σx², Σy²) — one shuffle, same cost class as avg.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = (F.unix_micros("ts") - F.lit(1704067200000000)) / 86400000000.0
    return (
        ev.groupBy("event_type")
        .agg(
            F.regr_count(F.col("value"), x).cast("long").alias("n"),
            F.round(F.regr_slope(F.col("value"), x), 6).alias("slope"),
            F.round(F.regr_intercept(F.col("value"), x), 6).alias("intercept"),
            F.round(F.regr_r2(F.col("value"), x), 6).alias("r2"),
        )
    )
