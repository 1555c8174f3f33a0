"""Supply-chain / inventory analytics: Croston's method with the
Syntetos-Boylan approximation (THE intermittent-demand forecaster —
spare parts, slow movers), the newsvendor critical-fractile stock
level, and the safety-stock / reorder-point / EOQ scorecard — the
planning trio every inventory system computes over order history.

Demand frames: Croston runs on per-part daily order units (top parts
still see demand on only ~2% of calendar days — genuinely
intermittent); the newsvendor and safety-stock queries run on
per-priority daily revenue quantized to exact integer DOLLARS (cents
squared would exceed both 2^63 in the integer sum and 2^53 in a
double at sf≥0.1 — dollars keep ΣD² exact through sf1).

Float discipline: units/dollars are exact integers; the Croston fold
applies literal-constant arithmetic in identical order on both
engines (recursive CTE ≡ JVM aggregate fold, the Kalman/adstock
pattern); newsvendor thresholds are interpolated percentiles of
integer dollars (identical interpolation arithmetic); all closed-form
outputs are single-expression functions of exact integer moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_ALPHA = "0.2"  # croston smoothing (both engines parse in DOUBLE context)
_N_PARTS = 5

# daily revenue dollars per order priority, shared by the newsvendor
# and safety-stock oracles
_DAILY_DOLLARS_CTE = """
    daily AS (
        SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
               CAST(floor(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT)) / 100) AS BIGINT) AS dollars
        FROM orders
        GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
    )"""


@query(
    "croston_sba_intermittent",
    category="SC-croston",
    oracle=f"""
        WITH RECURSIVE topp AS (
            SELECT l_partkey AS pk,
                   CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT)
                       AS n_arrivals
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY l_partkey
            ORDER BY n_arrivals DESC, pk LIMIT {_N_PARTS}
        ), day0 AS (
            SELECT min(CAST(o_orderdate AS DATE)) AS d0 FROM orders
        ), arrivals AS (
            SELECT t.pk, t.n_arrivals, CAST(o_orderdate AS DATE) AS day,
                   CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
                        AS BIGINT) AS units,
                   row_number() OVER (PARTITION BY t.pk
                                      ORDER BY CAST(o_orderdate AS DATE))
                       AS rn
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN topp t ON t.pk = l_partkey
            GROUP BY t.pk, t.n_arrivals, CAST(o_orderdate AS DATE)
        ), r AS (
            SELECT pk, n_arrivals, rn, day,
                   CAST(units AS DOUBLE) AS z,
                   CAST(datediff('day', day0.d0, day) + 1 AS DOUBLE) AS p
            FROM arrivals CROSS JOIN day0 WHERE rn = 1
            UNION ALL
            SELECT a.pk, a.n_arrivals, a.rn, a.day,
                   {_ALPHA} * CAST(a.units AS DOUBLE) + (1.0 - {_ALPHA}) * r.z,
                   {_ALPHA} * CAST(datediff('day', r.day, a.day) AS DOUBLE)
                       + (1.0 - {_ALPHA}) * r.p
            FROM r JOIN arrivals a ON a.pk = r.pk AND a.rn = r.rn + 1
        ), final AS (
            SELECT pk, n_arrivals, z, p,
                   row_number() OVER (PARTITION BY pk ORDER BY rn DESC) AS rev
            FROM r
        )
        SELECT pk AS partkey, n_arrivals,
               CAST(round(z, 6) AS DOUBLE) AS last_size,
               CAST(round(p, 6) AS DOUBLE) AS last_interval,
               CAST(round(z / p, 6) AS DOUBLE) AS croston_rate,
               CAST(round((1.0 - {_ALPHA} / 2.0) * z / p, 6) AS DOUBLE)
                   AS sba_rate
        FROM final WHERE rev = 1
        ORDER BY partkey
    """,
)
def croston_sba_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method + SBA for intermittent demand: per part, walk
    the DEMAND ARRIVALS only, smoothing size z ← αd + (1−α)z and
    inter-arrival interval p ← αq + (1−α)p (α=0.2; init z₁ = first
    demand, p₁ = days from history start to first arrival, counting
    inclusively); demand rate = z/p, and the Syntetos-Boylan
    approximation multiplies by (1−α/2) to kill Croston's inversion
    bias. This is the forecaster for series where most periods are
    zero — plain EWMA decays to zero between arrivals.

    Determinism: units and day gaps are exact integers; the fold
    applies identical literal-constant expressions in identical order
    on both engines (recursive CTE ≡ JVM ``aggregate()`` fold).

    Scale: arrivals collapse to |part|×|arrival-days| rows; each
    part's fold packs ≤|arrivals| structs (calendar-bounded) and runs
    in whole-stage codegen — per-million-part forecasting is one
    groupBy + fold, no Python worker, no driver loop.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("day")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_partkey").alias("pk"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("units"),
    )
    joined = li.join(orders, "o_orderkey")
    topp = (
        joined.groupBy("pk")
        .agg(F.countDistinct("day").cast("long").alias("n_arrivals"))
        .orderBy(F.col("n_arrivals").desc(), "pk")
        .limit(_N_PARTS)
    )
    d0 = orders.agg(F.min("day").alias("d0"))
    arrivals = (
        joined.join(F.broadcast(topp), "pk")
        .groupBy("pk", "n_arrivals", "day")
        .agg(F.sum("units").cast("long").alias("units"))
    )
    packed = (
        arrivals.crossJoin(F.broadcast(d0))
        .groupBy("pk", "n_arrivals", "d0")
        .agg(F.array_sort(F.collect_list(F.struct("day", "units"))).alias("series"))
    )
    folded = packed.select(
        "pk", "n_arrivals",
        F.expr(
            f"""
            aggregate(
                series,
                CAST(NULL AS STRUCT<z DOUBLE, p DOUBLE, prev DATE>),
                (acc, a) -> CASE WHEN acc IS NULL THEN
                    struct(CAST(a.units AS DOUBLE) AS z,
                           CAST(datediff(a.day, d0) + 1 AS DOUBLE) AS p,
                           a.day AS prev)
                ELSE
                    struct({_ALPHA}D * CAST(a.units AS DOUBLE)
                               + (1.0D - {_ALPHA}D) * acc.z AS z,
                           {_ALPHA}D * CAST(datediff(a.day, acc.prev) AS DOUBLE)
                               + (1.0D - {_ALPHA}D) * acc.p AS p,
                           a.day AS prev)
                END
            )
            """
        ).alias("st"),
    )
    return (
        folded.select(
            F.col("pk").alias("partkey"), "n_arrivals",
            F.round(F.col("st.z"), 6).alias("last_size"),
            F.round(F.col("st.p"), 6).alias("last_interval"),
            F.round(F.col("st.z") / F.col("st.p"), 6).alias("croston_rate"),
            F.round(
                (1.0 - float(_ALPHA) / 2.0) * F.col("st.z") / F.col("st.p"), 6
            ).alias("sba_rate"),
        )
    )


# newsvendor costs: underage 3, overage 1 -> critical ratio 0.75
_CR = "0.75"


@query(
    "newsvendor_critical_fractile",
    category="SC-newsvendor",
    oracle=f"""
        WITH {_DAILY_DOLLARS_CTE}, stocked AS (
            SELECT prio,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(dollars) AS BIGINT) AS s,
                   quantile_cont(dollars, {_CR}) AS q_star
            FROM daily GROUP BY prio
        )
        SELECT st.prio, st.n_days,
               CAST(round(CAST(st.s AS DOUBLE) / st.n_days, 6) AS DOUBLE)
                   AS mean_demand,
               CAST(round(st.q_star, 6) AS DOUBLE) AS q_star,
               CAST(sum(CASE WHEN d.dollars > st.q_star THEN 1 ELSE 0 END)
                    AS BIGINT) AS short_days,
               CAST(round(sum(CASE WHEN d.dollars > st.q_star
                                   THEN d.dollars - st.q_star
                                   ELSE 0.0 END) / st.n_days, 4) AS DOUBLE)
                   AS exp_short_per_day
        FROM daily d JOIN stocked st ON d.prio = st.prio
        GROUP BY st.prio, st.n_days, st.s, st.q_star
        ORDER BY st.prio
    """,
)
def newsvendor_critical_fractile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking level at the critical fractile: with
    underage cost 3 and overage cost 1, the optimal stock is the
    0.75-quantile of daily demand (CR = cu/(cu+co)); the scorecard
    reports the fractile stock Q*, the share of days demand would
    overshoot it, and the expected daily shortfall E[(D−Q*)⁺] — the
    service-level numbers a replenishment planner reads.

    Determinism: daily demand is exact integer dollars; Q* is the
    interpolated percentile (identical arithmetic both engines);
    shortfall terms are (int − identical-double) differences summed
    over a calendar-bounded frame, rounded at 4.

    Scale: one day-grain rollup, one percentile per group (Spark
    computes it in a single pass), one re-join of the bounded daily
    frame against the 5-row stock table.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.floor(
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
                / 100
            ).cast("long").alias("dollars")
        )
    )
    stocked = daily.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("dollars").cast("long").alias("s"),
        F.expr(f"percentile(dollars, {_CR})").alias("q_star"),
    )
    return (
        daily.join(F.broadcast(stocked), "prio")
        .groupBy("prio", "n_days", "s", "q_star")
        .agg(
            F.sum(F.when(F.col("dollars") > F.col("q_star"), 1).otherwise(0))
            .cast("long").alias("short_days"),
            F.round(
                F.sum(
                    F.when(
                        F.col("dollars") > F.col("q_star"),
                        F.col("dollars") - F.col("q_star"),
                    ).otherwise(0.0)
                )
                / F.col("n_days"),
                4,
            ).alias("exp_short_per_day"),
        )
        .select(
            "prio", "n_days",
            F.round(F.col("s").cast("double") / F.col("n_days"), 6)
            .alias("mean_demand"),
            F.round("q_star", 6).alias("q_star"),
            "short_days", "exp_short_per_day",
        )
    )


# planning constants: z for 95% cycle service, lead time 7 days,
# fixed order cost 5000, holding cost 25/unit-year
_Z95 = "1.6448536269514722"
_LEAD = "7.0"
_K_ORDER = "5000.0"
_H_HOLD = "25.0"


@query(
    "safety_stock_reorder_eoq",
    category="SC-safety",
    oracle=f"""
        WITH {_DAILY_DOLLARS_CTE}, mom AS (
            SELECT prio,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(dollars) AS BIGINT) AS s,
                   CAST(sum(dollars * dollars) AS BIGINT) AS q
            FROM daily GROUP BY prio
        )
        SELECT prio, n_days,
               CAST(round(CAST(s AS DOUBLE) / n_days, 4) AS DOUBLE) AS mu_d,
               CAST(round(sqrt((CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / n_days) * s)
                               / (n_days - 1)), 4) AS DOUBLE) AS sigma_d,
               CAST(round({_Z95} * sqrt((CAST(q AS DOUBLE)
                               - (CAST(s AS DOUBLE) / n_days) * s)
                               / (n_days - 1)) * sqrt({_LEAD}), 4) AS DOUBLE)
                   AS safety_stock,
               CAST(round({_LEAD} * (CAST(s AS DOUBLE) / n_days)
                          + {_Z95} * sqrt((CAST(q AS DOUBLE)
                               - (CAST(s AS DOUBLE) / n_days) * s)
                               / (n_days - 1)) * sqrt({_LEAD}), 4) AS DOUBLE)
                   AS reorder_point,
               CAST(round(sqrt(2.0 * {_K_ORDER} * 365.0
                               * (CAST(s AS DOUBLE) / n_days) / {_H_HOLD}), 4)
                    AS DOUBLE) AS eoq
        FROM mom ORDER BY prio
    """,
)
def safety_stock_reorder_eoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety-stock / reorder-point / EOQ scorecard per priority
    class: SS = z·σ_d·√L (95% cycle service, 7-day lead), ROP =
    L·μ_d + SS, EOQ = √(2·K·D_annual/h) with literal cost constants —
    the three formulas at the heart of every min/max replenishment
    policy.

    Determinism: (n, Σd, Σd²) are exact integer moments (dollars
    squared stay under 2^63 through sf1); every output is ONE
    closed-form double expression over them, identical both engines.

    Scale: one map-side-combinable rollup to day grain, one 5-row
    aggregate — nothing else.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.floor(
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
                / 100
            ).cast("long").alias("dollars")
        )
    )
    mom = daily.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("dollars").cast("long").alias("s"),
        F.sum(F.col("dollars") * F.col("dollars")).cast("long").alias("q"),
    )
    mu = F.col("s").cast("double") / F.col("n_days")
    sigma = F.sqrt(
        (F.col("q").cast("double") - mu * F.col("s")) / (F.col("n_days") - 1)
    )
    z, lead, k, h = float(_Z95), float(_LEAD), float(_K_ORDER), float(_H_HOLD)
    ss = F.lit(z) * sigma * F.sqrt(F.lit(lead))
    return mom.select(
        "prio", "n_days",
        F.round(mu, 4).alias("mu_d"),
        F.round(sigma, 4).alias("sigma_d"),
        F.round(ss, 4).alias("safety_stock"),
        F.round(F.lit(lead) * mu + ss, 4).alias("reorder_point"),
        F.round(F.sqrt(F.lit(2.0 * k * 365.0) * mu / F.lit(h)), 4).alias("eoq"),
    )


@query(
    "abc_xyz_classification",
    category="SC-abcxyz",
    oracle="""
        WITH per_part AS (
            SELECT l_partkey,
                   CAST(sum(floor(l_extendedprice * 100 + 0.5)) AS BIGINT)
                       AS rev_c,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem GROUP BY l_partkey
        ), weekly AS (
            SELECT l_partkey,
                   CAST(floor(epoch(l_shipdate)) AS BIGINT)
                       // 604800 AS wk,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                       AS q
            FROM lineitem
            GROUP BY l_partkey,
                     CAST(floor(epoch(l_shipdate)) AS BIGINT) // 604800
        ), cv AS (
            SELECT l_partkey,
                   CAST(count(*) AS BIGINT) AS n_wk,
                   CAST(sum(q) AS BIGINT) AS sq,
                   CAST(sum(q * q) AS BIGINT) AS sqq
            FROM weekly GROUP BY l_partkey
        ), ranked AS (
            SELECT p.l_partkey, p.rev_c,
                   sum(p.rev_c) OVER (ORDER BY p.rev_c DESC, p.l_partkey)
                       AS cum_rev,
                   sum(p.rev_c) OVER () AS tot_rev,
                   c.n_wk, c.sq, c.sqq
            FROM per_part p JOIN cv c ON c.l_partkey = p.l_partkey
        ), classed AS (
            SELECT l_partkey,
                   CASE WHEN cum_rev * 100 <= tot_rev * 80 THEN 'A'
                        WHEN cum_rev * 100 <= tot_rev * 95 THEN 'B'
                        ELSE 'C' END AS abc,
                   CASE
                     WHEN n_wk <= 1 OR sq = 0 THEN 'Z'
                     WHEN 4 * n_wk * (n_wk * sqq - sq * sq)
                          <= (n_wk - 1) * sq * sq THEN 'X'
                     WHEN n_wk * (n_wk * sqq - sq * sq)
                          <= (n_wk - 1) * sq * sq THEN 'Y'
                     ELSE 'Z' END AS xyz
            FROM ranked
        )
        SELECT abc, xyz,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM classed GROUP BY abc, xyz ORDER BY abc, xyz
    """,
)
def abc_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory classification census: parts classed A/B/C
    by cumulative revenue share (80/95% Pareto cuts) and X/Y/Z by
    weekly-demand variability (CV < 0.5 / < 1.0 / else) — the 9-cell
    matrix that decides stocking policy (AX = automate, CZ = make to
    order). Pairs with croston/newsvendor: XYZ picks WHICH forecast
    model each part deserves.

    Determinism: revenue is exact cents and the ABC cut is the
    integer cross-multiplication cum·100 ≤ tot·80; the CV cuts avoid
    sqrt entirely — CV ≤ c ⇔ c²·n·(nΣq²−(Σq)²) ≤ (n−1)(Σq)² stays
    ALL-INTEGER (c = 1/2 multiplies through as 4).

    Scale: two rollups (part, part×week) and one part-grain join;
    the cumulative revenue share rides
    operators/ranking.py::exact_global_cumsum (range buckets +
    per-bucket sum offsets — NO single-partition window over the
    part dimension), and the grand total comes free from its bucket
    offsets instead of an unbounded-frame window.
    """
    from ..operators.ranking import exact_global_cumsum
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5))
        .cast("long").alias("rev_c"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
    weekly = li.groupBy(
        "l_partkey",
        (F.floor(F.unix_timestamp("l_shipdate")) / 604800)
        .cast("long")
        .alias("wk"),
    ).agg(F.sum(F.floor("l_quantity").cast("long")).cast("long").alias("q"))
    cv = weekly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_wk"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
    )
    from ..operators.graph import truncate_lineage

    # part-grain frame with 3 reads inside the cumsum construction —
    # checkpoint so none of them re-derives the two lineitem rollups
    joined = truncate_lineage(
        per_part.join(cv, "l_partkey").withColumn(
            "nrev", -F.col("rev_c")
        ),
        8,
    )
    cum, tot_rev = exact_global_cumsum(
        joined, ["nrev", "l_partkey"], "rev_c",
        cum_col="cum_rev", with_total=True,
    )
    ranked = cum.select(
        "l_partkey", "n_wk", "sq", "sqq", "cum_rev",
        F.lit(int(tot_rev)).cast("long").alias("tot_rev"),
    )
    var_num = F.col("n_wk") * (
        F.col("n_wk") * F.col("sqq") - F.col("sq") * F.col("sq")
    )
    var_den = (F.col("n_wk") - 1) * F.col("sq") * F.col("sq")
    classed = ranked.select(
        F.when(F.col("cum_rev") * 100 <= F.col("tot_rev") * 80, "A")
        .when(F.col("cum_rev") * 100 <= F.col("tot_rev") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        F.when((F.col("n_wk") <= 1) | (F.col("sq") == 0), "Z")
        .when(4 * var_num <= var_den, "X")
        .when(var_num <= var_den, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        classed.groupBy("abc", "xyz")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )


@query(
    "revenue_bridge_price_volume",
    category="SC-bridge",
    oracle="""
        WITH months AS (
            SELECT CAST(strftime(min(l_shipdate), '%Y-%m') AS VARCHAR) AS m0,
                   CAST(strftime(max(l_shipdate), '%Y-%m') AS VARCHAR) AS m1
            FROM lineitem
        ), per AS (
            SELECT l_partkey,
                   CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS m,
                   CAST(sum(floor(l_extendedprice * 100 + 0.5)) AS BIGINT)
                       AS rev_c,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                       AS qty
            FROM lineitem
            GROUP BY l_partkey, CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR)
        ), sides AS (
            SELECT p.l_partkey,
                   max(CASE WHEN p.m = mo.m0 THEN p.rev_c END) AS r0,
                   max(CASE WHEN p.m = mo.m0 THEN p.qty END) AS q0,
                   max(CASE WHEN p.m = mo.m1 THEN p.rev_c END) AS r1,
                   max(CASE WHEN p.m = mo.m1 THEN p.qty END) AS q1
            FROM per p CROSS JOIN months mo
            WHERE p.m = mo.m0 OR p.m = mo.m1
            GROUP BY p.l_partkey
        ), effects AS (
            SELECT
                CAST(sum(CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL
                    THEN ((r1 * 1000) // q1 - (r0 * 1000) // q0) * q1
                    ELSE 0 END) AS BIGINT) AS price_eff_mc,
                CAST(sum(CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL
                    THEN ((r0 * 1000) // q0) * (q1 - q0)
                    ELSE 0 END) AS BIGINT) AS volume_eff_mc,
                CAST(sum(CASE WHEN r0 IS NULL THEN r1 * 1000
                    ELSE 0 END) AS BIGINT) AS new_parts_mc,
                CAST(sum(CASE WHEN r1 IS NULL THEN -r0 * 1000
                    ELSE 0 END) AS BIGINT) AS lost_parts_mc,
                CAST(sum(coalesce(r1, 0) - coalesce(r0, 0)) AS BIGINT)
                    AS total_delta_c,
                CAST(sum(CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL
                    THEN (r1 * 1000 - ((r1 * 1000) // q1) * q1)
                       - (r0 * 1000 - ((r0 * 1000) // q0) * q0)
                    ELSE 0 END) AS BIGINT) AS residual_mc
            FROM sides
        )
        SELECT CAST(round(price_eff_mc / 100000.0, 6) AS DOUBLE)
                   AS price_effect,
               CAST(round(volume_eff_mc / 100000.0, 6) AS DOUBLE)
                   AS volume_effect,
               CAST(round(new_parts_mc / 100000.0, 6) AS DOUBLE)
                   AS new_parts_effect,
               CAST(round(lost_parts_mc / 100000.0, 6) AS DOUBLE)
                   AS lost_parts_effect,
               CAST(round(residual_mc / 100000.0, 6) AS DOUBLE)
                   AS rounding_residual,
               CAST(round(total_delta_c / 100.0, 6) AS DOUBLE)
                   AS total_revenue_delta,
               (price_eff_mc + volume_eff_mc + new_parts_mc + lost_parts_mc
                + residual_mc = total_delta_c * 1000) AS bridge_closes
        FROM effects
    """,
)
def revenue_bridge_price_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix revenue bridge between the first and last
    shipping month: Δrevenue decomposed into price effect
    Σ(p₁−p₀)q₁, volume effect Σp₀(q₁−q₀), new-part and lost-part
    contributions — the FP&A waterfall behind every "why did revenue
    move" review, with ``bridge_closes`` pinning that the effects sum
    EXACTLY to the total (the property hand-built bridges silently
    lose).

    Determinism: unit prices are integer MILLI-CENTS via BIGINT DIV
    (r·1000 // q); every effect is a sum of integer products; the DIV
    remainders are carried as an explicit rounding_residual term so
    the bridge identity is exact by construction, not approximately.

    Scale: one part×month rollup, a conditional pivot to part grain,
    one aggregate — the fact table never joins anything.
    """
    li = load_table(spark, sf_dir, "lineitem")
    months = li.agg(
        F.date_format(F.min("l_shipdate"), "yyyy-MM").alias("m0"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM").alias("m1"),
    )
    per = li.groupBy(
        "l_partkey", F.date_format("l_shipdate", "yyyy-MM").alias("m")
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5))
        .cast("long").alias("rev_c"),
        F.sum(F.floor("l_quantity").cast("long")).cast("long").alias("qty"),
    )
    sides = (
        per.crossJoin(F.broadcast(months))
        .filter((F.col("m") == F.col("m0")) | (F.col("m") == F.col("m1")))
        .groupBy("l_partkey")
        .agg(
            F.max(F.when(F.col("m") == F.col("m0"), F.col("rev_c"))).alias("r0"),
            F.max(F.when(F.col("m") == F.col("m0"), F.col("qty"))).alias("q0"),
            F.max(F.when(F.col("m") == F.col("m1"), F.col("rev_c"))).alias("r1"),
            F.max(F.when(F.col("m") == F.col("m1"), F.col("qty"))).alias("q1"),
        )
    )
    both = F.col("r0").isNotNull() & F.col("r1").isNotNull()
    p0 = F.expr("(r0 * 1000) DIV q0")
    p1 = F.expr("(r1 * 1000) DIV q1")
    effects = sides.agg(
        F.sum(F.when(both, (p1 - p0) * F.col("q1")).otherwise(0))
        .cast("long").alias("price_eff_mc"),
        F.sum(F.when(both, p0 * (F.col("q1") - F.col("q0"))).otherwise(0))
        .cast("long").alias("volume_eff_mc"),
        F.sum(F.when(F.col("r0").isNull(), F.col("r1") * 1000).otherwise(0))
        .cast("long").alias("new_parts_mc"),
        F.sum(F.when(F.col("r1").isNull(), -F.col("r0") * 1000).otherwise(0))
        .cast("long").alias("lost_parts_mc"),
        F.sum(
            F.coalesce(F.col("r1"), F.lit(0))
            - F.coalesce(F.col("r0"), F.lit(0))
        ).cast("long").alias("total_delta_c"),
        F.sum(
            F.when(
                both,
                (F.col("r1") * 1000 - p1 * F.col("q1"))
                - (F.col("r0") * 1000 - p0 * F.col("q0")),
            ).otherwise(0)
        ).cast("long").alias("residual_mc"),
    )
    return effects.select(
        F.round(F.col("price_eff_mc") / 100000.0, 6).alias("price_effect"),
        F.round(F.col("volume_eff_mc") / 100000.0, 6).alias("volume_effect"),
        F.round(F.col("new_parts_mc") / 100000.0, 6).alias("new_parts_effect"),
        F.round(F.col("lost_parts_mc") / 100000.0, 6).alias(
            "lost_parts_effect"
        ),
        F.round(F.col("residual_mc") / 100000.0, 6).alias(
            "rounding_residual"
        ),
        F.round(F.col("total_delta_c") / 100.0, 6).alias(
            "total_revenue_delta"
        ),
        (
            F.col("price_eff_mc")
            + F.col("volume_eff_mc")
            + F.col("new_parts_mc")
            + F.col("lost_parts_mc")
            + F.col("residual_mc")
            == F.col("total_delta_c") * 1000
        ).alias("bridge_closes"),
    )


@query(
    "weighted_interval_scheduling",
    category="OPT-scheduling",
    oracle="""
        WITH sess AS (
            SELECT event_type, CAST(ts AS DATE) AS day, user_id,
                   CAST(min(epoch(ts)) AS BIGINT) AS st,
                   CAST(max(epoch(ts)) AS BIGINT) AS en,
                   CAST(count(*) AS BIGINT) AS w
            FROM events
            GROUP BY event_type, CAST(ts AS DATE), user_id
        ), top60 AS (
            SELECT *, row_number() OVER (
                       PARTITION BY event_type, day
                       ORDER BY w DESC, user_id) AS wr
            FROM sess
        ), cand AS (
            SELECT event_type, day, user_id, st, en, w,
                   row_number() OVER (
                       PARTITION BY event_type, day
                       ORDER BY en, user_id) AS i
            FROM top60 WHERE wr <= 60
        ), gsz AS (
            SELECT event_type, day,
                   CAST(count(*) AS BIGINT) AS n_candidates,
                   CAST(sum(w) AS BIGINT) AS total_w
            FROM cand GROUP BY event_type, day
        ), dp AS (
            WITH RECURSIVE walk AS (
                SELECT event_type, day, 0 AS i,
                       CAST('-1' AS VARCHAR) AS ends_s,
                       CAST('0' AS VARCHAR) AS dps_s,
                       CAST(0 AS BIGINT) AS best
                FROM gsz
                UNION ALL
                SELECT q.event_type, q.day, q.i,
                       q.ends_s || '|' || CAST(q.en AS VARCHAR),
                       q.dps_s || '|' || CAST(q.dp_i AS VARCHAR),
                       q.dp_i
                FROM (
                    SELECT w2.event_type, w2.day, w2.i, w2.ends_s,
                           w2.dps_s, w2.en,
                           greatest(w2.best, w2.w + w2.best_p) AS dp_i
                    FROM (
                        SELECT wk.event_type, wk.day, wk.i + 1 AS i,
                               wk.ends_s, wk.dps_s, wk.best,
                               c.st, c.en, c.w,
                               CAST(coalesce(
                                 list_filter(
                                   list_zip(
                                     string_split(wk.ends_s, '|'),
                                     string_split(wk.dps_s, '|')),
                                   p -> CAST(p[1] AS BIGINT) <= c.st
                                 )[-1][2], '0') AS BIGINT) AS best_p
                        FROM walk wk
                        JOIN cand c
                          ON c.event_type = wk.event_type
                         AND c.day = wk.day AND c.i = wk.i + 1
                    ) w2
                ) q
            ) SELECT event_type, day, best
              FROM walk w
              WHERE i = (SELECT max(i) FROM walk x
                         WHERE x.event_type = w.event_type
                           AND x.day = w.day)
        )
        SELECT g.event_type, g.day, g.n_candidates, g.total_w,
               d.best AS best_w,
               CAST(round(d.best * 1.0 / g.total_w, 6) AS DOUBLE)
                   AS kept_ratio
        FROM gsz g JOIN dp d USING (event_type, day)
        ORDER BY g.event_type, g.day
    """,
)
def weighted_interval_scheduling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WEIGHTED INTERVAL SCHEDULING per (channel, day) — the classic
    DP (CLRS 16 / Kleinberg-Tardos 6.1): from each day's user
    sessions on a channel (interval = [first event, last event],
    weight = event count), pick the max-weight NON-OVERLAPPING subset
    — the exclusive-slot allocation every scheduling surface
    (ad slots, maintenance windows, single-consumer takeovers) runs.
    dp_i = max(dp_{i-1}, w_i + dp_{p(i)}) over candidates sorted by
    end time, where p(i) is the last candidate ending at or before
    i's start.

    The DP is a PINNED-ORDER JVM fold (F.aggregate over the per-group
    sorted candidate array): the accumulator carries the (end, dp)
    prefix, p(i) is an in-accumulator filter-last lookup (end <=
    start), and the emitted best is exact integer weight. The oracle
    replays the identical recursion as a recursive CTE whose state
    carries the same two prefixes as '|'-strings — every dp cell
    rides the hash via the final (best_w, kept_ratio).

    Scale: sessions are one keyed rollup; candidates are CAPPED at
    the 60 heaviest per group (WindowGroupLimit — the documented
    bounded-DP contract: schedule the 60 most valuable candidates;
    depth and accumulator are O(60) regardless of data volume), so
    the fold state is bounded metadata per group and groups
    parallelize freely. All integers except the final ratio.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        "user_id",
    ).agg(
        F.min(F.unix_timestamp("ts")).cast("long").alias("st"),
        F.max(F.unix_timestamp("ts")).cast("long").alias("en"),
        F.count(F.lit(1)).cast("long").alias("w"),
    )
    wtop = Window.partitionBy("event_type", "day").orderBy(
        F.col("w").desc(), "user_id"
    )
    cand = sess.withColumn("wr", F.row_number().over(wtop)).filter(
        F.col("wr") <= 60
    )
    grouped = cand.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum("w").cast("long").alias("total_w"),
        F.array_sort(
            F.collect_list(F.struct("en", "user_id", "st", "w"))
        ).alias("cands"),
    )
    # pinned-order DP fold: acc = array<struct<en,dp>> seeded with the
    # (-1, 0) sentinel so the p(i) filter-last lookup never empties
    dp_expr = F.expr(
        """
        element_at(
          aggregate(
            cands,
            array(named_struct('en', CAST(-1 AS BIGINT),
                               'dp', CAST(0 AS BIGINT))),
            (acc, c) -> array_append(
              acc,
              named_struct(
                'en', c.en,
                'dp', greatest(
                  element_at(acc, -1).dp,
                  c.w + element_at(
                    filter(acc, a -> a.en <= c.st), -1).dp))
            )
          ), -1).dp
        """
    ).cast("long")
    return (
        grouped.select(
            "event_type", "day", "n_candidates", "total_w",
            dp_expr.alias("best_w"),
        )
        .select(
            "event_type", "day", "n_candidates", "total_w", "best_w",
            F.round(F.col("best_w") / F.col("total_w"), 6)
            .alias("kept_ratio"),
        )
    )
