"""Statistical-test operators (A/B experimentation analytics).

The three workhorse tests an event-analytics engine runs on metric
streams: Welch's t (means under unequal variance), Mann-Whitney U
(rank-based, outlier-robust), and the chi-square independence test
(categorical × categorical). All are one-or-two-aggregate plans over
the fact table; the only windows run on bounded post-aggregation
frames (≤ distinct-bucket cardinality), never on raw events.

Float discipline: test statistics round to 6 (moment accumulation
order differs across engines — oracle_conventions); all counts and
rank sums are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "welch_t_test",
    category="ST1-ttest",
    oracle="""
        WITH g AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 'treat'
                        ELSE 'ctrl' END AS grp,
                   value
            FROM events
            WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
        ), s AS (
            SELECT grp, count(*) AS n, avg(value) AS m,
                   var_samp(value) AS v
            FROM g GROUP BY grp
        )
        SELECT t.n AS n_treat, c.n AS n_ctrl,
               round(t.m - c.m, 6) AS mean_diff,
               round((t.m - c.m) / sqrt(t.v / t.n + c.v / c.n), 6)
                   AS t_stat,
               round(pow(t.v / t.n + c.v / c.n, 2) /
                     (pow(t.v / t.n, 2) / (t.n - 1)
                      + pow(c.v / c.n, 2) / (c.n - 1)), 2) AS df_welch
        FROM (SELECT * FROM s WHERE grp = 'treat') t,
             (SELECT * FROM s WHERE grp = 'ctrl') c
    """,
)
def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event cohorts
    (purchase vs click values): t statistic + Welch-Satterthwaite
    degrees of freedom from ONE moment aggregate per group.

    Scale: a single partial+final aggregate over the fact scan (no
    window, no join on data — the two 1-row group summaries cross-join
    at the end). This is the canonical map-side-combinable test: at
    100 TB the whole test is one shuffle of 2 rows. df rounds to 2
    (it divides two 4th-power moment terms — more drift-prone than t).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    )
    g = ev.select(
        F.when(F.col("event_type") == "purchase", "treat")
        .otherwise("ctrl")
        .alias("grp"),
        "value",
    )
    s = g.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    t = s.filter(F.col("grp") == "treat").select(
        F.col("n").alias("n_treat"), F.col("m").alias("mt"), F.col("v").alias("vt")
    )
    c = s.filter(F.col("grp") == "ctrl").select(
        F.col("n").alias("n_ctrl"), F.col("m").alias("mc"), F.col("v").alias("vc")
    )
    se2 = F.col("vt") / F.col("n_treat") + F.col("vc") / F.col("n_ctrl")
    df_w = F.pow(se2, 2) / (
        F.pow(F.col("vt") / F.col("n_treat"), 2) / (F.col("n_treat") - 1)
        + F.pow(F.col("vc") / F.col("n_ctrl"), 2) / (F.col("n_ctrl") - 1)
    )
    return t.crossJoin(c).select(
        "n_treat",
        "n_ctrl",
        F.round(F.col("mt") - F.col("mc"), 6).alias("mean_diff"),
        F.round((F.col("mt") - F.col("mc")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(df_w, 2).alias("df_welch"),
    )


@query(
    "mann_whitney_u",
    category="ST2-ranktest",
    oracle="""
        WITH g AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS is_treat,
                   CAST(floor(value) AS BIGINT) AS v
            FROM events
            WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
        ), per_v AS (
            SELECT v, count(*) AS cnt,
                   CAST(sum(is_treat) AS BIGINT) AS cnt_treat
            FROM g GROUP BY v
        ), ranked AS (
            SELECT v, cnt, cnt_treat,
                   CAST(sum(cnt) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS BIGINT) AS below
            FROM per_v
        )
        SELECT CAST(sum(cnt_treat) AS BIGINT) AS n_treat,
               CAST(sum(cnt - cnt_treat) AS BIGINT) AS n_ctrl,
               round(sum(cnt_treat *
                         (coalesce(below, 0) + (cnt + 1) / 2.0)), 1)
                   AS rank_sum_treat
        FROM ranked
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum between two cohorts with midrank tie
    handling: values bucket to integers, per-bucket counts prefix-sum
    into "rows strictly below", and each bucket's members take the
    average rank below + (cnt+1)/2. The treatment rank sum (from
    which U = R1 − n1(n1+1)/2) is exact — integer counts and halves.

    Scale: the ONLY window runs over the distinct-bucket frame
    (≤ 501 rows here — bounded by the metric's bucketing, not the
    fact table), the documented acceptable global-window case; the
    fact table itself sees one bucket-keyed aggregate. This is the
    rank-test construction that avoids ranking N raw rows globally.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    )
    g = ev.select(
        (F.col("event_type") == "purchase").cast("int").alias("is_treat"),
        F.floor("value").cast("long").alias("v"),
    )
    per_v = g.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("is_treat").cast("long").alias("cnt_treat"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.withColumn("below", F.sum("cnt").over(w).cast("long"))
    return ranked.agg(
        F.sum("cnt_treat").cast("long").alias("n_treat"),
        F.sum(F.col("cnt") - F.col("cnt_treat")).cast("long").alias("n_ctrl"),
        F.round(
            F.sum(
                F.col("cnt_treat")
                * (F.coalesce(F.col("below"), F.lit(0)) + (F.col("cnt") + 1) / 2.0)
            ),
            1,
        ).alias("rank_sum_treat"),
    )


@query(
    "chi_square_independence",
    category="ST3-chisq",
    oracle="""
        WITH obs AS (
            SELECT event_type AS et, CAST(dayofweek(ts) AS INT) AS dow,
                   count(*) AS o
            FROM events GROUP BY et, dow
        ), tot AS (
            SELECT CAST(sum(o) AS BIGINT) AS n FROM obs
        ), margins AS (
            SELECT et, dow, o,
                   CAST(sum(o) OVER (PARTITION BY et) AS BIGINT) AS row_t,
                   CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS col_t
            FROM obs
        )
        SELECT CAST(count(*) AS BIGINT) AS n_cells,
               round(sum(pow(o - row_t * col_t * 1.0 / n, 2)
                         / (row_t * col_t * 1.0 / n)), 6) AS chi2,
               CAST((count(DISTINCT et) - 1) * (count(DISTINCT dow) - 1)
                    AS BIGINT) AS dof
        FROM margins CROSS JOIN tot
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (event_type × day-of-week):
    is activity mix stable across weekdays — the categorical drift
    detector behind "did the traffic composition change".

    Scale: the fact table collapses to a |types|×7 contingency census
    in one aggregate; margins, expected counts, and the χ² fold all
    run on that ≤ 35-row frame (windows over tiny partitions).
    Convention trap pinned here: Spark `dayofweek` is 1=Sunday..7,
    DuckDB's is 0=Sunday..6 — the Spark side shifts by −1 so both
    emit 0..6.
    """
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.col("event_type").alias("et"),
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("o"))
    tot = obs.agg(F.sum("o").cast("long").alias("n"))
    w_et = Window.partitionBy("et")
    w_dow = Window.partitionBy("dow")
    margins = obs.select(
        "et",
        "dow",
        "o",
        F.sum("o").over(w_et).cast("long").alias("row_t"),
        F.sum("o").over(w_dow).cast("long").alias("col_t"),
    )
    e = F.col("row_t") * F.col("col_t") / F.col("n")
    return margins.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 6).alias("chi2"),
        (
            (F.count_distinct(F.col("et")) - 1)
            * (F.count_distinct(F.col("dow")) - 1)
        )
        .cast("long")
        .alias("dof"),
    )


@query(
    "cramers_v_lang_source",
    category="ST4-cramersv",
    oracle="""
        WITH obs AS (
            SELECT lang, source, count(*) AS o
            FROM documents GROUP BY lang, source
        ), tot AS (
            SELECT CAST(sum(o) AS BIGINT) AS n,
                   CAST(count(DISTINCT lang) AS BIGINT) AS r,
                   CAST(count(DISTINCT source) AS BIGINT) AS c
            FROM obs
        ), margins AS (
            SELECT lang, source, o,
                   CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS row_t,
                   CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS col_t
            FROM obs
        ), chi AS (
            SELECT sum(pow(o - row_t * col_t * 1.0 / n, 2)
                       / (row_t * col_t * 1.0 / n)) AS chi2
            FROM margins CROSS JOIN tot
        )
        SELECT any_value(n) AS n_docs,
               any_value(r) AS n_langs,
               any_value(c) AS n_sources,
               round(any_value(chi2), 6) AS chi2,
               round(sqrt(any_value(chi2)
                          / (any_value(n) * least(any_value(r) - 1,
                                                  any_value(c) - 1))), 6)
                   AS cramers_v
        FROM chi CROSS JOIN tot
    """,
)
def cramers_v_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the language × source association in
    the corpus — the normalized [0, 1] strength measure on top of χ²
    (chi_square_independence reports the raw statistic; V answers "is
    the dependence LARGE", which is what a corpus-balance report needs
    when n is huge and every χ² is 'significant').

    Scale: same contingency-census shape as ST3 — the fact table
    collapses once, everything else runs on the |langs|×|sources|
    frame.
    """
    docs = load_table(spark, sf_dir, "documents")
    # persist: tot and chi both consume the census (3 scans -> 1)
    obs = (
        docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    ).persist()
    tot = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.count_distinct(F.col("lang")).cast("long").alias("r"),
        F.count_distinct(F.col("source")).cast("long").alias("c"),
    )
    w_r = Window.partitionBy("lang")
    w_c = Window.partitionBy("source")
    margins = obs.select(
        "o",
        F.sum("o").over(w_r).cast("long").alias("row_t"),
        F.sum("o").over(w_c).cast("long").alias("col_t"),
    )
    e = F.col("row_t") * F.col("col_t") / F.col("n")
    chi = (
        margins.crossJoin(F.broadcast(tot))
        .agg(F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"))
    )
    return chi.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_docs"),
        F.col("r").alias("n_langs"),
        F.col("c").alias("n_sources"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@query(
    "ks_two_sample_test",
    category="ST5",
    oracle="""
        WITH pts AS (
            SELECT value AS x,
                   CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS a,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
            FROM events WHERE event_type IN ('error', 'click')
        ), tot AS (
            SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
            FROM pts
        ), steps AS (
            SELECT x, CAST(sum(a) AS BIGINT) AS da, CAST(sum(b) AS BIGINT) AS db
            FROM pts GROUP BY x
        ), cum AS (
            SELECT x,
                   CAST(sum(da) OVER (ORDER BY x) AS BIGINT) AS ca,
                   CAST(sum(db) OVER (ORDER BY x) AS BIGINT) AS cb
            FROM steps
        ), dmax AS (
            SELECT CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_scaled
            FROM cum, tot
        )
        SELECT na, nb, d_scaled,
               round(d_scaled * 1.0 / (na * nb), 9) AS d_stat,
               d_scaled * 1.0 / (na * nb)
                   > 1.358 * sqrt((na + nb) * 1.0 / (na * nb)) AS reject_95
        FROM dmax, tot
    """,
)
def ks_two_sample_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test (ST5): D = sup|F_a − F_b|
    between the error-value and click-value distributions, with the
    large-sample 5% rejection rule c(α)·√((nₐ+n_b)/(nₐ·n_b)),
    c(0.05) = 1.358 — the classic distribution-shift detector a data
    pipeline runs between corpus snapshots.

    Determinism: D is computed as max|cumA·nB − cumB·nA| in BIGINT
    (exact, order-insensitive; ≤ 6e4·3e4 ≈ 2e9·1e4 ≪ 2^63) and
    divided once at the end — both engines evaluate the identical
    final double expression.

    Scale: one scan → per-distinct-value step counts (hash agg) → a
    cumulative window over DISTINCT values only (bounded: |values| ≪
    rows; same distinct-bucket trick as mann_whitney_u) → 1-row max.
    The unpartitioned window is over ~49k distinct doubles at sf0.01
    and is bounded by the value domain, not the row count — stated
    per the Window.orderBy audit convention.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("error", "click")
    )
    pts = ev.select(
        F.col("value").alias("x"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("b"),
    )
    tot = pts.agg(
        F.sum("a").cast("long").alias("na"), F.sum("b").cast("long").alias("nb")
    )
    steps = pts.groupBy("x").agg(
        F.sum("a").cast("long").alias("da"), F.sum("b").cast("long").alias("db")
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = steps.select(
        "x",
        F.sum("da").over(w).cast("long").alias("ca"),
        F.sum("db").over(w).cast("long").alias("cb"),
    )
    dmax = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")))
            .cast("long")
            .alias("d_scaled")
        )
    )
    d = F.col("d_scaled") / (F.col("na") * F.col("nb"))
    return dmax.crossJoin(F.broadcast(tot)).select(
        "na", "nb", "d_scaled",
        F.round(d, 9).alias("d_stat"),
        (
            d > 1.358 * F.sqrt((F.col("na") + F.col("nb")) / (F.col("na") * F.col("nb")))
        ).alias("reject_95"),
    )


@query(
    "spearman_rank_correlation",
    category="ST6",
    oracle="""
        WITH base AS (
            SELECT l_quantity AS x, l_extendedprice AS y
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
        ), xr AS (
            SELECT x, 2 * CAST(sum(c) OVER (ORDER BY x) AS BIGINT) - c + 1
                       AS mr2
            FROM (SELECT x, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY x)
        ), yr AS (
            SELECT y, 2 * CAST(sum(c) OVER (ORDER BY y) AS BIGINT) - c + 1
                       AS mr2
            FROM (SELECT y, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY y)
        ), ranked AS (
            SELECT xr.mr2 AS rx, yr.mr2 AS ry
            FROM base JOIN xr USING (x) JOIN yr USING (y)
        ), sums AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(rx) AS BIGINT) AS sx,
                   CAST(sum(ry) AS BIGINT) AS sy,
                   CAST(sum(rx * ry) AS BIGINT) AS sxy,
                   CAST(sum(rx * rx) AS BIGINT) AS sxx,
                   CAST(sum(ry * ry) AS BIGINT) AS syy
            FROM ranked
        )
        SELECT n,
               round((n * sxy - sx * sy)
                     / sqrt(1.0 * (n * sxx - sx * sx) * (n * syy - sy * sy)),
                     9) AS spearman_rho
        FROM sums
    """,
)
def spearman_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation with tie-aware midranks (ST6):
    ρ = Pearson over the rank transforms of (l_quantity,
    l_extendedprice) on the 1996 shipment slice — the monotone-
    association test that is robust where raw Pearson is leveraged by
    price outliers.

    Determinism: midranks are held DOUBLED (mr2 = 2·cum − c + 1, an
    integer) via the distinct-bucket construction from mann_whitney_u,
    so every sum (Σr, Σr², Σrxry ≤ ~2.6e16) is an exact BIGINT; the
    single final expression divides the exact integer numerator by a
    sqrt evaluated identically in both engines (the doubling cancels).

    Scale: midrank tables are per-DISTINCT-value (50 quantities; price
    domain bounded by the price book, not row count) and join back by
    value; the unpartitioned cumulative windows run over those
    distinct-value frames only — bounded per the Window.orderBy audit
    convention. Sums are one two-phase agg.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    base = li.select(F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y"))

    def midranks(col):
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return (
            base.groupBy(col)
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .select(
                col,
                (2 * F.sum("c").over(w).cast("long") - F.col("c") + 1).alias("mr2"),
            )
        )
    ranked = (
        base.join(midranks("x").withColumnRenamed("mr2", "rx"), "x")
        .join(midranks("y").withColumnRenamed("mr2", "ry"), "y")
    )
    sums = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        1.0
        * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select("n", F.round(num / den, 9).alias("spearman_rho"))


@query(
    "ab_wilson_interval",
    category="ST4-interval",
    oracle="""
        WITH assign AS (
            SELECT user_id,
                   CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM events GROUP BY user_id
        ), s AS (
            SELECT variant,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(converted) AS BIGINT) AS k,
                   CAST(sum(converted) AS DOUBLE) / count(*) AS p
            FROM assign GROUP BY variant
        )
        SELECT variant, n, k,
               round(p, 6) AS conv_rate,
               round((p + 1.959964 * 1.959964 / (2 * n)
                      - 1.959964 * sqrt(p * (1 - p) / n
                            + 1.959964 * 1.959964 / (4.0 * n * n)))
                     / (1 + 1.959964 * 1.959964 / n), 6) AS wilson_lo,
               round((p + 1.959964 * 1.959964 / (2 * n)
                      + 1.959964 * sqrt(p * (1 - p) / n
                            + 1.959964 * 1.959964 / (4.0 * n * n)))
                     / (1 + 1.959964 * 1.959964 / n), 6) AS wilson_hi
        FROM s ORDER BY variant
    """,
)
def ab_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score 95% confidence interval for per-variant conversion
    rates — the interval that behaves at small n and extreme p where
    the naive normal (Wald) interval collapses; the experimentation
    readout that accompanies welch_t_test/mann_whitney_u. Users hash
    into A/B by parity; a user converts if they ever purchase; the
    closed-form Wilson bounds use z = 1.959964 as an exact literal so
    both engines run the identical expression tree over identical
    integer counts (one IEEE division minting p, everything after is
    deterministic libm), rounded to 6.

    Scale: one user-grain aggregate (map-side combinable max) + one
    2-row rollup; the interval math is driver-free column arithmetic
    on the 2-row frame.
    """
    ev = load_table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    ).select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"),
        "converted",
    )
    s = assign.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("k"),
        (F.sum("converted").cast("double") / F.count(F.lit(1))).alias("p"),
    )
    z = F.lit(1.959964)
    n, p = F.col("n"), F.col("p")
    center = p + z * z / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    return s.select(
        "variant", "n", "k",
        F.round(p, 6).alias("conv_rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


@query(
    "ab_cuped_adjustment",
    category="ST5-cuped",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
                   CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                            THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                            ELSE 0 END) AS DOUBLE) AS x,
                   CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                            THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                            ELSE 0 END) AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL
            GROUP BY user_id
        ), pooled AS (
            SELECT covar_samp(x, y) / var_samp(x) AS theta,
                   avg(x) AS mx
            FROM per_user
        )
        SELECT variant,
               CAST(count(*) AS BIGINT) AS n_users,
               round(avg(y) / 100.0, 6) AS mean_post,
               round(avg(y - theta * (x - mx)) / 100.0, 6) AS mean_cuped,
               round(1.0 - var_samp(y - theta * (x - mx)) / var_samp(y), 6)
                   AS var_reduction,
               round(theta, 6) AS theta
        FROM per_user CROSS JOIN pooled
        GROUP BY variant, theta ORDER BY variant
    """,
)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction — the pre-experiment-covariate
    adjustment every mature experimentation platform applies before
    the t-test: per user, x = pre-period spend (days 1–15, integer
    cents) and y = post-period spend; θ = cov(x,y)/var(x) pooled
    across variants; the adjusted metric y − θ(x − x̄) keeps the same
    mean (CUPED is unbiased) but sheds the variance x explains —
    var_reduction quantifies exactly how much smaller the experiment
    could have been. Users split A/B by parity like ab_wilson_interval.

    Float discipline: x/y are exact integer cents cast once; θ and
    the moments are order-dependent aggregates, but every OUTPUT is a
    ratio or a cent-scale mean, so 1e-12-relative drift dies at
    round 6 (raw variances of cent-scaled values would NOT — they sit
    at 1e10 where absolute rounding can't absorb drift; that's why
    var_reduction ships instead).

    Scale: one user-grain conditional aggregate, a 1-row pooled-stats
    broadcast, one variant rollup — three map-side-combinable
    aggregates over a single scan.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cut = F.lit("2024-01-16").cast("timestamp")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(0))
        .cast("double").alias("x"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0))
        .cast("double").alias("y"),
    ).select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"),
        "x", "y",
    )
    pooled = per_user.agg(
        (F.covar_samp("x", "y") / F.var_samp("x")).alias("theta"),
        F.avg("x").alias("mx"),
    )
    adj = per_user.crossJoin(F.broadcast(pooled)).withColumn(
        "y_adj", F.col("y") - F.col("theta") * (F.col("x") - F.col("mx"))
    )
    return (
        adj.groupBy("variant", "theta")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.avg("y") / 100.0, 6).alias("mean_post"),
            F.round(F.avg("y_adj") / 100.0, 6).alias("mean_cuped"),
            F.round(
                F.lit(1.0) - F.var_samp("y_adj") / F.var_samp("y"), 6
            ).alias("var_reduction"),
        )
        .select(
            "variant", "n_users", "mean_post", "mean_cuped",
            "var_reduction", F.round("theta", 6).alias("theta"),
        )
    )
