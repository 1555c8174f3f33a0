"""Causal-inference / experimentation utilities II: geometric adstock
(JVM array-fold recursion — no Python worker), difference-in-
differences, deterministic stratified k-fold assignment, and a
log-log price-elasticity OLS — extending the A/B family (CUPED,
Wilson, SPRT, permutation test live elsewhere).

Float discipline: cell counts and cent sums are exact integers; DiD
is a composition of four single divisions; the elasticity slope is
one quotient of ln-term sums accumulated in pinned order; adstock's
recurrence runs as a LITERAL-coefficient fold identically on both
engines (Spark: F.aggregate over a day-ordered array — whole-stage
codegen, no Python; DuckDB: recursive CTE).

Scale: every query collapses the scan to a bounded frame first
(daily cells, fold buckets, 2×2 DiD cells); folds run over ≤|days|
elements per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ._shared import md5_uniform_sql


@query(
    "adstock_geometric_fold",
    category="CA-adstock",
    oracle="""
        WITH RECURSIVE daily AS (
            SELECT event_type,
                   CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type, CAST(ts AS DATE)
        ), seq AS (
            SELECT event_type, day, cents,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM daily
        ), r AS (
            SELECT event_type, rn, day, cents,
                   CAST(cents AS DOUBLE) AS adstock
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.event_type, s.rn, s.day, s.cents,
                   CAST(s.cents AS DOUBLE) + 0.6 * r.adstock
            FROM r JOIN seq s
                 ON s.event_type = r.event_type AND s.rn = r.rn + 1
        )
        SELECT event_type, day, cents,
               CAST(round(adstock, 6) AS DOUBLE) AS adstock
        FROM r
        ORDER BY event_type, day
    """,
)
def adstock_geometric_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric adstock (marketing carry-over): a_t = x_t + λ·a_{t−1}
    with λ = 0.6 over each channel's daily spend (cent sums) — the
    transform every media-mix model applies before regression. The
    recurrence is inherently sequential, and this query demonstrates
    the THIRD recursion technique in the repo: a JVM-side
    ``aggregate()`` fold over the day-ordered array (whole-stage
    codegen — no Python worker, unlike the applyInPandas folds; no
    driver loop, unlike the iterative graph queries), certified
    against a DuckDB recursive CTE.

    Determinism: daily spend is exact integer cents; the fold applies
    the literal 0.6 in identical order on both engines, so every
    emitted adstock is bit-identical before the cosmetic round.

    Scale: ONE rollup to |channels|×|days| rows; collect_list packs
    each channel's ≤|days| values (bounded by the calendar, not the
    data); the fold is O(|days|) per channel inside codegen.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long").alias("cents")
    )
    packed = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day", "cents"))
        ).alias("series")
    )
    # JVM fold: accumulator = array of (day, cents, adstock); each
    # step appends x + 0.6 * previous adstock
    folded = packed.select(
        "event_type",
        F.expr(
            """
            aggregate(
                series,
                CAST(array() AS ARRAY<STRUCT<day DATE, cents BIGINT,
                                             adstock DOUBLE>>),
                (acc, x) -> array_append(
                    acc,
                    struct(
                        x.day AS day, x.cents AS cents,
                        CAST(x.cents AS DOUBLE) + CASE WHEN size(acc) = 0
                             THEN 0.0D
                             ELSE 0.6D * element_at(acc, -1).adstock END
                            AS adstock))
            )
            """
        ).alias("walked"),
    )
    return (
        folded.select("event_type", F.explode("walked").alias("w"))
        .select(
            "event_type",
            F.col("w.day").alias("day"),
            F.col("w.cents").alias("cents"),
            F.round("w.adstock", 6).alias("adstock"),
        )
    )


@query(
    "difference_in_differences",
    category="CA-did",
    oracle=f"""
        WITH labeled AS (
            SELECT CASE WHEN {md5_uniform_sql("'did:' || CAST(user_id AS VARCHAR)")}
                        < 0.5 THEN 1 ELSE 0 END AS treated,
                   CASE WHEN extract(day FROM ts) > 15 THEN 1 ELSE 0 END
                       AS post,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events WHERE value IS NOT NULL
        ), cells AS (
            SELECT treated, post,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS s
            FROM labeled GROUP BY treated, post
        ), wide AS (
            SELECT
                max(CASE WHEN treated = 1 AND post = 1
                         THEN CAST(s AS DOUBLE) / n END) AS t1,
                max(CASE WHEN treated = 1 AND post = 0
                         THEN CAST(s AS DOUBLE) / n END) AS t0,
                max(CASE WHEN treated = 0 AND post = 1
                         THEN CAST(s AS DOUBLE) / n END) AS c1,
                max(CASE WHEN treated = 0 AND post = 0
                         THEN CAST(s AS DOUBLE) / n END) AS c0
            FROM cells
        )
        SELECT CAST(round(t1, 6) AS DOUBLE) AS treated_post,
               CAST(round(t0, 6) AS DOUBLE) AS treated_pre,
               CAST(round(c1, 6) AS DOUBLE) AS control_post,
               CAST(round(c0, 6) AS DOUBLE) AS control_pre,
               CAST(round((t1 - t0) - (c1 - c0), 6) AS DOUBLE)
                   AS did_estimate_cents
        FROM wide
    """,
)
def difference_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: md5-assigned treatment (the repo's
    deterministic variant mint), pre/post split at mid-month, outcome
    = mean event value in cents per 2×2 cell; the DiD estimate
    (Δtreated − Δcontrol) removes both group-level and time-level
    confounds — the workhorse quasi-experimental estimator when
    randomized exposure isn't available.

    Determinism: each cell mean is ONE division of an exact integer
    cent sum by an exact count; DiD composes four such doubles with
    literal arithmetic — no ratio-of-rounded-ratios.

    Scale: one conditional rollup to 4 cells; everything after is
    constant-size.
    """
    from ..functions.sampling import md5_uniform

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    labeled = ev.select(
        (
            md5_uniform("concat('did:', cast(user_id as string))") < 0.5
        ).cast("long").alias("treated"),
        (F.dayofmonth("ts") > 15).cast("long").alias("post"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    cells = labeled.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    wide = cells.agg(
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 1), mean)).alias("t1"),
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 0), mean)).alias("t0"),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 1), mean)).alias("c1"),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 0), mean)).alias("c0"),
    )
    return wide.select(
        F.round("t1", 6).alias("treated_post"),
        F.round("t0", 6).alias("treated_pre"),
        F.round("c1", 6).alias("control_post"),
        F.round("c0", 6).alias("control_pre"),
        F.round(
            (F.col("t1") - F.col("t0")) - (F.col("c1") - F.col("c0")), 6
        ).alias("did_estimate_cents"),
    )


@query(
    "stratified_kfold_assignment",
    category="CA-kfold",
    oracle=f"""
        WITH assigned AS (
            SELECT doc_id, lang,
                   CAST(floor({md5_uniform_sql("'fold:' || CAST(doc_id AS VARCHAR)")}
                              * 5) AS BIGINT) AS fold
            FROM documents
        ), census AS (
            SELECT lang, fold, CAST(count(*) AS BIGINT) AS n
            FROM assigned GROUP BY lang, fold
        ), spread AS (
            SELECT lang,
                   CAST(sum(n) AS BIGINT) AS n_lang,
                   CAST(max(n) AS BIGINT) AS max_fold,
                   CAST(min(n) AS BIGINT) AS min_fold
            FROM census GROUP BY lang
        )
        SELECT lang, n_lang, min_fold, max_fold,
               (CAST(max_fold - min_fold AS DOUBLE) * 5 <= 0.5 * n_lang)
                   AS balanced
        FROM spread ORDER BY lang
    """,
)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment over the
    document corpus with a per-stratum balance audit: folds come from
    the md5 mint (reproducible across engines, runs, partitionings —
    the train_test_split_hash discipline extended to k folds), and
    the emitted gate asserts each language's fold spread stays within
    10% of the stratum mean (max−min ≤ 0.1·n/5, stated as the
    integer-safe cross-multiplication (max−min)·5 ≤ 0.5·n).

    Scale: the assignment is a pure narrow map (no shuffle, no seed
    state); the census is one rollup to |langs|×5 rows; any worker
    can re-derive any document's fold from its id alone — the
    property that makes distributed k-fold training runs consistent
    without a membership table.
    """
    from ..functions.sampling import md5_uniform

    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id", "lang",
        F.floor(
            md5_uniform("concat('fold:', cast(doc_id as string))") * 5
        ).cast("long").alias("fold"),
    )
    census = assigned.groupBy("lang", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    spread = census.groupBy("lang").agg(
        F.sum("n").cast("long").alias("n_lang"),
        F.max("n").cast("long").alias("max_fold"),
        F.min("n").cast("long").alias("min_fold"),
    )
    return spread.select(
        "lang", "n_lang", "min_fold", "max_fold",
        (
            (F.col("max_fold") - F.col("min_fold")).cast("double") * 5
            <= 0.5 * F.col("n_lang")
        ).alias("balanced"),
    )


@query(
    "price_elasticity_loglog",
    category="CA-elasticity",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS q,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY CAST(ts AS DATE)
        ), lx AS (
            SELECT day, ln(CAST(cents AS DOUBLE) / q / 100.0) AS x,
                   ln(CAST(q AS DOUBLE)) AS y,
                   row_number() OVER (ORDER BY day) AS rn,
                   count(*) OVER () AS m
            FROM daily
        ), sums AS (
            SELECT rn, m,
                   sum(x) OVER w AS sx, sum(y) OVER w AS sy,
                   sum(x * y) OVER w AS sxy, sum(x * x) OVER w AS sxx
            FROM lx
            WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
        )
        SELECT CAST(m AS BIGINT) AS n_days,
               CAST(round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6)
                    AS DOUBLE) AS elasticity,
               CAST(round((sy - ((m * sxy - sx * sy)
                                 / (m * sxx - sx * sx)) * sx) / m, 6)
                    AS DOUBLE) AS intercept
        FROM sums WHERE rn = m
    """,
)
def price_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand: OLS slope of ln(daily
    purchase count) on ln(mean purchase price) — the constant-
    elasticity estimate every pricing team reads (slope ≈ %Δdemand
    per %Δprice). Both ln() inputs derive from exact integers (count;
    cent sum / count / 100 as one chained division), and the OLS
    sums accumulate in PINNED day order via running windows (the
    mleval prefix-sum discipline) with the slope as one quotient at
    the final row.

    Scale: one rollup to |days| rows; windows on that frame; single-
    row output.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("q"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long").alias("cents"),
    )
    lx = daily.select(
        "day",
        F.log(F.col("cents").cast("double") / F.col("q") / 100.0).alias("x"),
        F.log(F.col("q").cast("double")).alias("y"),
    )
    wo = Window.orderBy("day")
    wrun = wo.rowsBetween(Window.unboundedPreceding, 0)
    sums = (
        lx.withColumn("rn", F.row_number().over(wo))
        .withColumn("m", F.count(F.lit(1)).over(Window.partitionBy()))
        .withColumn("sx", F.sum("x").over(wrun))
        .withColumn("sy", F.sum("y").over(wrun))
        .withColumn("sxy", F.sum(F.col("x") * F.col("y")).over(wrun))
        .withColumn("sxx", F.sum(F.col("x") * F.col("x")).over(wrun))
    )
    slope = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.filter(F.col("rn") == F.col("m")).select(
        F.col("m").cast("long").alias("n_days"),
        F.round(slope, 6).alias("elasticity"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("m"), 6)
        .alias("intercept"),
    )


@query(
    "uplift_by_decile",
    category="CA-uplift",
    oracle=f"""
        WITH labeled AS (
            SELECT CASE WHEN {md5_uniform_sql("'uplift:' || CAST(user_id AS VARCHAR)")}
                        < 0.5 THEN 1 ELSE 0 END AS treated,
                   CAST(least(floor(value / 50), 9) AS BIGINT) AS band,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS converted
            FROM events WHERE value IS NOT NULL
        ), cells AS (
            SELECT band, treated,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(converted) AS BIGINT) AS x
            FROM labeled GROUP BY band, treated
        ), wide AS (
            SELECT band,
                   max(CASE WHEN treated = 1 THEN n END) AS n_t,
                   max(CASE WHEN treated = 1 THEN x END) AS x_t,
                   max(CASE WHEN treated = 0 THEN n END) AS n_c,
                   max(CASE WHEN treated = 0 THEN x END) AS x_c
            FROM cells GROUP BY band
        )
        SELECT band, n_t, x_t, n_c, x_c,
               CAST(round(CAST(x_t AS DOUBLE) / n_t, 6) AS DOUBLE) AS rate_t,
               CAST(round(CAST(x_c AS DOUBLE) / n_c, 6) AS DOUBLE) AS rate_c,
               CAST(round(CAST(x_t AS DOUBLE) / n_t
                          - CAST(x_c AS DOUBLE) / n_c, 6) AS DOUBLE)
                   AS uplift
        FROM wide ORDER BY band
    """,
)
def uplift_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift (incrementality) by score band: md5-assigned treatment,
    conversion-rate difference treated − control per value band — the
    readout an uplift model ships so campaigns target persuadables
    (high-uplift bands) instead of sure-things. Each rate is one
    division of exact integers; uplift composes the two divisions
    with literal arithmetic.

    Scale: one conditional rollup to 10×2 cells; constant-size after.
    """
    from ..functions.sampling import md5_uniform

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    labeled = ev.select(
        (
            md5_uniform("concat('uplift:', cast(user_id as string))") < 0.5
        ).cast("long").alias("treated"),
        F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("long").alias("band"),
        (F.col("event_type") == "purchase").cast("long").alias("converted"),
    )
    cells = labeled.groupBy("band", "treated").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("x"),
    )
    wide = cells.groupBy("band").agg(
        F.max(F.when(F.col("treated") == 1, F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("treated") == 1, F.col("x"))).alias("x_t"),
        F.max(F.when(F.col("treated") == 0, F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("treated") == 0, F.col("x"))).alias("x_c"),
    )
    rt = F.col("x_t").cast("double") / F.col("n_t")
    rc = F.col("x_c").cast("double") / F.col("n_c")
    return wide.select(
        "band", "n_t", "x_t", "n_c", "x_c",
        F.round(rt, 6).alias("rate_t"),
        F.round(rc, 6).alias("rate_c"),
        F.round(rt - rc, 6).alias("uplift"),
    )


def breach_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily breach flags per type (count > 1.1x the type mean, as the
    integer cross-multiplication n*10 > mean*11) - shared by the batch
    FSM query and its streaming GroupState twin's golden test."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    typ = daily.groupBy("event_type").agg(
        F.expr("CAST(sum(n) div count(*) AS BIGINT)").alias("mean_n")
    )
    return daily.join(typ, "event_type").select(
        "event_type", "day",
        (F.col("n") * 10 > F.col("mean_n") * 11).cast("long").alias("breach"),
        F.col("n"),
    )


@query(
    "alert_flap_suppression_fsm",
    category="CA-fsm",
    oracle="""
        WITH RECURSIVE daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ), typ AS (
            SELECT event_type,
                   CAST(sum(n) // count(*) AS BIGINT) AS mean_n
            FROM daily GROUP BY event_type
        ), seq AS (
            SELECT d.event_type, d.day, d.n,
                   CASE WHEN d.n * 10 > t.mean_n * 11 THEN 1 ELSE 0 END
                       AS breach,
                   row_number() OVER (PARTITION BY d.event_type
                                      ORDER BY d.day) AS rn
            FROM daily d JOIN typ t USING (event_type)
        ), fsm AS (
            SELECT event_type, rn, day, breach,
                   CAST(0 AS BIGINT) AS alert,
                   CAST(breach AS BIGINT) AS cb,
                   CAST(1 - breach AS BIGINT) AS cg
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.event_type, s.rn, s.day, s.breach,
                   CASE WHEN f.alert = 0
                             AND s.breach = 1 AND f.cb + 1 >= 3 THEN 1
                        WHEN f.alert = 1
                             AND s.breach = 0 AND f.cg + 1 >= 2 THEN 0
                        ELSE f.alert END,
                   CASE WHEN s.breach = 1 THEN f.cb + 1 ELSE 0 END,
                   CASE WHEN s.breach = 0 THEN f.cg + 1 ELSE 0 END
            FROM fsm f JOIN seq s
                 ON s.event_type = f.event_type AND s.rn = f.rn + 1
        )
        SELECT event_type,
               CAST(sum(breach) AS BIGINT) AS n_breach_days,
               CAST(sum(alert) AS BIGINT) AS n_alert_days,
               CAST(sum(CASE WHEN alert = 1 AND breach = 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_suppressed_clears
        FROM fsm GROUP BY event_type ORDER BY event_type
    """,
)
def alert_flap_suppression_fsm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert flap suppression as a finite-state machine: a daily
    volume breach (count > 1.1× the type's mean, stated as the
    integer cross-multiplication n·10 > mean·11) must persist 3
    consecutive days to RAISE and 2 consecutive quiet days to CLEAR —
    the hysteresis every paging system applies so a flapping metric
    doesn't wake anyone twice. Per type: breach days, alert-active
    days, and suppressed clears (alert held through a quiet day).

    The FSM is the repo's third sequential-fold technique applied to
    control flow: Spark runs it as a JVM ``aggregate()`` fold over
    the day-ordered array (integer state: alert flag + two run
    counters — whole-stage codegen, no Python worker); the oracle
    replays the identical transition table in a recursive CTE. All
    state and all transitions are integers — nothing can drift.

    Scale: one rollup to |types|×|days| rows; the fold is O(|days|)
    per type; output is |types| rows.
    """
    seq = breach_series(spark, sf_dir)
    packed = seq.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "breach"))).alias("series")
    )
    folded = packed.select(
        "event_type",
        F.expr(
            """
            aggregate(
                series,
                struct(
                    CAST(array() AS ARRAY<STRUCT<breach BIGINT,
                                                 alert BIGINT>>) AS rows,
                    CAST(0 AS BIGINT) AS alert,
                    CAST(0 AS BIGINT) AS cb,
                    CAST(0 AS BIGINT) AS cg),
                (st, x) -> struct(
                    array_append(st.rows, struct(
                        x.breach AS breach,
                        CASE WHEN st.alert = 0 AND x.breach = 1
                                  AND st.cb + 1 >= 3 THEN CAST(1 AS BIGINT)
                             WHEN st.alert = 1 AND x.breach = 0
                                  AND st.cg + 1 >= 2 THEN CAST(0 AS BIGINT)
                             ELSE st.alert END AS alert)) AS rows,
                    CASE WHEN st.alert = 0 AND x.breach = 1
                              AND st.cb + 1 >= 3 THEN CAST(1 AS BIGINT)
                         WHEN st.alert = 1 AND x.breach = 0
                              AND st.cg + 1 >= 2 THEN CAST(0 AS BIGINT)
                         ELSE st.alert END AS alert,
                    CASE WHEN x.breach = 1 THEN st.cb + 1
                         ELSE CAST(0 AS BIGINT) END AS cb,
                    CASE WHEN x.breach = 0 THEN st.cg + 1
                         ELSE CAST(0 AS BIGINT) END AS cg)
            ).rows
            """
        ).alias("walked"),
    )
    rows = folded.select("event_type", F.explode("walked").alias("w"))
    return (
        rows.groupBy("event_type")
        .agg(
            F.sum("w.breach").cast("long").alias("n_breach_days"),
            F.sum("w.alert").cast("long").alias("n_alert_days"),
            F.sum(
                F.when((F.col("w.alert") == 1) & (F.col("w.breach") == 0), 1)
                .otherwise(0)
            ).cast("long").alias("n_suppressed_clears"),
        )
    )


_HUBER_K = "50000.0"  # cents; fixed tuning constant stated literally


@query(
    "huber_irls_daily_trend",
    category="CA-huber",
    oracle=f"""
        WITH daily AS (
            SELECT row_number() OVER (ORDER BY day) AS x,
                   CAST(cents AS DOUBLE) AS y
            FROM (
                SELECT CAST(ts AS DATE) AS day,
                       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                            AS BIGINT) AS cents
                FROM events
                WHERE event_type = 'purchase' AND value IS NOT NULL
                GROUP BY CAST(ts AS DATE)
            )
        ), s0 AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   sum(CAST(x AS DOUBLE)) AS sx, sum(y) AS sy,
                   sum(CAST(x AS DOUBLE) * y) AS sxy,
                   sum(CAST(x AS DOUBLE) * x) AS sxx
            FROM daily
        ), fit0 AS (
            SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
                   (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                       AS a
            FROM s0
        ), w1 AS (
            SELECT d.x, d.y,
                   CASE WHEN abs(d.y - (f.a + f.b * d.x)) <= {_HUBER_K}
                        THEN 1.0
                        ELSE {_HUBER_K} / abs(d.y - (f.a + f.b * d.x)) END
                       AS w
            FROM daily d, fit0 f
        ), s1 AS (
            SELECT sum(w) AS n, sum(w * x) AS sx, sum(w * y) AS sy,
                   sum(w * x * y) AS sxy, sum(w * x * x) AS sxx,
                   CAST(sum(CASE WHEN w < 1.0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS nd
            FROM w1
        ), fit1 AS (
            SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
                   (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                       AS a,
                   nd
            FROM s1
        ), w2 AS (
            SELECT d.x, d.y,
                   CASE WHEN abs(d.y - (f.a + f.b * d.x)) <= {_HUBER_K}
                        THEN 1.0
                        ELSE {_HUBER_K} / abs(d.y - (f.a + f.b * d.x)) END
                       AS w
            FROM daily d, fit1 f
        ), s2 AS (
            SELECT sum(w) AS n, sum(w * x) AS sx, sum(w * y) AS sy,
                   sum(w * x * y) AS sxy, sum(w * x * x) AS sxx,
                   CAST(sum(CASE WHEN w < 1.0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS nd
            FROM w2
        )
        SELECT CAST(round((SELECT b FROM fit0), 6) AS DOUBLE) AS slope_ols,
               CAST(round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                    AS DOUBLE) AS slope_huber,
               CAST(round((sy - (n * sxy - sx * sy)
                           / (n * sxx - sx * sx) * sx) / n, 6) AS DOUBLE)
                   AS intercept_huber,
               (SELECT nd FROM fit1) AS n_downweighted_r1,
               nd AS n_downweighted_r2
        FROM s2
    """,
)
def huber_irls_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber-loss robust trend via IRLS, two unrolled rounds: fit OLS
    on the daily purchase-revenue series, down-weight points whose
    residual exceeds the Huber constant (w = k/|r|), refit weighted,
    repeat — the outlier-resistant slope the Theil-Sen query gets by
    medians, here by the estimator production stacks actually run
    (IRLS is how every robust-regression library iterates).

    Determinism: the daily frame is exact integer cents; OLS moments
    aggregate ≤|days| terms; every weight and refit is the identical
    literal expression on identical doubles in both engines — the
    aggregation order concern is bounded by the 30-row frame and the
    6dp round (agg_regression_family precedent).

    Scale: rounds reuse the SAME |days|-row frame with 1-row
    broadcast fits — each IRLS round is one crossJoin(broadcast) +
    one aggregate, not a rescan; unrolling depth is a literal.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    from pyspark.sql import Window as W

    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long").alias("cents")
        )
        .select(
            F.row_number().over(W.orderBy("day")).cast("double").alias("x"),
            F.col("cents").cast("double").alias("y"),
        )
    )
    k = float(_HUBER_K)

    def wls_fit(df: DataFrame, w=None):
        wcol = F.lit(1.0) if w is None else F.col(w)
        s = df.agg(
            F.sum(wcol).alias("n"),
            F.sum(wcol * F.col("x")).alias("sx"),
            F.sum(wcol * F.col("y")).alias("sy"),
            F.sum(wcol * F.col("x") * F.col("y")).alias("sxy"),
            F.sum(wcol * F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.when(wcol < 1.0, 1).otherwise(0)).cast("long").alias("nd"),
        )
        b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        )
        return s.select(
            b.alias("b"),
            ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias("a"),
            "nd",
        )

    fit0 = wls_fit(daily)
    w1 = daily.crossJoin(F.broadcast(fit0.select("a", "b"))).withColumn(
        "w",
        F.when(
            F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("x"))) <= k,
            F.lit(1.0),
        ).otherwise(
            k / F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("x")))
        ),
    ).select("x", "y", "w")
    fit1 = wls_fit(w1, "w")
    w2 = daily.crossJoin(F.broadcast(fit1.select("a", "b"))).withColumn(
        "w",
        F.when(
            F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("x"))) <= k,
            F.lit(1.0),
        ).otherwise(
            k / F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("x")))
        ),
    ).select("x", "y", "w")
    fit2 = wls_fit(w2, "w")
    return (
        fit0.select(F.round("b", 6).alias("slope_ols"))
        .crossJoin(F.broadcast(fit1.select(F.col("nd").alias("n_downweighted_r1"))))
        .crossJoin(
            F.broadcast(
                fit2.select(
                    F.round("b", 6).alias("slope_huber"),
                    F.round("a", 6).alias("intercept_huber"),
                    F.col("nd").alias("n_downweighted_r2"),
                )
            )
        )
        .select(
            "slope_ols", "slope_huber", "intercept_huber",
            "n_downweighted_r1", "n_downweighted_r2",
        )
    )


@query(
    "granger_lag1_causality",
    category="CA-granger",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT) AS x,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS y
            FROM events GROUP BY CAST(ts AS DATE)
        ), lagged AS (
            SELECT day, x, y,
                   lag(x) OVER (ORDER BY day) AS xl,
                   lag(y) OVER (ORDER BY day) AS yl
            FROM daily
        ), pairs AS (
            SELECT 'click->purchase' AS direction, y AS t, yl AS own, xl AS other
            FROM lagged WHERE xl IS NOT NULL
            UNION ALL
            SELECT 'purchase->click', x, xl, yl
            FROM lagged WHERE xl IS NOT NULL
        ), mom AS (
            SELECT direction,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(t) AS BIGINT) AS st, CAST(sum(own) AS BIGINT) AS s1,
                   CAST(sum(other) AS BIGINT) AS s2,
                   CAST(sum(t * t) AS BIGINT) AS qtt,
                   CAST(sum(own * own) AS BIGINT) AS q11,
                   CAST(sum(other * other) AS BIGINT) AS q22,
                   CAST(sum(t * own) AS BIGINT) AS pt1,
                   CAST(sum(t * other) AS BIGINT) AS pt2,
                   CAST(sum(own * other) AS BIGINT) AS p12
            FROM pairs GROUP BY direction
        ), cent AS (
            SELECT direction, n,
                   CAST(qtt AS DOUBLE) - CAST(st AS DOUBLE) * st / n AS syy,
                   CAST(q11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n AS s11,
                   CAST(q22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS s22,
                   CAST(pt1 AS DOUBLE) - CAST(st AS DOUBLE) * s1 / n AS sy1,
                   CAST(pt2 AS DOUBLE) - CAST(st AS DOUBLE) * s2 / n AS sy2,
                   CAST(p12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n AS s12
            FROM mom
        ), fit AS (
            SELECT direction, n,
                   syy - sy1 * sy1 / s11 AS sse_r,
                   syy - ((sy1 * s22 - sy2 * s12) * sy1
                          + (sy2 * s11 - sy1 * s12) * sy2)
                         / (s11 * s22 - s12 * s12) AS sse_u
            FROM cent
        )
        SELECT direction, n,
               CAST(round(sse_r, 4) AS DOUBLE) AS sse_restricted,
               CAST(round(sse_u, 4) AS DOUBLE) AS sse_unrestricted,
               CAST(round((sse_r - sse_u) / (sse_u / (n - 3)), 6) AS DOUBLE)
                   AS f_stat
        FROM fit ORDER BY direction
    """,
)
def granger_lag1_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality between the click and purchase daily
    count series, BOTH directions: does adding yesterday's OTHER
    series to an AR(1) of the own series reduce SSE? F = (SSE_r −
    SSE_u)/(SSE_u/(n−3)) — the bivariate-VAR screening test behind
    "does marketing lead sales" dashboards, as two closed-form OLS
    fits (1- and 2-regressor normal equations) over centered moment
    sums.

    Determinism: all raw moments are exact integer sums; every
    centered sum, coefficient, and SSE is a fixed expression of
    those integers (no cross-engine accumulation of doubles), so the
    statistics are bit-identical before rounding.

    Scale: one day-grain conditional rollup, one lag window on the
    calendar-bounded frame, one moment aggregate — the fact scan
    happens once.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long").alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("y"),
    )
    wo = Window.orderBy("day")
    lagged = daily.select(
        "day", "x", "y",
        F.lag("x").over(wo).alias("xl"),
        F.lag("y").over(wo).alias("yl"),
    ).filter(F.col("xl").isNotNull())
    pairs = lagged.select(
        F.lit("click->purchase").alias("direction"),
        F.col("y").alias("t"), F.col("yl").alias("own"),
        F.col("xl").alias("other"),
    ).unionAll(
        lagged.select(
            F.lit("purchase->click"),
            F.col("x"), F.col("xl"), F.col("yl"),
        )
    )
    mom = pairs.groupBy("direction").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("own").cast("long").alias("s1"),
        F.sum("other").cast("long").alias("s2"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("qtt"),
        F.sum(F.col("own") * F.col("own")).cast("long").alias("q11"),
        F.sum(F.col("other") * F.col("other")).cast("long").alias("q22"),
        F.sum(F.col("t") * F.col("own")).cast("long").alias("pt1"),
        F.sum(F.col("t") * F.col("other")).cast("long").alias("pt2"),
        F.sum(F.col("own") * F.col("other")).cast("long").alias("p12"),
    )
    n = F.col("n")
    syy = F.col("qtt").cast("double") - F.col("st").cast("double") * F.col("st") / n
    s11 = F.col("q11").cast("double") - F.col("s1").cast("double") * F.col("s1") / n
    s22 = F.col("q22").cast("double") - F.col("s2").cast("double") * F.col("s2") / n
    sy1 = F.col("pt1").cast("double") - F.col("st").cast("double") * F.col("s1") / n
    sy2 = F.col("pt2").cast("double") - F.col("st").cast("double") * F.col("s2") / n
    s12 = F.col("p12").cast("double") - F.col("s1").cast("double") * F.col("s2") / n
    cent = mom.select("direction", "n",
                      syy.alias("syy"), s11.alias("s11"), s22.alias("s22"),
                      sy1.alias("sy1"), sy2.alias("sy2"), s12.alias("s12"))
    sse_r = F.col("syy") - F.col("sy1") * F.col("sy1") / F.col("s11")
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    sse_u = F.col("syy") - (
        (F.col("sy1") * F.col("s22") - F.col("sy2") * F.col("s12")) * F.col("sy1")
        + (F.col("sy2") * F.col("s11") - F.col("sy1") * F.col("s12")) * F.col("sy2")
    ) / det
    fit = cent.select("direction", "n", sse_r.alias("sse_r"), sse_u.alias("sse_u"))
    return fit.select(
        "direction", "n",
        F.round("sse_r", 4).alias("sse_restricted"),
        F.round("sse_u", 4).alias("sse_unrestricted"),
        F.round(
            (F.col("sse_r") - F.col("sse_u")) / (F.col("sse_u") / (F.col("n") - 3)),
            6,
        ).alias("f_stat"),
    ).orderBy("direction")


def _ipw_core_sql() -> str:
    """Shared oracle core for the IPW/AIPW pair: confounded minting,
    bin sufficient statistics, the logistic Newton walk, and per-bin
    fitted propensities (scored) + exact naive totals."""
    trt = md5_uniform_sql("concat('trt|', cast(user_id as varchar))")
    return f"""
        WITH peruser AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY user_id
        ), assigned AS (
            SELECT user_id, y, least(9, x // 5) AS x_bin,
                   CASE WHEN {trt} < 1.0 / (1.0 + exp(
                            -((least(9, x // 5) - 4.5) * 0.5)))
                        THEN 1 ELSE 0 END AS t
            FROM peruser
        ), bins AS (
            SELECT x_bin, CAST(count(*) AS BIGINT) AS n_b,
                   CAST(sum(t) AS BIGINT) AS t_b,
                   CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END)
                        AS BIGINT) AS sy_t,
                   CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END)
                        AS BIGINT) AS sy_c
            FROM assigned GROUP BY x_bin
        ), ib AS (
            SELECT *, CAST(row_number() OVER (ORDER BY x_bin)
                           AS BIGINT) AS idx,
                   CAST(count(*) OVER () AS BIGINT) AS nbins
            FROM bins
        ), walked AS (
            WITH RECURSIVE nr AS (
                SELECT 0 AS k, CAST(0.0 AS DOUBLE) AS b0,
                       CAST(0.0 AS DOUBLE) AS b1,
                       CAST(0 AS BIGINT) AS idx,
                       CAST(0.0 AS DOUBLE) AS u0,
                       CAST(0.0 AS DOUBLE) AS u1,
                       CAST(0.0 AS DOUBLE) AS i00,
                       CAST(0.0 AS DOUBLE) AS i01,
                       CAST(0.0 AS DOUBLE) AS i11
                UNION ALL
                SELECT * FROM (
                    SELECT q.k, q.b0, q.b1, q.tidx AS idx,
                           q.u0 + (q.t_b - q.n_b * q.p) AS u0,
                           q.u1 + (q.t_b - q.n_b * q.p) * q.x AS u1,
                           q.i00 + q.n_b * q.p * (1.0 - q.p) AS i00,
                           q.i01 + q.n_b * q.p * (1.0 - q.p) * q.x
                               AS i01,
                           q.i11 + q.n_b * q.p * (1.0 - q.p) * q.x
                               * q.x AS i11
                    FROM (
                        SELECT nr.k, nr.b0, nr.b1, nr.u0, nr.u1,
                               nr.i00, nr.i01, nr.i11,
                               tm.idx AS tidx, tm.n_b, tm.t_b,
                               tm.x_bin AS x,
                               1.0 / (1.0 + exp(
                                   -(nr.b0 + nr.b1 * tm.x_bin))) AS p
                        FROM nr JOIN ib tm ON tm.idx = nr.idx + 1
                        WHERE nr.k < 8
                    ) q
                    UNION ALL
                    SELECT nr.k + 1,
                           nr.b0 + (nr.i11 * nr.u0 - nr.i01 * nr.u1)
                               / (nr.i00 * nr.i11 - nr.i01 * nr.i01),
                           nr.b1 + (nr.i00 * nr.u1 - nr.i01 * nr.u0)
                               / (nr.i00 * nr.i11 - nr.i01 * nr.i01),
                           CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE),
                           CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                           CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
                    FROM nr JOIN (SELECT max(nbins) AS n FROM ib) c
                         ON nr.idx = c.n
                    WHERE nr.k < 8
                )
            ) SELECT * FROM nr
        ), finalb AS (
            SELECT b0, b1 FROM walked WHERE k = 8
        ), scored AS (
            SELECT s.x_bin, s.n_b, s.t_b, s.sy_t, s.sy_c,
                   1.0 / (1.0 + exp(-(f.b0 + f.b1 * s.x_bin))) AS p
            FROM ib s CROSS JOIN finalb f
        ), naive AS (
            SELECT CAST(sum(sy_t) AS BIGINT) AS syt,
                   CAST(sum(t_b) AS BIGINT) AS nt,
                   CAST(sum(sy_c) AS BIGINT) AS syc,
                   CAST(sum(n_b - t_b) AS BIGINT) AS nc,
                   CAST(sum(n_b) AS BIGINT) AS n_users
            FROM ib
        )"""


def _ipw_oracle() -> str:
    return f"""{_ipw_core_sql()}, folded AS (
            SELECT sum(sy_t / p) OVER w AS wy_t,
                   sum(t_b / p) OVER w AS w_t,
                   sum(sy_c / (1.0 - p)) OVER w AS wy_c,
                   sum((n_b - t_b) / (1.0 - p)) OVER w AS w_c,
                   row_number() OVER (ORDER BY x_bin DESC) AS rdesc
            FROM scored WINDOW w AS (ORDER BY x_bin)
        )
        SELECT CAST(round(f.b0, 6) AS DOUBLE) AS beta0,
               CAST(round(f.b1, 6) AS DOUBLE) AS beta1,
               CAST(round(CAST(n.syt AS DOUBLE) / n.nt
                          - CAST(n.syc AS DOUBLE) / n.nc, 6)
                    AS DOUBLE) AS ate_naive,
               CAST(round(d.wy_t / d.w_t - d.wy_c / d.w_c, 6)
                    AS DOUBLE) AS ate_ipw,
               n.n_users, n.nt AS n_treated
        FROM folded d CROSS JOIN finalb f CROSS JOIN naive n
        WHERE d.rdesc = 1
    """


def _confounded_bins_and_propensity(spark, sf_dir):
    """Shared Spark-side core for the IPW/AIPW pair: build the
    confounded-assignment bin table (bounded 10-row frame; see
    ipw_propensity_ate for the construction contract), collect it in
    ascending-bin order, and Newton-fit the logistic propensity with
    the pinned accumulation the oracles replay. Returns
    (bins, beta0, beta1)."""
    import math

    from ..functions.sampling import md5_uniform

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    peruser = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0))
        .cast("long").alias("x"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0))
        .cast("long").alias("y"),
    )
    x_bin = F.least(F.lit(9), F.floor(F.col("x") / 5)).cast("long")
    assigned = peruser.select(
        "y",
        x_bin.alias("x_bin"),
        F.when(
            md5_uniform("concat('trt|', cast(user_id as string))")
            < 1.0 / (1.0 + F.exp(-((x_bin - 4.5) * 0.5))),
            1,
        ).otherwise(0).alias("t"),
    )
    bins = (
        assigned.groupBy("x_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum("t").cast("long").alias("t_b"),
            F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
            .cast("long").alias("sy_t"),
            F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
            .cast("long").alias("sy_c"),
        )
        .orderBy("x_bin")
        .collect()
    )
    b0 = b1 = 0.0
    for _ in range(8):
        u0 = u1 = i00 = i01 = i11 = 0.0
        for r in bins:  # pinned: ascending x_bin
            x, n, t = r["x_bin"], r["n_b"], r["t_b"]
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
            u0 = u0 + (t - n * p)
            u1 = u1 + (t - n * p) * x
            i00 = i00 + n * p * (1.0 - p)
            i01 = i01 + n * p * (1.0 - p) * x
            i11 = i11 + n * p * (1.0 - p) * x * x
        det = i00 * i11 - i01 * i01
        b0 = b0 + (i11 * u0 - i01 * u1) / det
        b1 = b1 + (i00 * u1 - i01 * u0) / det
    return bins, b0, b1


@query(
    "ipw_propensity_ate",
    category="CA-ipw",
    oracle=_ipw_oracle(),
)
def ipw_propensity_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted ATE with a FITTED logistic
    propensity — the observational-causal estimator the A/B family
    lacks (DiD assumes parallel trends; CUPED assumes randomization;
    IPW handles CONFOUNDED assignment): treatment here is minted
    confounded by construction (an md5 coin whose head probability
    is a sigmoid in the user's early-period activity bin), so the
    naive treated-minus-control outcome difference is biased by
    activity, and the Hájek-normalized IPW contrast
    Σ(T·Y/p̂)/Σ(T/p̂) − Σ((1−T)Y/(1−p̂))/Σ((1−T)/(1−p̂)) removes it.
    Both estimates are emitted side by side — the gap IS the
    confounding the weights corrected.

    The propensity model is logistic regression fit by
    Newton-Raphson (8 iterations from 0) on GROUPED data: because
    the covariate is the binned early-activity decile, the per-bin
    sufficient statistics (n_b, treated_b) are exact integers on a
    BOUNDED 10-row frame, so the fit is driver-side metadata work
    (the Cox/Huffman collect pattern) and the oracle replays the
    identical walk — score and information accumulated bin-by-bin
    in ascending-bin order, the 2×2 Newton solve written with the
    same parenthesization — as a recursive CTE.

    Scale: one user-keyed groupBy builds (x, y) per user; one more
    groupBy collapses to the bin frame; everything after is bounded
    algebra. The IPW sums themselves decompose per bin (Y-sums per
    arm are integers), folded in pinned bin order.
    """
    import math

    bins, b0, b1 = _confounded_bins_and_propensity(spark, sf_dir)
    wy_t = w_t = wy_c = w_c = 0.0
    syt = nt = syc = nc = n_users = 0
    for r in bins:  # pinned: ascending x_bin
        x, n, t = r["x_bin"], r["n_b"], r["t_b"]
        p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
        wy_t = wy_t + r["sy_t"] / p
        w_t = w_t + t / p
        wy_c = wy_c + r["sy_c"] / (1.0 - p)
        w_c = w_c + (n - t) / (1.0 - p)
        syt += r["sy_t"]
        nt += t
        syc += r["sy_c"]
        nc += n - t
        n_users += n
    out = [
        (
            round(b0, 6),
            round(b1, 6),
            round(float(syt) / nt - float(syc) / nc, 6),
            round(wy_t / w_t - wy_c / w_c, 6),
            n_users,
            nt,
        )
    ]
    return spark.createDataFrame(
        out,
        "beta0 double, beta1 double, ate_naive double,"
        " ate_ipw double, n_users long, n_treated long",
    )


def _aipw_oracle() -> str:
    return f"""{_ipw_core_sql()}, mom AS (
            SELECT CAST(sum(t_b) AS BIGINT) AS wt,
                   CAST(sum(t_b * x_bin) AS BIGINT) AS sxt,
                   CAST(sum(t_b * x_bin * x_bin) AS BIGINT) AS sxxt,
                   CAST(sum(sy_t) AS BIGINT) AS syt,
                   CAST(sum(x_bin * sy_t) AS BIGINT) AS sxyt,
                   CAST(sum(n_b - t_b) AS BIGINT) AS wc,
                   CAST(sum((n_b - t_b) * x_bin) AS BIGINT) AS sxc,
                   CAST(sum((n_b - t_b) * x_bin * x_bin) AS BIGINT)
                       AS sxxc,
                   CAST(sum(sy_c) AS BIGINT) AS syc,
                   CAST(sum(x_bin * sy_c) AS BIGINT) AS sxyc
            FROM ib
        ), slope AS (
            SELECT (CAST(wt AS DOUBLE) * sxyt
                    - CAST(sxt AS DOUBLE) * syt)
                   / (CAST(wt AS DOUBLE) * sxxt
                      - CAST(sxt AS DOUBLE) * sxt) AS b1t,
                   (CAST(wc AS DOUBLE) * sxyc
                    - CAST(sxc AS DOUBLE) * syc)
                   / (CAST(wc AS DOUBLE) * sxxc
                      - CAST(sxc AS DOUBLE) * sxc) AS b1c,
                   wt, sxt, syt, wc, sxc, syc
            FROM mom
        ), coef AS (
            SELECT b1t, b1c,
                   (syt - b1t * sxt) / wt AS a1t,
                   (syc - b1c * sxc) / wc AS a1c
            FROM slope
        ), terms AS (
            SELECT s.x_bin,
                   s.n_b * ((c.a1t + c.b1t * s.x_bin)
                            - (c.a1c + c.b1c * s.x_bin))
                   + (s.sy_t - s.t_b * (c.a1t + c.b1t * s.x_bin))
                     / s.p
                   - (s.sy_c - (s.n_b - s.t_b)
                               * (c.a1c + c.b1c * s.x_bin))
                     / (1.0 - s.p) AS term
            FROM scored s CROSS JOIN coef c
        ), folded AS (
            SELECT sum(term) OVER (ORDER BY x_bin) AS psi,
                   row_number() OVER (ORDER BY x_bin DESC) AS rdesc
            FROM terms
        )
        SELECT CAST(round(c.a1t, 6) AS DOUBLE) AS mu1_intercept,
               CAST(round(c.b1t, 6) AS DOUBLE) AS mu1_slope,
               CAST(round(c.a1c, 6) AS DOUBLE) AS mu0_intercept,
               CAST(round(c.b1c, 6) AS DOUBLE) AS mu0_slope,
               CAST(round(CAST(n.syt AS DOUBLE) / n.nt
                          - CAST(n.syc AS DOUBLE) / n.nc, 6)
                    AS DOUBLE) AS ate_naive,
               CAST(round(d.psi / n.n_users, 6) AS DOUBLE) AS ate_aipw,
               n.n_users
        FROM folded d CROSS JOIN coef c CROSS JOIN naive n
        WHERE d.rdesc = 1
    """


@query(
    "aipw_doubly_robust_ate",
    category="CA-aipw",
    oracle=_aipw_oracle(),
)
def aipw_doubly_robust_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AIPW (augmented IPW / doubly-robust) ATE — the estimator that
    stays consistent if EITHER the propensity model OR the outcome
    model is right: ψ = (1/N) Σ [m̂₁(x) − m̂₀(x)
    + T(y − m̂₁(x))/p̂(x) − (1−T)(y − m̂₀(x))/(1−p̂(x))].
    Shares the confounded-assignment construction, the bounded bin
    frame, and the Newton-fitted logistic propensity with
    ipw_propensity_ate (one helper, one oracle core); adds per-arm
    LINEAR outcome models y ~ a + b·x fit by closed-form weighted
    OLS whose moments (Σw, Σwx, Σwx², Σy, Σxy per arm) are EXACT
    integers off the same bin table — one division per coefficient.
    The ψ sum decomposes per bin (arm Y-sums are integers), folded
    in pinned ascending-bin order.

    Scale: identical to the IPW query — two fact groupBys down to a
    10-row frame, then bounded algebra; the augmentation adds one
    integer moment pass, no new shuffles.
    """
    bins, b0, b1 = _confounded_bins_and_propensity(spark, sf_dir)
    import math

    wt = sxt = sxxt = syt = sxyt = 0
    wc = sxc = sxxc = syc = sxyc = 0
    for r in bins:
        x, n, t = r["x_bin"], r["n_b"], r["t_b"]
        wt += t
        sxt += t * x
        sxxt += t * x * x
        syt += r["sy_t"]
        sxyt += x * r["sy_t"]
        c = n - t
        wc += c
        sxc += c * x
        sxxc += c * x * x
        syc += r["sy_c"]
        sxyc += x * r["sy_c"]
    b1t = (float(wt) * sxyt - float(sxt) * syt) / (
        float(wt) * sxxt - float(sxt) * sxt
    )
    b1c = (float(wc) * sxyc - float(sxc) * syc) / (
        float(wc) * sxxc - float(sxc) * sxc
    )
    a1t = (syt - b1t * sxt) / wt
    a1c = (syc - b1c * sxc) / wc
    psi = 0.0
    n_users = nt = nc = 0
    for r in bins:  # pinned: ascending x_bin
        x, n, t = r["x_bin"], r["n_b"], r["t_b"]
        p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
        m1 = a1t + b1t * x
        m0 = a1c + b1c * x
        # term built exactly like the oracle's `term` column, THEN
        # folded — association order matters for bit-identity
        term = (
            n * (m1 - m0)
            + (r["sy_t"] - t * m1) / p
            - (r["sy_c"] - (n - t) * m0) / (1.0 - p)
        )
        psi = psi + term
        n_users += n
        nt += t
        nc += n - t
    sy_t_tot = sum(r["sy_t"] for r in bins)
    sy_c_tot = sum(r["sy_c"] for r in bins)
    out = [
        (
            round(a1t, 6),
            round(b1t, 6),
            round(a1c, 6),
            round(b1c, 6),
            round(float(sy_t_tot) / nt - float(sy_c_tot) / nc, 6),
            round(psi / n_users, 6),
            n_users,
        )
    ]
    return spark.createDataFrame(
        out,
        "mu1_intercept double, mu1_slope double, mu0_intercept double,"
        " mu0_slope double, ate_naive double, ate_aipw double,"
        " n_users long",
    )
