"""Model-evaluation / metric-science operators.

The readouts a scoring pipeline produces once a model (or heuristic
score) meets labeled events: ROC-AUC + KS discrimination, calibration
(reliability bins + Brier), revenue concentration (Gini), survival
(Kaplan-Meier churn curve), forecast accuracy (MASE/WAPE/SMAPE),
dependence (mutual information), corpus readability, and a
permutation test whose replicas are md5-minted (deterministic, no
RNG state — the repo's standing reproducibility discipline).

Float discipline (shared by every query here): all counts and
cent/bucket sums are exact integers; each emitted ratio is a SINGLE
IEEE division (or a fixed-order prefix sum) of those integers, so
cross-engine results are bit-identical before the cosmetic round(6).
Where a transcendental enters (ln in MI/KM), per-term 1-ulp engine
divergence is bounded well below the round-6 grid and the term count
is bucket-bounded, not row-bounded.

Scale notes are per-query; the common shape is one map-side-
combinable aggregate over the fact scan plus windows that run only on
value-domain-bounded frames (score buckets, duration days, calendar
days, type×hour cells) — never on raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "roc_auc_ks_scorecard",
    category="ML1-auc",
    oracle="""
        WITH g AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS pos,
                   CAST(floor(value) AS BIGINT) AS v
            FROM events
            WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
        ), per_v AS (
            SELECT v, CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(pos) AS BIGINT) AS np
            FROM g GROUP BY v
        ), tot AS (
            SELECT CAST(sum(np) AS BIGINT) AS n1,
                   CAST(sum(cnt - np) AS BIGINT) AS n0
            FROM per_v
        ), ranked AS (
            SELECT v, cnt, np,
                   CAST(coalesce(sum(cnt) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS below,
                   CAST(sum(np) OVER (ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
                   CAST(sum(cnt - np) OVER (ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_neg
            FROM per_v
        ), stat AS (
            SELECT CAST(sum(np * (2 * below + cnt + 1)) AS BIGINT) AS r2,
                   max(abs(CAST(cum_pos AS DOUBLE) / n1
                           - CAST(cum_neg AS DOUBLE) / n0)) AS ks
            FROM ranked CROSS JOIN tot
        )
        SELECT n1 AS n_pos, n0 AS n_neg,
               round(CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
                     / (2.0 * n1 * n0), 6) AS auc,
               round(CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
                     / (1.0 * n1 * n0) - 1.0, 6) AS gini_index,
               round(ks, 6) AS ks_stat
        FROM stat CROSS JOIN tot
    """,
)
def roc_auc_ks_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC via the rank identity (AUC = U/(n1·n0), midrank ties)
    plus the KS discrimination statistic — the two numbers a scoring
    model review leads with, computed WITHOUT materializing a per-row
    ROC curve. Score = integer-bucketed `value`, positives =
    purchases vs click negatives.

    The doubled midrank sum r2 = Σ np·(2·below + cnt + 1) keeps the
    rank arithmetic in exact int64 (the mann_whitney_u construction);
    AUC and Gini(=2·AUC−1) are each ONE division of integers. The KS
    scan takes max over per-bucket (cum_pos/n1 − cum_neg/n0): each
    term is two integer divisions and one subtract — IEEE-identical
    cross-engine, so the max is too.

    Scale: one bucket-grain aggregate over the scan; all windows run
    on the ≤501-row distinct-score frame (value-domain bounded).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    )
    per_v = (
        ev.select(
            (F.col("event_type") == "purchase").cast("int").alias("pos"),
            F.floor("value").cast("long").alias("v"),
        )
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("pos").cast("long").alias("np"),
        )
    )
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_v.select(
        "v", "cnt", "np",
        F.coalesce(F.sum("cnt").over(wb), F.lit(0)).cast("long").alias("below"),
        F.sum("np").over(wc).cast("long").alias("cum_pos"),
        F.sum(F.col("cnt") - F.col("np")).over(wc).cast("long").alias("cum_neg"),
    )
    tot = per_v.agg(
        F.sum("np").cast("long").alias("n1"),
        F.sum(F.col("cnt") - F.col("np")).cast("long").alias("n0"),
    )
    stat = ranked.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.col("np") * (2 * F.col("below") + F.col("cnt") + 1))
        .cast("long").alias("r2"),
        F.max(
            F.abs(
                F.col("cum_pos").cast("double") / F.col("n1")
                - F.col("cum_neg").cast("double") / F.col("n0")
            )
        ).alias("ks"),
    )
    return stat.crossJoin(F.broadcast(tot)).select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        F.round(
            (F.col("r2") - F.col("n1") * (F.col("n1") + 1)).cast("double")
            / (F.lit(2.0) * F.col("n1") * F.col("n0")), 6
        ).alias("auc"),
        F.round(
            (F.col("r2") - F.col("n1") * (F.col("n1") + 1)).cast("double")
            / (F.lit(1.0) * F.col("n1") * F.col("n0")) - 1.0, 6
        ).alias("gini_index"),
        F.round("ks", 6).alias("ks_stat"),
    )


@query(
    "calibration_bins_brier",
    category="ML2-calibration",
    oracle="""
        WITH g AS (
            SELECT least(CAST(floor(value) AS BIGINT), 329) AS fv,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
            WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
        ), scored AS (
            SELECT CAST(fv // 33 AS BIGINT) AS bin,
                   CAST(fv AS DOUBLE) / 330.0 AS p, y
            FROM g
        ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM scored)
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(p), 6) AS mean_p,
               round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS obs_rate,
               round(avg((p - y) * (p - y)), 6) AS brier,
               round(CAST(count(*) AS DOUBLE) / n_all, 6) AS weight
        FROM scored CROSS JOIN tot
        GROUP BY bin, n_all ORDER BY bin
    """,
)
def calibration_bins_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + per-bin Brier score: a pseudo-probability
    p = clamp(⌊value⌋,329)/330 is scored against the purchase label in
    10 equal-width bins (bin minted by INTEGER division fv//33 — no
    float boundary can disagree across engines). mean_p vs obs_rate
    per bin is the calibration readout; Σ weight·|mean_p − obs_rate|
    is ECE, recoverable from the emitted columns.

    obs_rate and weight are single divisions of exact counts; mean_p
    and brier average doubles whose accumulation-order drift
    (~1e-15 rel) dies at round 6 (repo float discipline).

    Scale: one 10-ary hash aggregate over the scan + a 1-row total
    broadcast — fully map-side combinable.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    )
    fv = F.least(F.floor("value").cast("long"), F.lit(329))
    scored = ev.select(
        F.floor(fv / 33).cast("long").alias("bin"),
        (fv.cast("double") / F.lit(330.0)).alias("p"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    tot = scored.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    return (
        scored.crossJoin(F.broadcast(tot))
        .groupBy("bin", "n_all")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("p"), 6).alias("mean_p"),
            F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6)
            .alias("obs_rate"),
            F.round(F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))), 6)
            .alias("brier"),
            F.round(F.count(F.lit(1)).cast("double") / F.first("n_all"), 6)
            .alias("weight"),
        )
        .select("bin", "n", "mean_p", "obs_rate", "brier", "weight")
    )


@query(
    "gini_revenue_concentration",
    category="ML3-gini",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        // 100 AS BIGINT) AS dollars
            FROM orders GROUP BY o_custkey
        ), per_v AS (
            SELECT dollars AS v, CAST(count(*) AS BIGINT) AS cnt
            FROM per_cust GROUP BY dollars
        ), ranked AS (
            SELECT v, cnt,
                   CAST(coalesce(sum(cnt) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS below
            FROM per_v
        ), agg AS (
            SELECT CAST(sum(cnt) AS BIGINT) AS n,
                   CAST(sum(v * cnt) AS BIGINT) AS s,
                   CAST(sum(v * (2 * below * cnt + cnt * (cnt + 1)))
                        AS BIGINT) AS t2
            FROM ranked
        )
        SELECT n AS n_customers, s AS total_dollars,
               round(CAST(t2 - (n + 1) * s AS DOUBLE) / (1.0 * n * s), 6)
                   AS gini
        FROM agg
    """,
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the inequality number
    behind every "top x% of customers drive y%" slide — via the
    grouped-data identity G = (T2 − (n+1)·S)/(n·S) where
    T2 = Σ_v v·(2·below·cnt + cnt·(cnt+1)) doubles the rank-weighted
    sum Σ i·x_i (ties contribute their midrank block, and Σ i·x_i is
    permutation-invariant within ties, so no tiebreak is needed).
    Revenue is dollarized from exact integer cents (floor-half-cent
    mint, then integer division) so every accumulator is int64.

    Headroom: T2 ≤ v_max·2n·n ≈ 5e6·2n² — int64-safe to n ≈ 3e7
    customers at TPC-H dollar scales; beyond that, dollarize coarser
    (the docstring'd knob) or shard T2 by value range.

    Scale: customer-grain aggregate, then everything runs on the
    distinct-dollar frame (value-domain bounded); the only window is
    the prefix count over that frame. No per-row global rank — this
    is the Gini construction that avoids sorting all customers.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            / 100
        ).cast("long").alias("dollars")
    )
    per_v = per_cust.groupBy(F.col("dollars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.select(
        "v", "cnt",
        F.coalesce(F.sum("cnt").over(wb), F.lit(0)).cast("long").alias("below"),
    )
    agg = ranked.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("v") * F.col("cnt")).cast("long").alias("s"),
        F.sum(
            F.col("v")
            * (2 * F.col("below") * F.col("cnt")
               + F.col("cnt") * (F.col("cnt") + 1))
        ).cast("long").alias("t2"),
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        F.col("s").alias("total_dollars"),
        F.round(
            (F.col("t2") - (F.col("n") + 1) * F.col("s")).cast("double")
            / (F.lit(1.0) * F.col("n") * F.col("s")), 6
        ).alias("gini"),
    )


@query(
    "kaplan_meier_churn",
    category="ML4-survival",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   min(CAST(ts AS DATE)) AS first_d,
                   min(CASE WHEN event_type = 'purchase'
                       THEN CAST(ts AS DATE) END) AS conv_d
            FROM events GROUP BY user_id
        ), horizon AS (
            SELECT max(CAST(ts AS DATE)) AS obs_end FROM events
        ), lifetimes AS (
            SELECT CASE WHEN conv_d IS NOT NULL
                        THEN CAST(date_diff('day', first_d, conv_d) AS BIGINT)
                        ELSE CAST(date_diff('day', first_d, obs_end) AS BIGINT)
                   END AS dur,
                   CASE WHEN conv_d IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM per_user CROSS JOIN horizon
        ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM lifetimes),
        per_t AS (
            SELECT dur AS t, CAST(sum(ev) AS BIGINT) AS d,
                   CAST(count(*) - sum(ev) AS BIGINT) AS c
            FROM lifetimes GROUP BY dur
        ), curve AS (
            SELECT t, d, c,
                   n_users - CAST(coalesce(sum(d + c) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS n_risk
            FROM per_t CROSS JOIN tot
        ), km AS (
            SELECT t, d, c, n_risk,
                   CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                            OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
                        THEN 0.0
                        ELSE exp(sum(CASE WHEN d < n_risk
                                 THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                                 ELSE 0.0 END)
                             OVER (ORDER BY t ROWS UNBOUNDED PRECEDING))
                   END AS surv,
                   sum(CAST(d AS DOUBLE) / n_risk)
                       OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS haz
            FROM curve
        )
        SELECT t AS day, n_risk, d AS n_converted, c AS n_censored,
               round(surv, 6) AS km_survival,
               round(haz, 6) AS na_cum_hazard
        FROM km WHERE d > 0 ORDER BY day
    """,
)
def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit curve for time-to-first-purchase:
    the "event" is a user's first purchase (dur = days from first
    activity), and users who never purchase are CENSORED at the
    observation horizon (their conversion time is a lower bound —
    exactly what KM exists to handle; dropping them would bias
    conversion up). S(t) = Π(1 − d_i/n_i) over conversion days; the
    Nelson-Aalen cumulative hazard Σ d_i/n_i rides along.

    Determinism: risk sets and event counts are exact integers from
    one prefix window over the ≤31-row duration frame; each hazard
    term is ONE integer division; the KM product is exp∘Σln with a
    FIXED summation order (window prefix), so only ln/exp 1-ulp
    engine divergence remains — orders of magnitude under round 6.

    Scale: user-grain aggregate + 1-row horizon broadcast; everything
    after runs on the duration-day frame (calendar-bounded).
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_d"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("conv_d"),
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("obs_end"))
    lifetimes = per_user.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("conv_d").isNotNull(),
            F.datediff("conv_d", "first_d").cast("long"),
        ).otherwise(
            F.datediff("obs_end", "first_d").cast("long")
        ).alias("dur"),
        F.when(F.col("conv_d").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    tot = lifetimes.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    per_t = lifetimes.groupBy(F.col("dur").alias("t")).agg(
        F.sum("ev").cast("long").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).cast("long").alias("c"),
    )
    wb = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    curve = per_t.crossJoin(F.broadcast(tot)).select(
        "t", "d", "c",
        (
            F.col("n_users")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wb), F.lit(0))
        ).cast("long").alias("n_risk"),
    )
    km = curve.select(
        "t", "d", "c", "n_risk",
        # S(t) hits exactly 0 when a duration absorbs its whole risk
        # set (d == n_risk): ln(0) is undefined (DuckDB raises, Spark
        # NULLs), so guard the log term and pin surv to 0.0 from the
        # first absorbing row onward — identical CASE logic oracle-side.
        F.when(
            F.max(
                F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
            ).over(wc) == 1,
            F.lit(0.0),
        ).otherwise(
            F.exp(
                F.sum(
                    F.when(
                        F.col("d") < F.col("n_risk"),
                        F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")),
                    ).otherwise(F.lit(0.0))
                ).over(wc)
            )
        ).alias("surv"),
        F.sum(F.col("d").cast("double") / F.col("n_risk")).over(wc).alias("haz"),
    )
    return (
        km.filter(F.col("d") > 0)
        .select(
            F.col("t").alias("day"), "n_risk",
            F.col("d").alias("n_converted"), F.col("c").alias("n_censored"),
            F.round("surv", 6).alias("km_survival"),
            F.round("haz", 6).alias("na_cum_hazard"),
        )
        .orderBy("day")
    )


@query(
    "seasonal_naive_mase",
    category="ML5-forecast-acc",
    oracle="""
        WITH daily0 AS (
            SELECT CAST(ts AS DATE) AS d,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY d
        ), bounds AS (
            SELECT min(d) AS d0, max(d) AS d1 FROM daily0
        ), spine AS (
            SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                        AS DATE) AS d
            FROM bounds
        ), daily AS (
            SELECT s.d, coalesce(x.cents, 0) AS cents
            FROM spine s LEFT JOIN daily0 x ON s.d = x.d
        ), lagged AS (
            SELECT d, cents,
                   lag(cents, 7) OVER (ORDER BY d) AS f_seasonal,
                   lag(cents, 1) OVER (ORDER BY d) AS f_naive
            FROM daily
        ), scored AS (
            SELECT abs(cents - f_seasonal) AS es,
                   abs(cents - f_naive) AS en,
                   CASE WHEN cents + f_seasonal > 0 THEN
                       2.0 * abs(cents - f_seasonal)
                           / (CAST(cents AS DOUBLE) + f_seasonal)
                   ELSE CAST(0.0 AS DOUBLE) END AS smape_term,
                   cents
            FROM lagged WHERE f_seasonal IS NOT NULL
        )
        SELECT CAST(count(*) AS BIGINT) AS n_scored_days,
               round(CAST(sum(es) AS DOUBLE) / sum(en), 6) AS mase,
               round(CAST(sum(es) AS DOUBLE) / sum(cents), 6) AS wape,
               round(avg(smape_term), 6) AS smape
        FROM scored
    """,
)
def seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy scorecard for the seasonal-naive baseline
    (ŷ_t = y_{t−7}) on daily purchase revenue: MASE scales its MAE by
    the 1-day-naive MAE over the same scoring window (>1 ⇒ weekly
    seasonality isn't helping), WAPE by actual volume; SMAPE rides
    along. The day spine is gap-filled to zeros first so lag(7) means
    "7 calendar days", not "7 observed rows" — the silent bug in most
    hand-rolled MASE jobs.

    MASE and WAPE are single divisions of exact integer cent sums;
    SMAPE averages per-term single divisions (order drift dies at
    round 6).

    Scale: one day-grain combinable aggregate over the scan; spine
    and lags live on the calendar frame (≤ a few thousand rows for
    years of data).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    daily0 = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long").alias("cents")
    )
    bounds = daily0.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("d")
    )
    daily = spine.join(daily0, "d", "left").select(
        "d", F.coalesce("cents", F.lit(0)).cast("long").alias("cents")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d", "cents",
        F.lag("cents", 7).over(w).alias("f_seasonal"),
        F.lag("cents", 1).over(w).alias("f_naive"),
    )
    scored = lagged.filter(F.col("f_seasonal").isNotNull()).select(
        F.abs(F.col("cents") - F.col("f_seasonal")).alias("es"),
        F.abs(F.col("cents") - F.col("f_naive")).alias("en"),
        F.when(
            F.col("cents") + F.col("f_seasonal") > 0,
            2.0 * F.abs(F.col("cents") - F.col("f_seasonal"))
            / (F.col("cents").cast("double") + F.col("f_seasonal")),
        ).otherwise(F.lit(0.0)).alias("smape_term"),
        "cents",
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_scored_days"),
        F.round(F.sum("es").cast("double") / F.sum("en"), 6).alias("mase"),
        F.round(F.sum("es").cast("double") / F.sum("cents"), 6).alias("wape"),
        F.round(F.avg("smape_term"), 6).alias("smape"),
    )


@query(
    "mutual_information_type_hour",
    category="ML6-mi",
    oracle="""
        WITH cells AS (
            SELECT event_type AS et, CAST(hour(ts) AS INT) AS h,
                   CAST(count(*) AS BIGINT) AS nxy
            FROM events GROUP BY et, h
        ), m AS (
            SELECT et, h, nxy,
                   CAST(sum(nxy) OVER (PARTITION BY et) AS BIGINT) AS nx,
                   CAST(sum(nxy) OVER (PARTITION BY h) AS BIGINT) AS ny,
                   n
            FROM cells CROSS JOIN
                 (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cells) t
        ), mi AS (
            SELECT max(n) AS n_events,
                   sum((CAST(nxy AS DOUBLE) / n)
                       * ln(CAST(nxy AS DOUBLE) * n
                            / (CAST(nx AS DOUBLE) * ny))) AS mi_nats
            FROM m
        ), hx AS (
            SELECT -sum((CAST(nx AS DOUBLE) / n)
                        * ln(CAST(nx AS DOUBLE) / n)) AS h_type
            FROM (SELECT DISTINCT et, nx, n FROM m)
        ), hy AS (
            SELECT -sum((CAST(ny AS DOUBLE) / n)
                        * ln(CAST(ny AS DOUBLE) / n)) AS h_hour
            FROM (SELECT DISTINCT h, ny, n FROM m)
        )
        SELECT n_events, round(mi_nats, 6) AS mi_nats,
               round(h_type, 6) AS h_type, round(h_hour, 6) AS h_hour,
               round(mi_nats / sqrt(h_type * h_hour), 6) AS nmi
        FROM mi CROSS JOIN hx CROSS JOIN hy
    """,
)
def mutual_information_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour-of-day — the
    dependence readout feature-selection and drift monitors use when
    correlation can't see categorical structure — plus both marginal
    entropies and normalized MI = MI/√(H_x·H_y).

    All probabilities are single divisions of exact int64 counts from
    ONE type×hour aggregate (≤ 5×24 cells); ln terms accumulate over
    that bounded frame, so order drift + 1-ulp ln divergence sit far
    under round 6. The nxy·n product stays in double (exact for
    counts below 2^53 — 9e15 events, documented headroom).

    Scale: one map-side-combinable aggregate over the scan; margins
    via windows on the 120-cell frame.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("et"), F.hour("ts").cast("int").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("nxy"))
    tot = cells.agg(F.sum("nxy").cast("long").alias("n"))
    m = cells.crossJoin(F.broadcast(tot)).select(
        "et", "h", "nxy", "n",
        F.sum("nxy").over(Window.partitionBy("et")).cast("long").alias("nx"),
        F.sum("nxy").over(Window.partitionBy("h")).cast("long").alias("ny"),
    )
    mi = m.agg(
        F.max("n").alias("n_events"),
        F.sum(
            (F.col("nxy").cast("double") / F.col("n"))
            * F.log(
                F.col("nxy").cast("double") * F.col("n")
                / (F.col("nx").cast("double") * F.col("ny"))
            )
        ).alias("mi_nats"),
    )
    hx = (
        m.select("et", "nx", "n").distinct()
        .agg(
            (-F.sum(
                (F.col("nx").cast("double") / F.col("n"))
                * F.log(F.col("nx").cast("double") / F.col("n"))
            )).alias("h_type")
        )
    )
    hy = (
        m.select("h", "ny", "n").distinct()
        .agg(
            (-F.sum(
                (F.col("ny").cast("double") / F.col("n"))
                * F.log(F.col("ny").cast("double") / F.col("n"))
            )).alias("h_hour")
        )
    )
    return (
        mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
        .select(
            "n_events",
            F.round("mi_nats", 6).alias("mi_nats"),
            F.round("h_type", 6).alias("h_type"),
            F.round("h_hour", 6).alias("h_hour"),
            F.round(
                F.col("mi_nats") / F.sqrt(F.col("h_type") * F.col("h_hour")), 6
            ).alias("nmi"),
        )
    )


@query(
    "syllable_readability_profile",
    category="L5-readability",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source,
                   unnest(string_split(text, ' ')) AS w
            FROM documents
        ), syl AS (
            SELECT doc_id, source,
                   greatest(1,
                       length(regexp_replace(w, '[aeiouy]+', '#', 'g'))
                       - length(replace(regexp_replace(w, '[aeiouy]+', '#',
                                                       'g'), '#', ''))
                   ) AS s
            FROM toks WHERE w <> ''
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(s) AS BIGINT) AS n_syllables,
               CAST(sum(CASE WHEN s >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_polysyllabic,
               round(CAST(sum(s) AS DOUBLE) / count(*), 6)
                   AS syllables_per_word,
               round(CAST(sum(CASE WHEN s >= 3 THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS polysyllable_rate,
               round(206.835 - 84.6 * (CAST(sum(s) AS DOUBLE) / count(*)),
                     6) AS flesch_word_component
        FROM syl GROUP BY source ORDER BY source
    """,
)
def syllable_readability_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source readability profile on the heuristic every classic
    formula (Flesch, SMOG, FK-grade) is built from: syllables ≈
    vowel-group runs per word, counted by collapsing [aeiouy]+ runs
    to a marker and diffing lengths — pure string ops that agree
    byte-for-byte across engines (ASCII corpus; the repo's Unicode
    case-mapping convention doesn't bite). Emits syllables/word,
    polysyllable rate (the SMOG input), and the word-level Flesch
    component (the sentence-length term is corpus-degenerate here —
    the testdata has no sentence punctuation — and is documented
    out).

    Counts are exact integers; the two rates and the Flesch affine
    map are single divisions/affine ops — IEEE-identical.

    Scale: explode + one source-grain combinable aggregate; no joins,
    no windows.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    marked = F.regexp_replace(F.col("w"), "[aeiouy]+", "#")
    syl = toks.select(
        "source",
        F.greatest(
            F.lit(1),
            F.length(marked) - F.length(F.regexp_replace(marked, "#", "")),
        ).alias("s"),
    )
    return (
        syl.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("s").cast("long").alias("n_syllables"),
            F.sum((F.col("s") >= 3).cast("int")).cast("long")
            .alias("n_polysyllabic"),
        )
        .select(
            "source", "n_words", "n_syllables", "n_polysyllabic",
            F.round(
                F.col("n_syllables").cast("double") / F.col("n_words"), 6
            ).alias("syllables_per_word"),
            F.round(
                F.col("n_polysyllabic").cast("double") / F.col("n_words"), 6
            ).alias("polysyllable_rate"),
            F.round(
                F.lit(206.835)
                - F.lit(84.6)
                * (F.col("n_syllables").cast("double") / F.col("n_words")), 6
            ).alias("flesch_word_component"),
        )
    )


@query(
    "permutation_test_mean_diff",
    category="ST6-permutation",
    oracle="""
        WITH base AS (
            SELECT event_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
            WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
        ), obs AS (
            SELECT CAST(sum(CASE WHEN y = 1 THEN cents END) AS DOUBLE)
                       / sum(y)
                   - CAST(sum(CASE WHEN y = 0 THEN cents END) AS DOUBLE)
                       / sum(1 - y) AS d_obs,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM base
        ), reps AS (
            SELECT r, b.cents,
                   CAST('0x' || substr(md5(CAST(b.event_id AS VARCHAR)
                                           || ':' || CAST(r AS VARCHAR)),
                                       1, 6) AS BIGINT) % 2 AS grp
            FROM base b CROSS JOIN
                 (SELECT unnest(generate_series(1, 200)) AS r)
        ), per_rep AS (
            SELECT r,
                   CAST(sum(CASE WHEN grp = 1 THEN cents END) AS DOUBLE)
                       / sum(grp)
                   - CAST(sum(CASE WHEN grp = 0 THEN cents END) AS DOUBLE)
                       / sum(1 - grp) AS d_r
            FROM reps GROUP BY r
        )
        SELECT n_events,
               round(d_obs / 100.0, 4) AS obs_diff_dollars,
               CAST(sum(CASE WHEN abs(d_r) >= abs(d_obs)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
               round((1.0 + sum(CASE WHEN abs(d_r) >= abs(d_obs)
                                THEN 1 ELSE 0 END)) / 201.0, 6) AS p_value
        FROM per_rep CROSS JOIN obs
        GROUP BY n_events, d_obs
    """,
)
def permutation_test_mean_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the purchase-vs-click mean-value gap with
    md5-MINTED relabelings — 200 deterministic pseudo-permutations
    (grp = md5(event_id:r) low bits), so both engines see the exact
    same label matrix and the p-value is reproducible run-to-run, the
    repo's no-RNG-state discipline. p = (1 + #extreme)/(R+1), the
    add-one form that never reports p=0.

    Exactness: per-replica group sums are int64 cents; each mean-diff
    is two divisions + one subtract of exact integers — IEEE-bit-
    identical cross-engine — so the |d_r| ≥ |d_obs| indicator (a
    knife-edge comparison that would be flaky under accumulated float
    drift) is deterministic.

    Scale: the replica explode multiplies the (filtered, 2-column)
    fact slice by R=200, then ONE combinable aggregate keyed by r —
    the standard trade; at 100 TB you bound it by sampling the slice
    first (sample_stratified_hash) or lowering R, both documented
    knobs. No window, no join beyond two 1-row broadcasts.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    )
    base = ev.select(
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    obs = base.agg(
        (
            F.sum(F.when(F.col("y") == 1, F.col("cents"))).cast("double")
            / F.sum("y")
            - F.sum(F.when(F.col("y") == 0, F.col("cents"))).cast("double")
            / F.sum(1 - F.col("y"))
        ).alias("d_obs"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    reps = base.select(
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(200))).alias("r"),
        "event_id",
    ).select(
        "r", "cents",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col("event_id").cast("string"),
                            F.col("r").cast("string"),
                        ).cast("binary")
                    ),
                    1, 6,
                ),
                16, 10,
            ).cast("long") % 2
        ).alias("grp"),
    )
    per_rep = reps.groupBy("r").agg(
        (
            F.sum(F.when(F.col("grp") == 1, F.col("cents"))).cast("double")
            / F.sum("grp")
            - F.sum(F.when(F.col("grp") == 0, F.col("cents"))).cast("double")
            / F.sum(1 - F.col("grp"))
        ).alias("d_r")
    )
    return (
        per_rep.crossJoin(F.broadcast(obs))
        .groupBy("n_events", "d_obs")
        .agg(
            F.sum(
                (F.abs(F.col("d_r")) >= F.abs(F.col("d_obs"))).cast("int")
            ).cast("long").alias("n_extreme"),
        )
        .select(
            "n_events",
            F.round(F.col("d_obs") / 100.0, 4).alias("obs_diff_dollars"),
            "n_extreme",
            F.round((1.0 + F.col("n_extreme")) / 201.0, 6).alias("p_value"),
        )
    )
