"""Feature-transform analytics: WOE/IV decile binning (the credit-
scoring encoder + the feature-screening statistic), VIF
multicollinearity from the closed-form 3×3 correlation inverse,
the leading principal component by unrolled power iteration (the
FIFTH sequential-recursion exemplar: the carried state is a 3-vector
re-normalized each step, iterated on a 1-row broadcast matrix), and
classical 7-day seasonal decomposition (trend = centered MA,
seasonal = dow means of the detrended series, remainder) — the
transform layer between raw facts and model features.

Feature triple throughout: (value cents, hour-of-day, day-of-week) —
exact integers, so every moment (Σx, Σx², Σxy) is an exact int64 and
every correlation is ONE closed-form double expression over them
(products are taken in DOUBLE: n·Σx² exceeds int64 at sf≥0.1 but the
operands are exactly representable doubles, so both engines compute
the identical product).

Float discipline: ln/sqrt outputs round at 6; the power-iteration
fold inlines identical expression text on both engines (recursive
CTE ≡ JVM fold over sequence(1,8)); decile bins come from ntile over
a total order (cents, event_id) so bin membership is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"


@query(
    "woe_iv_decile_binning",
    category="FE-woe",
    oracle=f"""
        WITH base AS (
            SELECT {_CENTS} AS cents, event_id,
                   CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS bad
            FROM events WHERE value IS NOT NULL
        ), binned AS (
            SELECT ntile(10) OVER (ORDER BY cents, event_id) AS bin, bad
            FROM base
        ), per_bin AS (
            SELECT bin,
                   CAST(sum(bad) AS BIGINT) AS n_bad,
                   CAST(sum(1 - bad) AS BIGINT) AS n_good
            FROM binned GROUP BY bin
        ), tot AS (
            SELECT CAST(sum(n_bad) AS BIGINT) AS tb,
                   CAST(sum(n_good) AS BIGINT) AS tg
            FROM per_bin
        ), woe AS (
            SELECT bin, n_bad, n_good,
                   ln((CAST(n_bad AS DOUBLE) / tb)
                      / (CAST(n_good AS DOUBLE) / tg)) AS w,
                   CAST(n_bad AS DOUBLE) / tb
                       - CAST(n_good AS DOUBLE) / tg AS dpct
            FROM per_bin CROSS JOIN tot
        ), iv AS (
            SELECT sum(w * dpct) AS iv_total FROM woe
        )
        SELECT bin, n_bad, n_good,
               CAST(round(w, 6) AS DOUBLE) AS woe,
               CAST(round(iv.iv_total, 6) AS DOUBLE) AS iv_total
        FROM woe CROSS JOIN iv
        ORDER BY bin
    """,
)
def woe_iv_decile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence decile binning against the binary target
    "event is an error": per value-decile, WOE = ln(bad%/good%), and
    the information value IV = Σ(bad% − good%)·WOE — the
    credit-scoring encoder and the feature-screening scalar (IV>0.3
    = strong) in one pass.

    Determinism: decile membership comes from ntile over the total
    order (cents, event_id) — identical on both engines; bin counts
    are exact integers; each WOE is ln of one exact-integer-ratio
    quotient, and the 10-term IV sum rounds at 6.

    Scale: NO unpartitioned ntile window — the decile comes from
    operators/ranking.exact_global_rank (range buckets + per-bucket
    row_number + prefix offsets; sorts capped at ~N/32) and the exact
    SQL ntile fill formula, bit-identical to the oracle's global
    ntile for any boundary choice (the agg_decile_equidepth
    construction); everything after runs on a 10-row frame.
    """
    from ..operators.ranking import exact_global_rank, ntile_from_rank

    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
            "event_id",
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("bad"),
        )
    )
    ranked, total = exact_global_rank(
        base, ["cents", "event_id"], rank_col="rnk", with_total=True
    )
    binned = ranked.select(
        ntile_from_rank(F.col("rnk"), total, 10).alias("bin"),
        "bad",
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("bad").cast("long").alias("n_bad"),
        F.sum(1 - F.col("bad")).cast("long").alias("n_good"),
    )
    tot = per_bin.agg(
        F.sum("n_bad").cast("long").alias("tb"),
        F.sum("n_good").cast("long").alias("tg"),
    )
    woe = per_bin.crossJoin(F.broadcast(tot)).select(
        "bin", "n_bad", "n_good",
        F.log(
            (F.col("n_bad").cast("double") / F.col("tb"))
            / (F.col("n_good").cast("double") / F.col("tg"))
        ).alias("w"),
        (
            F.col("n_bad").cast("double") / F.col("tb")
            - F.col("n_good").cast("double") / F.col("tg")
        ).alias("dpct"),
    )
    iv = woe.agg(F.sum(F.col("w") * F.col("dpct")).alias("iv_total"))
    return (
        woe.crossJoin(F.broadcast(iv))
        .select(
            "bin", "n_bad", "n_good",
            F.round("w", 6).alias("woe"),
            F.round("iv_total", 6).alias("iv_total"),
        )
    )


# shared exact-moment CTE for the (cents, hour, dow) feature triple:
# pairwise correlations as single closed-form double expressions
_CORR_SQL = f"""
    feat AS (
        SELECT {_CENTS} AS x1,
               CAST(hour(ts) AS BIGINT) AS x2,
               CAST(dayofweek(ts) AS BIGINT) AS x3
        FROM events WHERE value IS NOT NULL
    ), mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
               CAST(sum(x3) AS BIGINT) AS s3,
               CAST(sum(x1 * x1) AS BIGINT) AS q1,
               CAST(sum(x2 * x2) AS BIGINT) AS q2,
               CAST(sum(x3 * x3) AS BIGINT) AS q3,
               CAST(sum(x1 * x2) AS BIGINT) AS p12,
               CAST(sum(x1 * x3) AS BIGINT) AS p13,
               CAST(sum(x2 * x3) AS BIGINT) AS p23
        FROM feat
    ), corr AS (
        SELECT
            (CAST(n AS DOUBLE) * p12 - CAST(s1 AS DOUBLE) * s2)
              / sqrt((CAST(n AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)
                     * (CAST(n AS DOUBLE) * q2 - CAST(s2 AS DOUBLE) * s2))
                AS r12,
            (CAST(n AS DOUBLE) * p13 - CAST(s1 AS DOUBLE) * s3)
              / sqrt((CAST(n AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)
                     * (CAST(n AS DOUBLE) * q3 - CAST(s3 AS DOUBLE) * s3))
                AS r13,
            (CAST(n AS DOUBLE) * p23 - CAST(s2 AS DOUBLE) * s3)
              / sqrt((CAST(n AS DOUBLE) * q2 - CAST(s2 AS DOUBLE) * s2)
                     * (CAST(n AS DOUBLE) * q3 - CAST(s3 AS DOUBLE) * s3))
                AS r23
        FROM mom
    )"""


def _corr_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row frame (r12, r13, r23): the correlation matrix of the
    (cents, hour, dow) triple from exact integer moments."""
    feat = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("x1"),
            F.hour("ts").cast("long").alias("x2"),
            F.dayofweek("ts").cast("long").alias("x3"),
        )
    )
    mom = feat.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum("x3").cast("long").alias("s3"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("q1"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("q2"),
        F.sum(F.col("x3") * F.col("x3")).cast("long").alias("q3"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("p12"),
        F.sum(F.col("x1") * F.col("x3")).cast("long").alias("p13"),
        F.sum(F.col("x2") * F.col("x3")).cast("long").alias("p23"),
    )

    def corr(p, sa, sb, qa, qb):
        n = F.col("n").cast("double")
        return (n * F.col(p) - F.col(sa).cast("double") * F.col(sb)) / F.sqrt(
            (n * F.col(qa) - F.col(sa).cast("double") * F.col(sa))
            * (n * F.col(qb) - F.col(sb).cast("double") * F.col(sb))
        )

    return mom.select(
        corr("p12", "s1", "s2", "q1", "q2").alias("r12"),
        corr("p13", "s1", "s3", "q1", "q3").alias("r13"),
        corr("p23", "s2", "s3", "q2", "q3").alias("r23"),
    )


@query(
    "vif_collinearity_triple",
    category="FE-vif",
    oracle=f"""
        WITH {_CORR_SQL},
        det AS (
            SELECT r12, r13, r23,
                   1.0 + 2.0 * r12 * r13 * r23
                       - r12 * r12 - r13 * r13 - r23 * r23 AS d
            FROM corr
        ), vifs AS (
            SELECT 'cents' AS feature, (1.0 - r23 * r23) / d AS vif FROM det
            UNION ALL
            SELECT 'hour', (1.0 - r13 * r13) / d FROM det
            UNION ALL
            SELECT 'dow', (1.0 - r12 * r12) / d FROM det
        )
        SELECT feature,
               CAST(round(vif, 6) AS DOUBLE) AS vif,
               CAST(round(1.0 - 1.0 / vif, 6) AS DOUBLE) AS r2_others
        FROM vifs ORDER BY feature
    """,
)
def vif_collinearity_triple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-inflation factors for the (cents, hour, dow) feature
    triple — the multicollinearity screen run before any linear
    model: VIF_j = [R⁻¹]_jj via the closed-form 3×3 correlation
    inverse (det = 1 + 2·r12r13r23 − Σr²; VIF_1 = (1−r23²)/det, …),
    with R²_j = 1 − 1/VIF_j, the share of feature j explained by the
    others.

    Determinism: correlations are closed-form doubles over exact
    integer moments (products in DOUBLE — operands exactly
    representable, identical both engines); VIFs are three more
    identical expressions.

    Scale: ONE map-side-combinable moment aggregate over the fact
    table; the matrix algebra runs on a 1-row frame.
    """
    c = _corr_frame(spark, sf_dir)
    det = c.select(
        "r12", "r13", "r23",
        (
            1.0
            + 2.0 * F.col("r12") * F.col("r13") * F.col("r23")
            - F.col("r12") * F.col("r12")
            - F.col("r13") * F.col("r13")
            - F.col("r23") * F.col("r23")
        ).alias("d"),
    )
    vifs = (
        det.select(
            F.lit("cents").alias("feature"),
            ((1.0 - F.col("r23") * F.col("r23")) / F.col("d")).alias("vif"),
        )
        .unionAll(
            det.select(
                F.lit("hour"),
                ((1.0 - F.col("r13") * F.col("r13")) / F.col("d")),
            )
        )
        .unionAll(
            det.select(
                F.lit("dow"),
                ((1.0 - F.col("r12") * F.col("r12")) / F.col("d")),
            )
        )
    )
    return vifs.select(
        "feature",
        F.round("vif", 6).alias("vif"),
        F.round(1.0 - 1.0 / F.col("vif"), 6).alias("r2_others"),
    ).orderBy("feature")


_PCA_ITERS = 8
_V0 = "0.5773502691896258"  # 1/sqrt(3)


@query(
    "pca_leading_component_power",
    category="FE-pca",
    oracle=f"""
        WITH RECURSIVE {_CORR_SQL},
        pow AS (
            SELECT 0 AS i, CAST({_V0} AS DOUBLE) AS v1,
                   CAST({_V0} AS DOUBLE) AS v2, CAST({_V0} AS DOUBLE) AS v3
            UNION ALL
            SELECT i + 1,
                   (p.v1 + c.r12 * p.v2 + c.r13 * p.v3)
                     / sqrt((p.v1 + c.r12 * p.v2 + c.r13 * p.v3)
                              * (p.v1 + c.r12 * p.v2 + c.r13 * p.v3)
                          + (c.r12 * p.v1 + p.v2 + c.r23 * p.v3)
                              * (c.r12 * p.v1 + p.v2 + c.r23 * p.v3)
                          + (c.r13 * p.v1 + c.r23 * p.v2 + p.v3)
                              * (c.r13 * p.v1 + c.r23 * p.v2 + p.v3)),
                   (c.r12 * p.v1 + p.v2 + c.r23 * p.v3)
                     / sqrt((p.v1 + c.r12 * p.v2 + c.r13 * p.v3)
                              * (p.v1 + c.r12 * p.v2 + c.r13 * p.v3)
                          + (c.r12 * p.v1 + p.v2 + c.r23 * p.v3)
                              * (c.r12 * p.v1 + p.v2 + c.r23 * p.v3)
                          + (c.r13 * p.v1 + c.r23 * p.v2 + p.v3)
                              * (c.r13 * p.v1 + c.r23 * p.v2 + p.v3)),
                   (c.r13 * p.v1 + c.r23 * p.v2 + p.v3)
                     / sqrt((p.v1 + c.r12 * p.v2 + c.r13 * p.v3)
                              * (p.v1 + c.r12 * p.v2 + c.r13 * p.v3)
                          + (c.r12 * p.v1 + p.v2 + c.r23 * p.v3)
                              * (c.r12 * p.v1 + p.v2 + c.r23 * p.v3)
                          + (c.r13 * p.v1 + c.r23 * p.v2 + p.v3)
                              * (c.r13 * p.v1 + c.r23 * p.v2 + p.v3))
            FROM pow p CROSS JOIN corr c WHERE i < {_PCA_ITERS}
        ), fin AS (
            SELECT CASE WHEN v1 < 0 THEN -v1 ELSE v1 END AS w1,
                   CASE WHEN v1 < 0 THEN -v2 ELSE v2 END AS w2,
                   CASE WHEN v1 < 0 THEN -v3 ELSE v3 END AS w3,
                   c.r12, c.r13, c.r23
            FROM pow CROSS JOIN corr c WHERE i = {_PCA_ITERS}
        )
        SELECT CAST({_PCA_ITERS} AS BIGINT) AS iters,
               CAST(round(w1, 6) AS DOUBLE) AS v_cents,
               CAST(round(w2, 6) AS DOUBLE) AS v_hour,
               CAST(round(w3, 6) AS DOUBLE) AS v_dow,
               CAST(round(w1 * (w1 + r12 * w2 + r13 * w3)
                        + w2 * (r12 * w1 + w2 + r23 * w3)
                        + w3 * (r13 * w1 + r23 * w2 + w3), 6) AS DOUBLE)
                   AS eigenvalue,
               CAST(round((w1 * (w1 + r12 * w2 + r13 * w3)
                        + w2 * (r12 * w1 + w2 + r23 * w3)
                        + w3 * (r13 * w1 + r23 * w2 + w3)) / 3.0, 6)
                    AS DOUBLE) AS explained_ratio
        FROM fin
    """,
)
def pca_leading_component_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal component of the (cents, hour, dow)
    correlation matrix by 8 unrolled power-iteration steps — the
    fifth sequential-recursion exemplar: state is the 3-vector v,
    each step computes w = R·v and renormalizes, starting from the
    symmetric (1,1,1)/√3; sign is fixed by forcing the cents loading
    non-negative. Eigenvalue λ = vᵀRv and explained ratio λ/3 (trace
    of a correlation matrix = p).

    Determinism: R's entries are closed-form doubles over exact
    integer moments; the fold inlines IDENTICAL expression text on
    both engines (JVM ``aggregate`` over sequence(1,8) ≡ recursive
    CTE), so every iterate is bit-identical before round 6.

    Scale: one moment aggregate over the facts; the iteration runs
    on a 1-row broadcast frame — a p×p eigenproblem never touches
    the data again (and for p in the thousands the same plan holds
    with a p²-row matrix frame and a join-based mat-vec).
    """
    c = _corr_frame(spark, sf_dir)
    folded = c.select(
        "r12", "r13", "r23",
        F.expr(
            f"""
            aggregate(
                sequence(1, {_PCA_ITERS}),
                struct(CAST({_V0} AS DOUBLE) AS v1,
                       CAST({_V0} AS DOUBLE) AS v2,
                       CAST({_V0} AS DOUBLE) AS v3),
                (p, i) -> struct(
                    (p.v1 + r12 * p.v2 + r13 * p.v3)
                      / sqrt((p.v1 + r12 * p.v2 + r13 * p.v3)
                               * (p.v1 + r12 * p.v2 + r13 * p.v3)
                           + (r12 * p.v1 + p.v2 + r23 * p.v3)
                               * (r12 * p.v1 + p.v2 + r23 * p.v3)
                           + (r13 * p.v1 + r23 * p.v2 + p.v3)
                               * (r13 * p.v1 + r23 * p.v2 + p.v3)) AS v1,
                    (r12 * p.v1 + p.v2 + r23 * p.v3)
                      / sqrt((p.v1 + r12 * p.v2 + r13 * p.v3)
                               * (p.v1 + r12 * p.v2 + r13 * p.v3)
                           + (r12 * p.v1 + p.v2 + r23 * p.v3)
                               * (r12 * p.v1 + p.v2 + r23 * p.v3)
                           + (r13 * p.v1 + r23 * p.v2 + p.v3)
                               * (r13 * p.v1 + r23 * p.v2 + p.v3)) AS v2,
                    (r13 * p.v1 + r23 * p.v2 + p.v3)
                      / sqrt((p.v1 + r12 * p.v2 + r13 * p.v3)
                               * (p.v1 + r12 * p.v2 + r13 * p.v3)
                           + (r12 * p.v1 + p.v2 + r23 * p.v3)
                               * (r12 * p.v1 + p.v2 + r23 * p.v3)
                           + (r13 * p.v1 + r23 * p.v2 + p.v3)
                               * (r13 * p.v1 + r23 * p.v2 + p.v3)) AS v3)
            )
            """
        ).alias("v"),
    )
    sgn = F.when(F.col("v.v1") < 0, -1.0).otherwise(1.0)
    fin = folded.select(
        "r12", "r13", "r23",
        (sgn * F.col("v.v1")).alias("w1"),
        (sgn * F.col("v.v2")).alias("w2"),
        (sgn * F.col("v.v3")).alias("w3"),
    )
    lam = (
        F.col("w1") * (F.col("w1") + F.col("r12") * F.col("w2") + F.col("r13") * F.col("w3"))
        + F.col("w2") * (F.col("r12") * F.col("w1") + F.col("w2") + F.col("r23") * F.col("w3"))
        + F.col("w3") * (F.col("r13") * F.col("w1") + F.col("r23") * F.col("w2") + F.col("w3"))
    )
    return fin.select(
        F.lit(_PCA_ITERS).cast("long").alias("iters"),
        F.round("w1", 6).alias("v_cents"),
        F.round("w2", 6).alias("v_hour"),
        F.round("w3", 6).alias("v_dow"),
        F.round(lam, 6).alias("eigenvalue"),
        F.round(lam / 3.0, 6).alias("explained_ratio"),
    )


@query(
    "seasonal_decompose_classic",
    category="FE-decompose",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum({_CENTS}) AS BIGINT) AS cents
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type, CAST(ts AS DATE)
        ), trended AS (
            SELECT event_type, day, cents,
                   CAST(sum(cents) OVER w AS DOUBLE) / 7.0 AS trend,
                   count(*) OVER w AS wn
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ), detr AS (
            SELECT event_type, day, cents, trend,
                   dayofweek(day) AS dow,
                   cents - trend AS d
            FROM trended WHERE wn = 7
        ), seas_raw AS (
            SELECT event_type, dow, avg(d) AS s_raw
            FROM detr GROUP BY event_type, dow
        ), seas AS (
            SELECT event_type, dow,
                   s_raw - avg(s_raw) OVER (PARTITION BY event_type) AS s
            FROM seas_raw
        )
        SELECT d.event_type, d.day, d.cents,
               CAST(round(d.trend, 6) AS DOUBLE) AS trend,
               CAST(round(seas.s, 6) AS DOUBLE) AS seasonal,
               CAST(round(d.d - seas.s, 6) AS DOUBLE) AS remainder
        FROM detr d
        JOIN seas ON seas.event_type = d.event_type AND seas.dow = d.dow
        ORDER BY d.event_type, d.day
    """,
)
def seasonal_decompose_classic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of each channel's
    daily totals: trend = centered 7-day moving average (full windows
    only), seasonal = per-day-of-week mean of the detrended series
    re-centered to sum to zero, remainder = what's left — the
    moving-average decomposition under every "is this spike seasonal
    or real" monitoring view (the STL ancestor).

    Determinism: daily totals are exact integer cents; the trend is
    an exact-integer-sum/7 quotient; dow means average ≤⌈days/7⌉
    identical doubles and round at 6.

    Scale: one rollup to |types|×|days|, then windows and a dow-grain
    aggregate on that bounded frame — the decomposition never
    rescans ticks.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long").alias("cents")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    detr = (
        daily.select(
            "event_type", "day", "cents",
            (F.sum("cents").over(w).cast("double") / 7.0).alias("trend"),
            F.count(F.lit(1)).over(w).alias("wn"),
        )
        .filter(F.col("wn") == 7)
        .select(
            "event_type", "day", "cents", "trend",
            F.dayofweek("day").alias("dow"),
            (F.col("cents") - F.col("trend")).alias("d"),
        )
    )
    seas_raw = detr.groupBy("event_type", "dow").agg(F.avg("d").alias("s_raw"))
    seas = seas_raw.select(
        "event_type", "dow",
        (
            F.col("s_raw")
            - F.avg("s_raw").over(Window.partitionBy("event_type"))
        ).alias("s"),
    )
    return (
        detr.join(F.broadcast(seas), ["event_type", "dow"])
        .select(
            "event_type", "day", "cents",
            F.round("trend", 6).alias("trend"),
            F.round("s", 6).alias("seasonal"),
            F.round(F.col("d") - F.col("s"), 6).alias("remainder"),
        )
    )


_BC_LAMBDAS = ("-1.0", "-0.5", "0.0", "0.5", "1.0")


def _bc_y(lmb: str) -> str:
    """Box-Cox transform y(λ) of the positive integer `cents` column —
    identical expression text on both engines (λ=0 → ln x)."""
    return (
        f"CASE WHEN {lmb} = 0.0 THEN ln(CAST(cents AS DOUBLE)) "
        f"ELSE (exp({lmb} * ln(CAST(cents AS DOUBLE))) - 1.0) / {lmb} END"
    )


@query(
    "boxcox_lambda_scan",
    category="FE-boxcox",
    oracle=f"""
        WITH base AS (
            SELECT {_CENTS} AS cents FROM events
            WHERE value IS NOT NULL AND value > 0
        ), lam AS (
            SELECT CAST(l AS DOUBLE) AS lmb
            FROM (SELECT unnest([{", ".join(_BC_LAMBDAS)}]) AS l)
        ), mom AS (
            SELECT lmb,
                   CAST(count(*) AS BIGINT) AS n,
                   sum({_bc_y("lmb")}) AS sy,
                   sum({_bc_y("lmb")} * {_bc_y("lmb")}) AS qy,
                   sum(ln(CAST(cents AS DOUBLE))) AS slx
            FROM base CROSS JOIN lam
            GROUP BY lmb
        ), ll AS (
            SELECT lmb, n,
                   -(CAST(n AS DOUBLE) / 2.0)
                     * ln(qy / n - (sy / n) * (sy / n))
                   + (lmb - 1.0) * slx AS loglik
            FROM mom
        ), best AS (
            SELECT max(CAST(round(loglik * 1000000.0) AS BIGINT)) AS bm
            FROM ll
        )
        SELECT ll.lmb AS lambda,
               ll.n AS n_rows,
               CAST(round(ll.loglik, 4) AS DOUBLE) AS loglik,
               CAST(CAST(round(ll.loglik * 1000000.0) AS BIGINT) = best.bm
                    AS BOOLEAN) AS is_best
        FROM ll CROSS JOIN best
        ORDER BY ll.lmb
    """,
)
def boxcox_lambda_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-Cox λ profile-likelihood scan over the grid
    {{−1, −0.5, 0, 0.5, 1}}: for each λ the transform y = (x^λ−1)/λ
    (ln x at λ=0) is scored by the profile log-likelihood
    −n/2·ln σ̂²_y + (λ−1)Σln x, and the argmax row is flagged — the
    variance-stabilizing transform selection step ahead of any
    Gaussian-assuming model.

    Determinism: each y term is the identical double expression of
    exact integer cents; the Σy/Σy² accumulation orders differ
    across engines (~1e-12 absolute on the log-likelihood) — far
    under both the round-4 display and the micro-unit (1e-6)
    argmax quantization, which runs on integers.

    Scale: ONE scan with a ×5 literal fan-out collapsing into a
    5-group map-side-combinable aggregate; the argmax runs on 5 rows.
    """
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (F.col("value") > 0))
        .select(
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents")
        )
    )
    fan = base.select(
        "cents",
        F.explode(
            F.array(*[F.lit(float(x)) for x in _BC_LAMBDAS])
        ).alias("lmb"),
    )
    y = F.expr(_bc_y("lmb"))
    mom = fan.groupBy("lmb").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("qy"),
        F.sum(F.log(F.col("cents").cast("double"))).alias("slx"),
    )
    loglik = (
        -(F.col("n").cast("double") / 2.0)
        * F.log(
            F.col("qy") / F.col("n")
            - (F.col("sy") / F.col("n")) * (F.col("sy") / F.col("n"))
        )
        + (F.col("lmb") - 1.0) * F.col("slx")
    )
    ll = mom.select("lmb", "n", loglik.alias("loglik"))
    best = ll.agg(
        F.max(F.round(F.col("loglik") * 1000000.0).cast("long")).alias("bm")
    )
    return (
        ll.crossJoin(F.broadcast(best))
        .select(
            F.col("lmb").alias("lambda"),
            F.col("n").alias("n_rows"),
            F.round("loglik", 4).alias("loglik"),
            (
                F.round(F.col("loglik") * 1000000.0).cast("long")
                == F.col("bm")
            ).alias("is_best"),
        )
    )
