"""Sequential / multiple-hypothesis testing operators.

The decision layer of an always-on experimentation platform: Wald's
SPRT (stop an A/B test the hour the evidence crosses a likelihood
bound, instead of waiting for a fixed horizon) and Benjamini-Hochberg
FDR control (screen hundreds of segment metrics at once without the
Bonferroni overkill).

Float discipline: every likelihood-ratio increment is an exact
integer count times a LITERAL double (the same decimal literal text
embedded in the Spark plan and the DuckDB oracle), prefix-summed in
a fixed window order — bit-identical across engines. The normal tail
in the FDR screen is a SHARED Abramowitz-Stegun 7.1.26 polynomial
(one generator emits both SQL texts), so cross-engine p-values agree
to the last bit modulo 1-ulp exp() divergence, far inside round-6.

Scale: both queries collapse the fact scan to a value-domain frame
first (hours; type×hour cells) — windows and BH ranking never touch
raw rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.sampling import md5_uniform
from ..registry import query
from ._shared import md5_uniform_sql

# SPRT design constants: H0 p=0.10 vs H1 p=0.15, alpha = beta = 0.05.
# repr() literals are embedded VERBATIM in both engine texts so each
# LLR increment (int * literal) is bit-identical.
_P0, _P1 = 0.10, 0.15
_L1 = repr(math.log(_P1 / _P0))          # per-conversion increment
_L0 = repr(math.log((1 - _P1) / (1 - _P0)))  # per-non-conversion
_A = repr(math.log(0.95 / 0.05))         # accept-H1 bound  ln(19)
_B = repr(math.log(0.05 / 0.95))         # accept-H0 bound -ln(19)


@query(
    "sprt_sequential_ab",
    category="ST-sequential",
    oracle=f"""
        WITH assigned AS (
            SELECT CASE WHEN {md5_uniform_sql("'sprt:' || cast(user_id AS STRING)")} < 0.5
                        THEN 'A' ELSE 'B' END AS variant,
                   date_trunc('hour', ts) AS hr,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
            FROM events
        ), hourly AS (
            SELECT variant, hr,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(conv) AS BIGINT) AS x
            FROM assigned GROUP BY variant, hr
        ), walked AS (
            SELECT variant, hr, n, x,
                   sum(x * {_L1} + (n - x) * {_L0})
                       OVER (PARTITION BY variant ORDER BY hr
                             ROWS UNBOUNDED PRECEDING) AS llr
            FROM hourly
        ), flagged AS (
            SELECT *, (llr >= {_A} OR llr <= {_B}) AS crossed FROM walked
        )
        SELECT variant,
               CAST(count(*) AS BIGINT) AS n_hours,
               CAST(sum(n) AS BIGINT) AS n_events,
               CAST(sum(x) AS BIGINT) AS n_conversions,
               min(CASE WHEN crossed THEN hr END) AS decision_hour,
               CASE WHEN min(CASE WHEN crossed THEN hr END) IS NULL
                    THEN 'continue'
                    WHEN min_by(llr, hr) FILTER (WHERE crossed) >= {_A}
                    THEN 'accept_H1' ELSE 'accept_H0' END AS decision,
               CAST(round(min_by(llr, hr) FILTER (WHERE crossed), 6)
                    AS DOUBLE) AS llr_at_decision,
               CAST(round(max_by(llr, hr), 6) AS DOUBLE) AS llr_final
        FROM flagged GROUP BY variant ORDER BY variant
    """,
)
def sprt_sequential_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT over an hourly event stream: users are md5-assigned
    to variants, conversions (purchases) accumulate a log-likelihood
    ratio for H1: p=0.15 against H0: p=0.10, and the test STOPS at
    the first hour the LLR leaves (ln(β/(1−α)), ln((1−β)/α)) — the
    sequential design that ends experiments early with both error
    rates capped at 5%.

    Determinism: hourly (n, x) are exact integers; each LLR increment
    is int × shared-literal double, prefix-summed in hour order —
    bit-identical across engines. Decision readouts use min_by/max_by
    keyed on the hour (no float argmax).

    Scale: one map-side-combinable rollup to (variant, hour) — the
    prefix window then runs on the calendar-bounded hourly frame (2
    partitions × hours), never raw events. This is the production
    always-valid-inference shape: state per variant is one float.
    """
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.select(
        F.when(
            md5_uniform("'sprt:' || cast(user_id AS STRING)") < 0.5, "A"
        ).otherwise("B").alias("variant"),
        F.date_trunc("hour", "ts").alias("hr"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    hourly = assigned.groupBy("variant", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )
    w = Window.partitionBy("variant").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, 0
    )
    walked = hourly.withColumn(
        "llr",
        F.sum(
            F.col("x") * F.lit(float(_L1))
            + (F.col("n") - F.col("x")) * F.lit(float(_L0))
        ).over(w),
    )
    flagged = walked.withColumn(
        "crossed",
        (F.col("llr") >= float(_A)) | (F.col("llr") <= float(_B)),
    )
    dec_hr = F.min(F.when(F.col("crossed"), F.col("hr")))
    llr_dec = F.min_by(
        F.when(F.col("crossed"), F.col("llr")),
        F.when(F.col("crossed"), F.col("hr")),
    )
    return (
        flagged.groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.sum("n").cast("long").alias("n_events"),
            F.sum("x").cast("long").alias("n_conversions"),
            dec_hr.alias("decision_hour"),
            F.when(dec_hr.isNull(), "continue")
            .when(llr_dec >= float(_A), "accept_H1")
            .otherwise("accept_H0")
            .alias("decision"),
            F.round(llr_dec, 6).alias("llr_at_decision"),
            F.round(F.max_by("llr", "hr"), 6).alias("llr_final"),
        )
    )


# --- BH-FDR screen ---------------------------------------------------------

def _erfc_sql(x_sql: str) -> str:
    """Engine-shared Abramowitz-Stegun 7.1.26 complementary error
    function for x >= 0 (|err| <= 1.5e-7 — and IDENTICAL on both
    sides, so cross-engine p-values agree bit-for-bit modulo exp
    ulps). One generator, two embeddings: F.expr and the oracle."""
    t = f"(1.0 / (1.0 + 0.3275911 * {x_sql}))"
    poly = (
        f"({t} * (0.254829592 + {t} * (-0.284496736 + {t} * "
        f"(1.421413741 + {t} * (-1.453152027 + {t} * 1.061405429)))))"
    )
    return f"({poly} * exp(-({x_sql}) * ({x_sql})))"


# two-sided p-value of a standard-normal z: erfc(|z| / sqrt(2))
_P_SQL = _erfc_sql("(0.7071067811865476 * abs(z))")


@query(
    "bh_fdr_cell_screen",
    category="ST-fdr",
    oracle=f"""
        WITH cells AS (
            SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hod,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN event_type_conv THEN 1 ELSE 0 END)
                        AS BIGINT) AS x
            FROM (SELECT event_type, ts,
                         (user_id % 7 = 0 OR (extract(hour FROM ts) >= 20
                              AND user_id % 3 = 0)) AS event_type_conv
                  FROM events)
            GROUP BY event_type, extract(hour FROM ts)
        ), gstats AS (
            SELECT CAST(sum(n) AS DOUBLE) AS ng, CAST(sum(x) AS DOUBLE) AS xg
            FROM cells
        ), zscored AS (
            SELECT event_type, hod, n, x,
                   (x - n * (xg / ng))
                       / sqrt(n * (xg / ng) * (1.0 - xg / ng)) AS z
            FROM cells CROSS JOIN gstats
        ), pvals AS (
            SELECT event_type, hod, n, x, z, {_P_SQL} AS p FROM zscored
        ), ranked AS (
            SELECT *, row_number() OVER (ORDER BY p, event_type, hod) AS i,
                   count(*) OVER () AS m
            FROM pvals
        ), cutoff AS (
            SELECT *, max(CASE WHEN p <= i * 0.10 / m THEN i ELSE 0 END)
                          OVER () AS k
            FROM ranked
        )
        SELECT event_type, hod, n, x,
               round(z, 6) AS z_score, round(p, 6) AS p_value,
               i AS bh_rank, (i <= k) AS rejected
        FROM cutoff ORDER BY bh_rank
    """,
)
def bh_fdr_cell_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR screen over event_type × hour-of-day
    segment cells: each cell's conversion share (md5-free determinist
    label: user_id % 7 == 0) is z-tested against the global rate, the
    ~120 p-values are BH step-up ranked, and every cell at rank ≤ k*
    (the largest i with p_(i) ≤ i·q/m, q = 0.10) is rejected — the
    standard guard against alert floods when screening hundreds of
    segment metrics simultaneously.

    Determinism: counts exact; z is pure rational arithmetic over
    them; the normal tail is a SHARED A-S 7.1.26 polynomial (same
    literal text both engines); BH ranking tiebreaks on (p, type,
    hour).

    Scale: ONE rollup collapses the fact scan to ≤ 5×24 cells; the
    global rate is a window (or 1-row broadcast) over that frame; BH
    rank/cutoff windows run on the cell frame only. Raw rows are
    touched exactly once, map-side combinable.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            F.hour("ts").cast("long").alias("hod"),
            (
                (F.col("user_id") % 7 == 0)
                | ((F.hour("ts") >= 20) & (F.col("user_id") % 3 == 0))
            ).cast("int").alias("conv"),
        )
        .groupBy("event_type", "hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("conv").cast("long").alias("x"),
        )
    )
    glob = cells.agg(
        F.sum("n").cast("double").alias("ng"),
        F.sum("x").cast("double").alias("xg"),
    )
    zscored = cells.crossJoin(F.broadcast(glob)).withColumn(
        "z",
        (F.col("x") - F.col("n") * (F.col("xg") / F.col("ng")))
        / F.sqrt(
            F.col("n")
            * (F.col("xg") / F.col("ng"))
            * (F.lit(1.0) - F.col("xg") / F.col("ng"))
        ),
    )
    pvals = zscored.withColumn("p", F.expr(_P_SQL))
    wi = Window.orderBy("p", "event_type", "hod")
    wall = Window.partitionBy()
    ranked = pvals.withColumn("i", F.row_number().over(wi)).withColumn(
        "m", F.count(F.lit(1)).over(wall)
    )
    cut = ranked.withColumn(
        "k",
        F.max(
            F.when(
                F.col("p") <= F.col("i") * 0.10 / F.col("m"), F.col("i")
            ).otherwise(0)
        ).over(wall),
    )
    return cut.select(
        "event_type", "hod", "n", "x",
        F.round("z", 6).alias("z_score"),
        F.round("p", 6).alias("p_value"),
        F.col("i").alias("bh_rank"),
        (F.col("i") <= F.col("k")).alias("rejected"),
    ).orderBy("bh_rank")
