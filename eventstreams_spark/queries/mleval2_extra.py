"""Model-evaluation II: ranking metrics and model-monitoring readouts.

Completes the scoring-pipeline readout family started in
mleval_extra.py (ROC-AUC/KS, calibration, Gini, KM, MASE, MI): here
average precision (PR-AUC), the threshold-sweep confusion matrix with
P/R/F1, gains/lift deciles, Cohen's kappa, and PSI drift monitoring —
the metrics a binary scorecard ships to a dashboard every run.

Float discipline (house rule, mleval_extra.py): all counts are exact
integers from ONE rollup of the fact scan; every emitted ratio is a
single IEEE division of those integers or a fixed-order window prefix
sum of such ratios; ln() terms (PSI only) are bucket-bounded. Nothing
sums raw doubles through a groupBy (Spark agg-sum order is
nondeterministic; window prefix sums in a pinned ORDER BY are not).

Scale (shared shape): the label/score design is purchase-vs-click
with score buckets v = floor(value) — the first aggregate collapses
the scan to <= |score domain| (~491) rows, map-side combinable, and
every window/cross join after that runs on the bucket frame, never on
raw events. At 100 TB the bucket frame is still ~491 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# shared first rollup: per score-bucket positive/negative counts over
# the purchase(1)-vs-click(0) labeled sub-stream
_BUCKETS_SQL = """
    SELECT CAST(floor(value) AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS np
    FROM events
    WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    GROUP BY floor(value)
"""


def _score_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            F.col("event_type").isin("purchase", "click")
            & F.col("value").isNotNull()
        )
        .select(
            F.floor("value").cast("long").alias("v"),
            (F.col("event_type") == "purchase").cast("long").alias("pos"),
        )
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("pos").cast("long").alias("np"),
        )
    )


@query(
    "pr_auc_average_precision",
    category="ML2-prauc",
    oracle=f"""
        WITH b AS ({_BUCKETS_SQL}),
        tot AS (
            SELECT CAST(sum(np) AS BIGINT) AS n1,
                   CAST(sum(cnt) AS BIGINT) AS n_all
            FROM b
        ), ranked AS (
            SELECT v, cnt, np,
                   CAST(sum(np) OVER (ORDER BY v DESC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
                   CAST(sum(cnt) OVER (ORDER BY v DESC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt,
                   row_number() OVER (ORDER BY v DESC) AS rn,
                   count(*) OVER () AS m
            FROM b
        ), walked AS (
            SELECT rn, m, cum_pos, cum_cnt,
                   sum((CAST(np AS DOUBLE) / (SELECT n1 FROM tot))
                       * (CAST(cum_pos AS DOUBLE) / cum_cnt))
                       OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
                       AS ap_cum
            FROM ranked
        )
        SELECT (SELECT n1 FROM tot) AS n_pos,
               (SELECT n_all FROM tot) - (SELECT n1 FROM tot) AS n_neg,
               CAST(round(ap_cum, 6) AS DOUBLE) AS average_precision
        FROM walked WHERE rn = m
    """,
)
def pr_auc_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve, step
    rule with ties handled blockwise): rank score buckets descending,
    AP = Σ_blocks (Δrecall_block · precision_at_block_end) — the
    ranking metric that, unlike ROC-AUC, does not reward true
    negatives and is the standard readout under class imbalance.

    Determinism: counts exact; each block term is two divisions of
    exact integers multiplied once; AP accumulates in ONE pinned
    window order (v DESC) on both engines — never an unordered agg
    sum of doubles.

    Scale: one rollup to ≤ |score domain| bucket rows; the ranking
    window runs on buckets only. Scan is touched once, map-side
    combinable.
    """
    b = _score_buckets(spark, sf_dir)
    tot = b.agg(
        F.sum("np").cast("long").alias("n1"),
        F.sum("cnt").cast("long").alias("n_all"),
    )
    w = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = (
        b.crossJoin(F.broadcast(tot))
        .withColumn("cum_pos", F.sum("np").over(w).cast("long"))
        .withColumn("cum_cnt", F.sum("cnt").over(w).cast("long"))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.col("v").desc())))
        .withColumn("m", F.count(F.lit(1)).over(Window.partitionBy()))
        .withColumn(
            "ap_cum",
            F.sum(
                (F.col("np").cast("double") / F.col("n1"))
                * (F.col("cum_pos").cast("double") / F.col("cum_cnt"))
            ).over(w),
        )
    )
    return ranked.filter(F.col("rn") == F.col("m")).select(
        F.col("n1").alias("n_pos"),
        (F.col("n_all") - F.col("n1")).alias("n_neg"),
        F.round("ap_cum", 6).alias("average_precision"),
    )


@query(
    "confusion_threshold_sweep",
    category="ML2-confusion",
    oracle=f"""
        WITH b AS ({_BUCKETS_SQL}),
        thresholds AS (
            SELECT CAST(unnest([50,100,150,200,250,300,350,400,450])
                        AS BIGINT) AS t
        ), cm AS (
            SELECT t,
                   CAST(sum(CASE WHEN v >= t THEN np ELSE 0 END) AS BIGINT) AS tp,
                   CAST(sum(CASE WHEN v >= t THEN cnt - np ELSE 0 END) AS BIGINT) AS fp,
                   CAST(sum(CASE WHEN v < t THEN np ELSE 0 END) AS BIGINT) AS fn,
                   CAST(sum(CASE WHEN v < t THEN cnt - np ELSE 0 END) AS BIGINT) AS tn
            FROM thresholds, b
            GROUP BY t
        )
        SELECT t AS threshold, tp, fp, fn, tn,
               CAST(round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6)
                    AS DOUBLE) AS precision_,
               CAST(round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6)
                    AS DOUBLE) AS recall_,
               CAST(round(CAST(2 * tp AS DOUBLE)
                          / nullif(2 * tp + fp + fn, 0), 6)
                    AS DOUBLE) AS f1
        FROM cm ORDER BY threshold
    """,
)
def confusion_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 at nine score
    thresholds — the operating-point sweep behind every threshold-
    picking dashboard. Each F1 is the SINGLE division
    2TP/(2TP+FP+FN) of exact integers (never a ratio of ratios), so
    the sweep is bit-identical across engines.

    Scale: the scan rolls up to ≤ |score domain| bucket rows once;
    the 9-row threshold frame cross-joins the bucket frame (≤ 9×491
    intermediate rows) and reduces — raw events are never touched per
    threshold.
    """
    b = _score_buckets(spark, sf_dir)
    ts = spark.range(1, 10).select((F.col("id") * 50).cast("long").alias("t"))
    cm = (
        F.broadcast(ts)
        .crossJoin(b)
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("v") >= F.col("t"), F.col("np")).otherwise(0))
            .cast("long").alias("tp"),
            F.sum(
                F.when(F.col("v") >= F.col("t"), F.col("cnt") - F.col("np"))
                .otherwise(0)
            ).cast("long").alias("fp"),
            F.sum(F.when(F.col("v") < F.col("t"), F.col("np")).otherwise(0))
            .cast("long").alias("fn"),
            F.sum(
                F.when(F.col("v") < F.col("t"), F.col("cnt") - F.col("np"))
                .otherwise(0)
            ).cast("long").alias("tn"),
        )
    )
    return cm.select(
        F.col("t").alias("threshold"),
        "tp", "fp", "fn", "tn",
        F.round(
            F.col("tp").cast("double") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 6
        ).alias("precision_"),
        F.round(
            F.col("tp").cast("double") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 6
        ).alias("recall_"),
        F.round(
            (2 * F.col("tp")).cast("double")
            / F.nullif(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0)),
            6,
        ).alias("f1"),
    )


@query(
    "lift_gains_deciles",
    category="ML2-gains",
    oracle=f"""
        WITH b AS ({_BUCKETS_SQL}),
        banded AS (
            SELECT CAST(least(floor(v / 50), 9) AS BIGINT) AS band,
                   CAST(sum(cnt) AS BIGINT) AS cnt,
                   CAST(sum(np) AS BIGINT) AS np
            FROM b GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(cnt) AS BIGINT) AS n_all,
                   CAST(sum(np) AS BIGINT) AS n1
            FROM banded
        ), walked AS (
            SELECT band, cnt, np,
                   CAST(sum(cnt) OVER (ORDER BY band DESC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt,
                   CAST(sum(np) OVER (ORDER BY band DESC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
            FROM banded
        )
        SELECT band, cnt, np,
               CAST(round(CAST(cum_pos AS DOUBLE) / (SELECT n1 FROM tot), 6)
                    AS DOUBLE) AS gain,
               CAST(round((CAST(cum_pos AS DOUBLE) * (SELECT n_all FROM tot))
                          / (CAST(cum_cnt AS DOUBLE) * (SELECT n1 FROM tot)),
                          6) AS DOUBLE) AS lift
        FROM walked ORDER BY band DESC
    """,
)
def lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table over ten fixed-width score bands (the
    campaign-targeting readout: 'the top band captures X% of all
    conversions at Y× the base rate'). gain = cumulative positive
    capture; lift = capture rate over base rate, computed as ONE
    division of integer products (cum_pos·n_all)/(cum_cnt·n1) — never
    a ratio of two rounded ratios.

    Scale: bucket rollup → 10 band rows; the cumulative windows run
    on the 10-row frame.
    """
    b = _score_buckets(spark, sf_dir)
    banded = (
        b.groupBy(
            F.least(F.floor(F.col("v") / 50), F.lit(9)).cast("long").alias("band")
        )
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("np").cast("long").alias("np"),
        )
    )
    tot = banded.agg(
        F.sum("cnt").cast("long").alias("n_all"),
        F.sum("np").cast("long").alias("n1"),
    )
    w = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    walked = (
        banded.crossJoin(F.broadcast(tot))
        .withColumn("cum_cnt", F.sum("cnt").over(w).cast("long"))
        .withColumn("cum_pos", F.sum("np").over(w).cast("long"))
    )
    return walked.select(
        "band", "cnt", "np",
        F.round(F.col("cum_pos").cast("double") / F.col("n1"), 6).alias("gain"),
        F.round(
            (F.col("cum_pos").cast("double") * F.col("n_all"))
            / (F.col("cum_cnt").cast("double") * F.col("n1")),
            6,
        ).alias("lift"),
    ).orderBy(F.col("band").desc())


@query(
    "cohens_kappa_rules",
    category="ML2-kappa",
    oracle="""
        WITH labeled AS (
            SELECT CASE WHEN value > 100 THEN 1 ELSE 0 END AS a,
                   CASE WHEN CAST(floor(value) AS BIGINT)
                             + (user_id % 21) > 95 THEN 1 ELSE 0 END AS b
            FROM events WHERE value IS NOT NULL
        ), cm AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(a * b) AS BIGINT) AS n11,
                   CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
                   CAST(sum((1 - a) * b) AS BIGINT) AS n01,
                   CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
            FROM labeled
        )
        SELECT n, n11, n10, n01, n00,
               CAST(round(CAST(n11 + n00 AS DOUBLE) / n, 6) AS DOUBLE)
                   AS p_observed,
               CAST(round(CAST((n11 + n10) * (n11 + n01)
                               + (n01 + n00) * (n10 + n00) AS DOUBLE)
                          / (CAST(n AS DOUBLE) * n), 6) AS DOUBLE)
                   AS p_expected,
               CAST(round(
                   CAST(n * (n11 + n00)
                        - ((n11 + n10) * (n11 + n01)
                           + (n01 + n00) * (n10 + n00)) AS DOUBLE)
                   / (CAST(n AS DOUBLE) * n
                      - ((n11 + n10) * (n11 + n01)
                         + (n01 + n00) * (n10 + n00))), 6) AS DOUBLE)
                   AS kappa
        FROM cm
    """,
)
def cohens_kappa_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic 'raters' (a value rule
    and a value+id rule): chance-corrected agreement, the standard
    inter-annotator readout before trusting labels for training data.
    kappa is computed as ONE division of integer expressions —
    (n·po_num − pe_num)/(n² − pe_num) with po_num, pe_num exact
    integers — so no ratio-of-ratios drift exists to disagree on.

    Scale: one aggregate over the scan (four conditional integer
    sums); output is a single row.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    labeled = ev.select(
        (F.col("value") > 100).cast("long").alias("a"),
        (
            (F.floor("value").cast("long") + F.col("user_id") % 21) > 95
        ).cast("long").alias("b"),
    )
    cm = labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
    )
    pe_num = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    return cm.select(
        "n", "n11", "n10", "n01", "n00",
        F.round((F.col("n11") + F.col("n00")).cast("double") / F.col("n"), 6)
        .alias("p_observed"),
        F.round(
            pe_num.cast("double") / (F.col("n").cast("double") * F.col("n")), 6
        ).alias("p_expected"),
        F.round(
            (
                F.col("n") * (F.col("n11") + F.col("n00")) - pe_num
            ).cast("double")
            / (F.col("n").cast("double") * F.col("n") - pe_num),
            6,
        ).alias("kappa"),
    )


@query(
    "psi_score_stability",
    category="ML2-psi",
    oracle="""
        WITH binned AS (
            SELECT CAST(least(floor(value / 50), 9) AS BIGINT) AS bin,
                   CAST(sum(CASE WHEN extract(day FROM ts) <= 15
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(sum(CASE WHEN extract(day FROM ts) > 15
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
            FROM events WHERE value IS NOT NULL
            GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(n_a) AS BIGINT) AS ta,
                   CAST(sum(n_b) AS BIGINT) AS tb
            FROM binned
        ), contrib AS (
            SELECT bin, n_a, n_b,
                   (CAST(n_a + 1 AS DOUBLE) / (ta + 10)
                    - CAST(n_b + 1 AS DOUBLE) / (tb + 10))
                   * ln((CAST(n_a + 1 AS DOUBLE) / (ta + 10))
                        / (CAST(n_b + 1 AS DOUBLE) / (tb + 10))) AS c
            FROM binned CROSS JOIN tot
        )
        SELECT bin, n_a, n_b,
               CAST(round(c, 6) AS DOUBLE) AS psi_contrib,
               CAST(round(sum(c) OVER (ORDER BY bin
                    ROWS UNBOUNDED PRECEDING), 6) AS DOUBLE) AS psi_running
        FROM contrib ORDER BY bin
    """,
)
def psi_score_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the month's first and second
    half over ten fixed score bins — THE drift alarm on every model-
    monitoring dashboard (rule of thumb: PSI > 0.25 = retrain).
    Laplace-smoothed shares ((n+1)/(N+10), identical literal
    arithmetic in both engines) keep empty bins finite; the total PSI
    is exposed as a running prefix sum in pinned bin order (row 9 =
    the headline number) rather than an unordered double agg.

    Scale: one conditional rollup to 10 bins; windows on the 10-row
    frame; the ln() terms are bin-bounded.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    binned = (
        ev.select(
            F.least(F.floor(F.col("value") / 50), F.lit(9))
            .cast("long").alias("bin"),
            (F.dayofmonth("ts") <= 15).cast("long").alias("in_a"),
        )
        .groupBy("bin")
        .agg(
            F.sum("in_a").cast("long").alias("n_a"),
            F.sum(1 - F.col("in_a")).cast("long").alias("n_b"),
        )
    )
    tot = binned.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    pa = (F.col("n_a") + 1).cast("double") / (F.col("ta") + 10)
    pb = (F.col("n_b") + 1).cast("double") / (F.col("tb") + 10)
    contrib = binned.crossJoin(F.broadcast(tot)).withColumn(
        "c", (pa - pb) * F.log(pa / pb)
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return contrib.select(
        "bin", "n_a", "n_b",
        F.round("c", 6).alias("psi_contrib"),
        F.round(F.sum("c").over(w), 6).alias("psi_running"),
    ).orderBy("bin")


@query(
    "weighted_median_by_flag",
    category="ML2-wmedian",
    oracle="""
        WITH base AS (
            SELECT l_returnflag,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS price_cents,
                   CAST(floor(l_quantity + 0.5) AS BIGINT) AS w
            FROM lineitem
        ), cum AS (
            SELECT l_returnflag, price_cents, w,
                   CAST(sum(w) OVER (PARTITION BY l_returnflag
                        ORDER BY price_cents, w
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
                   CAST(sum(w) OVER (PARTITION BY l_returnflag)
                        AS BIGINT) AS tw
            FROM base
        ), hit AS (
            SELECT l_returnflag, price_cents, cw, tw,
                   row_number() OVER (PARTITION BY l_returnflag
                        ORDER BY price_cents, w) AS rn
            FROM cum WHERE 2 * cw >= tw
        )
        SELECT l_returnflag,
               CAST(price_cents AS BIGINT) AS weighted_median_cents,
               tw AS total_weight
        FROM hit WHERE rn = 1 ORDER BY l_returnflag
    """,
)
def weighted_median_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per return flag: the first
    price (in cents) whose running weight reaches half the group's
    total — the weighted-percentile primitive (inventory-weighted
    price points, duration-weighted latency) that plain
    percentile()/median() cannot express. Entirely integer: prices
    and weights are exact cents/units, the crossing test is the
    cross-multiplication 2·cumw ≥ totw, and the pick is the FIRST
    crossing row under a pinned (price, weight) order.

    Scale: one window pass partitioned by the group key (the same
    single-shuffle shape as the running-agg family); no collect, no
    per-group sort beyond the window's.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        .alias("price_cents"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("w"),
    )
    wo = W.partitionBy("l_returnflag").orderBy("price_cents", "w")
    cum = base.withColumn(
        "cw", F.sum("w").over(wo.rowsBetween(W.unboundedPreceding, 0)).cast("long")
    ).withColumn(
        "tw", F.sum("w").over(W.partitionBy("l_returnflag")).cast("long")
    )
    hit = cum.filter(2 * F.col("cw") >= F.col("tw")).withColumn(
        "rn", F.row_number().over(wo)
    )
    return (
        hit.filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("price_cents").alias("weighted_median_cents"),
            F.col("tw").alias("total_weight"),
        )
    )


@query(
    "decision_stump_train",
    category="ML2-stump",
    oracle="""
        WITH b AS (
            SELECT CAST(floor(value) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS np
            FROM events
            WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
            GROUP BY floor(value)
        ), tot AS (
            SELECT CAST(sum(cnt) AS BIGINT) AS n,
                   CAST(sum(np) AS BIGINT) AS p
            FROM b
        ), cand AS (
            SELECT v AS split,
                   CAST(sum(cnt) OVER w AS BIGINT) AS nl,
                   CAST(sum(np) OVER w AS BIGINT) AS pl
            FROM b
            WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
        ), scored AS (
            SELECT split, nl, pl,
                   n - nl AS nr, p - pl AS pr,
                   CAST(floor(1000000000.0 * (
                       (CAST(nl AS DOUBLE)
                        - (CAST(pl * pl AS DOUBLE) / nl)
                        - (CAST((nl - pl) * (nl - pl) AS DOUBLE) / nl))
                     + (CAST(n - nl AS DOUBLE)
                        - (CAST((p - pl) * (p - pl) AS DOUBLE) / (n - nl))
                        - (CAST(((n - nl) - (p - pl))
                                * ((n - nl) - (p - pl)) AS DOUBLE)
                           / (n - nl)))
                   ) / n) AS BIGINT) AS impurity_nano
            FROM cand, tot
            WHERE nl > 0 AND n - nl > 0
        )
        SELECT split AS best_split, nl, pl, nr, pr, impurity_nano
        FROM scored
        ORDER BY impurity_nano, split LIMIT 1
    """,
)
def decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN a decision stump (one-split tree) on purchase-vs-click
    over integer score buckets: for every candidate threshold, the
    quantity n·gini_weighted = Σ_side (n_s − pos_s²/n_s − neg_s²/n_s)
    is evaluated from cumulative integer counts and the argmin split
    wins (ties to the smaller split). Proof the engine trains models,
    not just scores them — the same cumulative-count frame a
    gradient-boosting histogram builder uses per feature per round.

    Determinism: every input to the impurity expression is an exact
    integer from ONE pinned-order window pass; both engines evaluate
    the identical rational expression and FLOOR it to nanos, so the
    argmin is over identical integers (float compare never decides).

    Scale: one rollup to ≤|score domain| buckets, one cumulative
    window over them, argmin via TakeOrdered(1) — the scan is touched
    once regardless of candidate count.
    """
    from pyspark.sql import Window as W

    b = _score_buckets(spark, sf_dir)
    tot = b.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("np").cast("long").alias("p"),
    )
    wrun = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cand = (
        b.withColumn("nl", F.sum("cnt").over(wrun).cast("long"))
        .withColumn("pl", F.sum("np").over(wrun).cast("long"))
        .crossJoin(F.broadcast(tot))
        .filter((F.col("nl") > 0) & (F.col("n") - F.col("nl") > 0))
    )
    nl, pl = F.col("nl"), F.col("pl")
    nr = F.col("n") - nl
    pr = F.col("p") - pl
    left = (
        nl.cast("double")
        - (pl * pl).cast("double") / nl
        - ((nl - pl) * (nl - pl)).cast("double") / nl
    )
    right = (
        nr.cast("double")
        - (pr * pr).cast("double") / nr
        - ((nr - pr) * (nr - pr)).cast("double") / nr
    )
    scored = cand.select(
        F.col("v").alias("best_split"),
        "nl", "pl",
        nr.alias("nr"), pr.alias("pr"),
        F.floor(F.lit(1000000000.0) * (left + right) / F.col("n"))
        .cast("long").alias("impurity_nano"),
    )
    return scored.orderBy("impurity_nano", "best_split").limit(1)
