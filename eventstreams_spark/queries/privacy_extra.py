"""Privacy-engineering family: k-anonymity / l-diversity audits and
deterministic Laplace-mechanism counts — the compliance queries that
sit next to the existing GDPR purge audit and PII redaction in a
production pipeline.

Float discipline: equivalence-class sizes and distinct counts are
exact integers; the Laplace quantile transform runs on md5-minted
uniforms (the repo's deterministic mint — documented as the TEST-MODE
noise source; production swaps in a CSPRNG and loses replayability by
design) with literal scale arithmetic, so both engines compute the
identical 'noisy' integers.

Scale: all three queries collapse the scan to the quasi-identifier
class frame first (one rollup); audits and noise run on class rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ._shared import md5_uniform_sql


@query(
    "k_anonymity_census",
    category="PV-kanon",
    oracle="""
        WITH classes AS (
            SELECT event_type,
                   CAST(extract(hour FROM ts) AS BIGINT) AS hour_band,
                   CAST(user_id % 25 AS BIGINT) AS user_bucket,
                   CAST(count(*) AS BIGINT) AS class_size,
                   CAST(count(DISTINCT CAST(floor(value / 50) AS BIGINT))
                        AS BIGINT) AS n_sensitive
            FROM events WHERE value IS NOT NULL
            GROUP BY ALL
        )
        SELECT (class_size < 5) AS under_k,
               (n_sensitive < 3) AS under_l,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(class_size) AS BIGINT) AS n_rows,
               CAST(min(class_size) AS BIGINT) AS min_class_size
        FROM classes
        GROUP BY (class_size < 5), (n_sensitive < 3)
        ORDER BY under_k, under_l
    """,
)
def k_anonymity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity + l-diversity audit in one pass: rows group into
    equivalence classes by their quasi-identifiers (event_type,
    hour, user bucket — the generalized attributes a release
    would publish), and the census tabulates classes failing k = 5
    (re-identifiable: fewer than 5 indistinguishable rows) and
    failing l = 3 (attribute-disclosing: fewer than 3 distinct
    sensitive values — value bands here) with affected row counts.
    The release decision ('suppress these cells') reads directly off
    this frame.

    Scale: ONE rollup with an embedded distinct-count to the class
    frame (|QI-combinations| rows); the audit aggregates classes.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    classes = ev.groupBy(
        "event_type",
        F.hour("ts").cast("long").alias("hour_band"),
        (F.col("user_id") % 25).cast("long").alias("user_bucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        F.count_distinct(F.floor(F.col("value") / 50).cast("long"))
        .cast("long").alias("n_sensitive"),
    )
    return (
        classes.groupBy(
            (F.col("class_size") < 5).alias("under_k"),
            (F.col("n_sensitive") < 3).alias("under_l"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("class_size").cast("long").alias("n_rows"),
            F.min("class_size").cast("long").alias("min_class_size"),
        )
    )


@query(
    "dp_laplace_counts",
    category="PV-dp",
    oracle=f"""
        WITH cells AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type
        ), noised AS (
            SELECT event_type, n,
                   {md5_uniform_sql("'dp:' || event_type")} - 0.5 AS u
            FROM cells
        )
        SELECT event_type, n AS true_count,
               CAST(n + round(-1.0 * (CASE WHEN u >= 0 THEN 1.0
                                           ELSE -1.0 END)
                              * ln(1.0 - 2.0 * abs(u))) AS BIGINT)
                   AS dp_count,
               CAST(round(-1.0 * (CASE WHEN u >= 0 THEN 1.0 ELSE -1.0 END)
                          * ln(1.0 - 2.0 * abs(u)), 6) AS DOUBLE)
                   AS laplace_draw
        FROM noised ORDER BY event_type
    """,
)
def dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private counts via the Laplace mechanism
    (ε = 1, sensitivity 1 → scale b = 1): each published count gets
    Laplace noise drawn through the inverse CDF
    −b·sgn(u)·ln(1 − 2|u|) on a uniform minted from md5 of the cell
    key — DETERMINISTIC noise, which is exactly what a TEST of a DP
    release pipeline needs (replayable, cross-engine hash-checkable);
    the docstring is the contract that production swaps the mint for
    a CSPRNG, giving up replayability by design. The mechanism
    plumbing — sensitivity bookkeeping, inverse-CDF transform,
    integer rounding of the release — is what this query pins.

    Scale: noise is a per-row map over the aggregated cell frame.
    """
    from ..functions.sampling import md5_uniform

    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    u = md5_uniform("concat('dp:', event_type)") - 0.5
    draw = (
        F.lit(-1.0)
        * F.when(u >= 0, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(u))
    )
    return cells.select(
        "event_type",
        F.col("n").alias("true_count"),
        (F.col("n") + F.round(draw)).cast("long").alias("dp_count"),
        F.round(draw, 6).alias("laplace_draw"),
    )


@query(
    "skyline_pareto_frontier",
    category="PV-skyline",
    oracle="""
        WITH pts AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS price_cents,
                   CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
            FROM lineitem
        ), ranked AS (
            SELECT *,
                   max(qty) OVER (ORDER BY price_cents, qty DESC,
                                  l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS best_qty_cheaper
            FROM pts
        )
        SELECT l_orderkey, l_linenumber, price_cents, qty
        FROM ranked
        WHERE best_qty_cheaper IS NULL OR qty > best_qty_cheaper
        ORDER BY price_cents, qty DESC, l_orderkey, l_linenumber
    """,
)
def skyline_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): line items not dominated on
    (minimize price, maximize quantity) — the multi-criteria
    shortlist query (cheapest-for-its-size offers) that no plain
    ORDER BY expresses. Sorted by price with a deterministic
    tiebreak, a point survives iff its quantity strictly exceeds the
    best quantity among all STRICTLY ordered predecessors — one
    running-max window computes the whole frontier.

    Determinism: prices/quantities are integer cents/units; the
    window order tiebreaks through (qty DESC, orderkey, linenumber),
    and under that order equal-price points correctly dominate their
    successors (the first of an equal-price run has the run's max
    qty).

    Scale: the documented cost is the single-sequence window (global
    order by price) — the standard skyline-sweep layout; a
    partitioned variant would grid price into bands, compute local
    frontiers, and merge band boundaries (same two-level trick as
    exact_global_rank).
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey", "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        .alias("price_cents"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"),
    )
    wo = W.orderBy(
        "price_cents", F.col("qty").desc(), "l_orderkey", "l_linenumber"
    ).rowsBetween(W.unboundedPreceding, -1)
    ranked = pts.withColumn("best_qty_cheaper", F.max("qty").over(wo))
    return (
        ranked.filter(
            F.col("best_qty_cheaper").isNull()
            | (F.col("qty") > F.col("best_qty_cheaper"))
        )
        .select("l_orderkey", "l_linenumber", "price_cents", "qty")
        .orderBy("price_cents", F.col("qty").desc(), "l_orderkey", "l_linenumber")
    )


@query(
    "randomized_response_debias",
    category="PV-randresp",
    oracle="""
        WITH truth AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS y
            FROM events GROUP BY user_id
        ), reported AS (
            SELECT user_id, y,
                   CASE WHEN (instr('0123456789abcdef',
                                    substr(md5('rr|' ||
                                               CAST(user_id AS VARCHAR)),
                                           1, 1)) - 1) % 4 = 0
                        THEN 1 - y ELSE y END AS y_rr
            FROM truth
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(y) AS BIGINT) AS true_count,
               CAST(sum(y_rr) AS BIGINT) AS observed_count,
               CAST(round((CAST(sum(y_rr) AS DOUBLE)
                           - 0.25 * count(*)) / 0.5, 6) AS DOUBLE)
                   AS debiased_estimate,
               CAST(round(abs((CAST(sum(y_rr) AS DOUBLE)
                               - 0.25 * count(*)) / 0.5
                              - sum(y)), 6) AS DOUBLE) AS abs_error,
               CAST(round(ln(3.0), 6) AS DOUBLE) AS epsilon_ldp
        FROM reported
    """,
)
def randomized_response_debias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized response (Warner 1965 — the original local-DP
    mechanism): each user's true "did purchase" bit is flipped with
    probability p = 1/4 (md5-minted deterministic coin), giving
    ε = ln((1−p)/p) = ln 3 local differential privacy; the collector
    never sees truth, yet the population count debiases exactly as
    (O − pN)/(1−2p). The emitted abs_error against the true count is
    the utility price of the privacy — the whole LDP trade in one
    row.

    Determinism: flips are md5-minted; counts are integers; the
    debias is one shared-text double expression.

    Scale: one per-user aggregate plus a 1-row census — the
    mechanism is embarrassingly map-side, which is exactly why
    randomized response scales to telemetry collection.
    """
    ev = load_table(spark, sf_dir, "events")
    truth = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y")
    )
    flip = (
        F.expr(
            "(instr('0123456789abcdef',"
            " substr(md5(concat('rr|', cast(user_id AS STRING))), 1, 1))"
            " - 1) % 4"
        )
        == 0
    )
    reported = truth.select(
        "user_id", "y",
        F.when(flip, 1 - F.col("y")).otherwise(F.col("y")).alias("y_rr"),
    )
    est = (F.sum("y_rr").cast("double") - 0.25 * F.count(F.lit(1))) / 0.5
    return reported.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("y").cast("long").alias("true_count"),
        F.sum("y_rr").cast("long").alias("observed_count"),
        F.round(est, 6).alias("debiased_estimate"),
        F.round(F.abs(est - F.sum("y")), 6).alias("abs_error"),
        F.round(F.log(F.lit(3.0)), 6).alias("epsilon_ldp"),
    )


@query(
    "t_closeness_census",
    category="PV-tclose",
    oracle="""
        WITH base AS (
            SELECT event_type,
                   CAST(extract(hour FROM ts) AS BIGINT) AS hour_band,
                   CAST(user_id % 25 AS BIGINT) AS user_bucket,
                   least(CAST(floor(value / 50) AS BIGINT), 9) AS sb
            FROM events WHERE value IS NOT NULL
        ), cells AS (
            SELECT event_type, hour_band, user_bucket, sb,
                   CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY ALL
        ), groups AS (
            SELECT event_type, hour_band, user_bucket,
                   CAST(sum(n) AS BIGINT) AS n_g
            FROM cells GROUP BY ALL
        ), gband AS (
            SELECT sb, CAST(sum(n) AS BIGINT) AS n_b FROM cells GROUP BY sb
        ), tot AS (
            SELECT CAST(sum(n_b) AS BIGINT) AS n_all FROM gband
        ), spine AS (
            SELECT g.event_type, g.hour_band, g.user_bucket, g.n_g,
                   t.sb, coalesce(c.n, 0) AS n,
                   coalesce(gl.n_b, 0) AS n_b
            FROM groups g
            CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS sb) t
            LEFT JOIN cells c USING (event_type, hour_band, user_bucket, sb)
            LEFT JOIN gband gl ON gl.sb = t.sb
        ), cums AS (
            SELECT event_type, hour_band, user_bucket, n_g, sb,
                   sum(n) OVER (PARTITION BY event_type, hour_band,
                                user_bucket ORDER BY sb) AS cum_g,
                   sum(n_b) OVER (PARTITION BY event_type, hour_band,
                                  user_bucket ORDER BY sb) AS cum_b
            FROM spine
        ), emds AS (
            SELECT event_type, hour_band, user_bucket, n_g,
                   CAST(sum(abs(cum_g * t.n_all - cum_b * n_g))
                        AS BIGINT) AS emd_int,
                   CAST(round(sum(abs(cum_g * t.n_all - cum_b * n_g))
                        * 1.0 / (n_g * t.n_all * 9.0), 6) AS DOUBLE)
                       AS emd
            FROM cums CROSS JOIN tot t
            GROUP BY event_type, hour_band, user_bucket, n_g, t.n_all
        )
        SELECT (emd > 0.25) AS over_t,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(n_g) AS BIGINT) AS n_rows,
               CAST(round(max(emd), 6) AS DOUBLE) AS max_emd
        FROM emds
        GROUP BY (emd > 0.25)
        ORDER BY over_t
    """,
)
def t_closeness_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS audit — the third rung of the release-privacy
    ladder after k_anonymity_census's k and l checks: even a
    k-anonymous, l-diverse equivalence class leaks if its SENSITIVE
    distribution differs from the table's (an attacker learns 'this
    cohort skews to the top value band'). Per QI class (the same
    event_type × hour × user-bucket generalization the k/l census
    audits), the distance to the global sensitive distribution is
    the ORDERED earth-mover's distance over the 10 fixed value
    bands — EMD = (1/(m−1))·Σ_j |F_class(j) − F_global(j)|, the
    Li-Li-Venkatasubramanian (ICDE'07) ordered-attribute metric —
    and the census tabulates classes violating t = 0.25 with their
    row exposure and the worst EMD.

    Exactness: the two CDFs cross-multiply to integers
    (|cum_g·N − cum_b·n_g|), so the per-class EMD numerator is an
    exact BIGINT and the single normalizing division
    /(n_g·N·(m−1)) is one shared double op; the census groups on a
    threshold compare of that quotient.

    Scale: one rollup to the |QI|×10 cell frame, a broadcast 10-row
    band spine, and cumulative windows PARTITIONED BY CLASS (keyed,
    never global); the global band distribution is a 10-row
    broadcast. Same cost class as k_anonymity_census plus one keyed
    window pass.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    base = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hour_band"),
        (F.col("user_id") % 25).cast("long").alias("user_bucket"),
        F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(9))
        .alias("sb"),
    )
    cells = base.groupBy(
        "event_type", "hour_band", "user_bucket", "sb"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    groups = cells.groupBy("event_type", "hour_band", "user_bucket").agg(
        F.sum("n").cast("long").alias("n_g")
    )
    glob = cells.groupBy("sb").agg(F.sum("n").cast("long").alias("n_b"))
    tot = glob.agg(F.sum("n_b").cast("long").alias("n_all"))
    bands = spark.range(0, 10).select(F.col("id").cast("long").alias("sb"))
    spine = (
        groups.crossJoin(F.broadcast(bands))
        .join(cells, ["event_type", "hour_band", "user_bucket", "sb"], "left")
        .join(F.broadcast(glob), "sb", "left")
        .select(
            "event_type", "hour_band", "user_bucket", "n_g", "sb",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(
        "event_type", "hour_band", "user_bucket"
    ).orderBy("sb")
    cums = spine.select(
        "event_type", "hour_band", "user_bucket", "n_g", "sb",
        F.sum("n").over(w).alias("cum_g"),
        F.sum("n_b").over(w).alias("cum_b"),
    )
    emds = (
        cums.crossJoin(F.broadcast(tot))
        .groupBy("event_type", "hour_band", "user_bucket", "n_g", "n_all")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_g") * F.col("n_all")
                    - F.col("cum_b") * F.col("n_g")
                )
            ).cast("long").alias("emd_int")
        )
        .select(
            "n_g",
            F.round(
                F.col("emd_int")
                / (F.col("n_g") * F.col("n_all") * 9.0),
                6,
            ).alias("emd"),
        )
    )
    return (
        emds.groupBy((F.col("emd") > 0.25).alias("over_t"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("n_g").cast("long").alias("n_rows"),
            F.round(F.max("emd"), 6).alias("max_emd"),
        )
    )
