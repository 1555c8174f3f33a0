"""Operational statistics: Little's-law consistency (L = λ·W — the
queueing identity every capacity dashboard should but rarely does
cross-check) and a 2-state HMM burst filter (the forward-algorithm /
Kleinberg-burst-detection shape: a sequential log-odds fold whose
per-day output is P(bursting | data so far)).

Float discipline: arrivals, durations (treated as whole seconds of
service time via the cent trick /100), and tick crossings are exact
integers; the HMM fold applies identical literal-constant log-space
expressions in identical order on both engines (recursive CTE ≡ JVM
fold), with the log-odds clamped at ±30 before exponentiation so
saturation is bit-identical rather than Inf/Inf-NaN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "little_law_consistency",
    category="OPS-littles",
    oracle="""
        WITH ev AS (
            SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS t0_s,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS dur_cs
            FROM events WHERE value IS NOT NULL
        ), span AS (
            SELECT CAST(floor(min(t0_s) / 3600) AS BIGINT) AS h0,
                   CAST(floor(max(t0_s) / 3600) AS BIGINT) AS h1
            FROM ev
        ), per AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(dur_cs) AS BIGINT) AS sum_cs,
                   CAST(sum(CASE WHEN t0_s * 100 + dur_cs
                                   > (floor(t0_s / 3600) + 1) * 360000
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS tick_crossings
            FROM ev GROUP BY event_type
        )
        SELECT per.event_type, per.n,
               span.h1 - span.h0 AS n_ticks,
               CAST(round(CAST(per.n AS DOUBLE) / (span.h1 - span.h0), 6)
                    AS DOUBLE) AS lambda_per_h,
               CAST(round(CAST(per.sum_cs AS DOUBLE) / per.n / 100.0, 6)
                    AS DOUBLE) AS w_mean_s,
               CAST(round(CAST(per.sum_cs AS DOUBLE) / 100.0
                          / ((span.h1 - span.h0) * 3600.0), 6) AS DOUBLE)
                   AS l_littles,
               CAST(round(CAST(per.tick_crossings AS DOUBLE)
                          / (span.h1 - span.h0), 6) AS DOUBLE) AS l_sampled
        FROM per CROSS JOIN span
        ORDER BY per.event_type
    """,
)
def little_law_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law cross-check per channel: treating each event's
    value as its service duration in seconds, L = λ·W predicts the
    average number in flight (Σdur / T); the independent measurement
    samples concurrency at every hour boundary — an event is "in
    flight at a tick" iff its interval crosses the next hour boundary
    (durations ≤ 330 s < 1 h, so each event can cross at most one
    tick and the overlap count is a plain conditional sum, no
    interval join needed). l_littles ≈ l_sampled is the identity; a
    systematic gap flags clock skew or truncated durations — the
    production use of the check.

    Determinism: timestamps floor to whole epoch seconds (DuckDB's
    epoch() is fractional — house lesson) and durations to
    centiseconds, so the crossing test t0·100 + dur > tick·100 is
    pure integer comparison; every output is one division of exact
    integers.

    Scale: ONE map-side-combinable aggregate per channel plus a
    1-row span broadcast — the concurrency sample that naively needs
    a tick×event range join collapses into the scan because the
    duration bound caps candidates at one tick.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.unix_timestamp("ts")).cast("long").alias("t0_s"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("dur_cs"),
        )
    )
    span = ev.agg(
        F.floor(F.min("t0_s") / 3600).cast("long").alias("h0"),
        F.floor(F.max("t0_s") / 3600).cast("long").alias("h1"),
    )
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dur_cs").cast("long").alias("sum_cs"),
        F.sum(
            F.when(
                F.col("t0_s") * 100 + F.col("dur_cs")
                > (F.floor(F.col("t0_s") / 3600) + 1) * 360000,
                1,
            ).otherwise(0)
        ).cast("long").alias("tick_crossings"),
    )
    ticks = F.col("h1") - F.col("h0")
    return (
        per.crossJoin(F.broadcast(span))
        .select(
            "event_type", "n",
            ticks.cast("long").alias("n_ticks"),
            F.round(F.col("n").cast("double") / ticks, 6).alias("lambda_per_h"),
            F.round(F.col("sum_cs").cast("double") / F.col("n") / 100.0, 6)
            .alias("w_mean_s"),
            F.round(
                F.col("sum_cs").cast("double") / 100.0 / (ticks * 3600.0), 6
            ).alias("l_littles"),
            F.round(F.col("tick_crossings").cast("double") / ticks, 6)
            .alias("l_sampled"),
        )
    )


# HMM burst filter constants: burst rate = 3x base, sticky states
_P01 = "0.1"   # base -> burst
_P11 = "0.8"   # burst -> burst  (stay)
_P00 = "0.9"
_P10 = "0.2"
_RATE_MULT = "3.0"
_CLAMP = "30.0"


def _hmm_step(L: str, k: str, lam0: str) -> str:
    """One forward step in log-odds space — IDENTICAL text on both
    engines. L' = ln((p01 + p11·e^L)/(p00 + p10·e^L))
                + k·ln(mult) − (mult−1)·λ0, with e^L clamp at ±30.

    The state is RE-QUANTIZED to 6 decimals every step: ln/exp are
    not correctly-rounded and differ by ulps between the JVM and
    libm, and over a 150-step sequential fold those ulps accumulate
    past the output's 1e-6 rounding boundary (observed at sf0.001).
    Rounding the carried state each step makes both engines consume
    bit-identical inputs, so per-step drift (~1e-15) can never
    compound — the standard cross-engine fold-synchronization trick.
    """
    eL = f"exp(greatest(least({L}, {_CLAMP}), -{_CLAMP}))"
    return (
        f"round(ln(({_P01} + {_P11} * {eL}) / ({_P00} + {_P10} * {eL}))"
        f" + CAST({k} AS DOUBLE) * ln({_RATE_MULT})"
        f" - ({_RATE_MULT} - 1.0) * {lam0}, 6)"
    )


@query(
    "hmm_burst_forward_filter",
    category="T14-burst",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS k
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ), lam AS (
            SELECT event_type,
                   CAST(sum(k) AS DOUBLE) / count(*) AS lam0
            FROM daily GROUP BY event_type
        ), seq AS (
            SELECT d.event_type, d.day, d.k, lam.lam0,
                   row_number() OVER (PARTITION BY d.event_type
                                      ORDER BY d.day) AS rn
            FROM daily d JOIN lam ON lam.event_type = d.event_type
        ), r AS (
            SELECT event_type, rn, day, k, lam0,
                   {_hmm_step(f"ln(CAST({_P01} AS DOUBLE) / CAST({_P00} AS DOUBLE))", "k", "lam0")} AS lodds
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.event_type, s.rn, s.day, s.k, s.lam0,
                   {_hmm_step("r.lodds", "s.k", "s.lam0")}
            FROM r JOIN seq s
              ON s.event_type = r.event_type AND s.rn = r.rn + 1
        )
        SELECT event_type, day, k,
               CAST(round(greatest(least(lodds, {_CLAMP}), -{_CLAMP}), 6)
                    AS DOUBLE) AS log_odds,
               CAST(round(1.0 / (1.0
                    + exp(-greatest(least(lodds, {_CLAMP}), -{_CLAMP}))), 6)
                    AS DOUBLE) AS p_burst
        FROM r ORDER BY event_type, day
    """,
)
def hmm_burst_forward_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-state HMM burst filter (the Kleinberg burst-detection /
    forward-algorithm shape) over each channel's daily counts: state
    0 emits Poisson(λ₀), state 1 Poisson(3λ₀), sticky transitions
    (p01=0.1, p11=0.8); the fold carries the forward LOG-ODDS
    L_t = ln(α₁/α₀) — the normalization-free form of the forward
    recursion (the Poisson k! and λ₀-only factors cancel in the
    ratio, so no lgamma and no underflow) — and each day emits the
    filtering posterior P(burst | counts so far) = σ(L_t).

    Determinism: λ₀ is an exact-integer ratio; every step is
    identical literal-constant log-space arithmetic on both engines
    (recursive CTE ≡ JVM fold), with e^L clamped at ±30 so
    saturation is bit-identical instead of Inf/Inf.

    Scale: one rollup to |channels|×|days|, one fold per channel in
    whole-stage codegen — per-key burst filtering at millions of
    keys is the same groupBy+fold.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    lam = daily.groupBy("event_type").agg(
        (F.sum("k").cast("double") / F.count(F.lit(1))).alias("lam0")
    )
    packed = (
        daily.join(F.broadcast(lam), "event_type")
        .groupBy("event_type", "lam0")
        .agg(F.array_sort(F.collect_list(F.struct("day", "k"))).alias("series"))
    )
    init = _hmm_step(f"ln(CAST({_P01} AS DOUBLE) / CAST({_P00} AS DOUBLE))", "z.k", "lam0")
    step = _hmm_step("element_at(acc, -1).lodds", "z.k", "lam0")
    folded = packed.select(
        "event_type",
        F.expr(
            f"""
            aggregate(
                series,
                CAST(array() AS ARRAY<STRUCT<day DATE, k BIGINT,
                                             lodds DOUBLE>>),
                (acc, z) -> CASE WHEN size(acc) = 0 THEN
                    array(struct(z.day AS day, z.k AS k, {init} AS lodds))
                ELSE array_append(acc,
                    struct(z.day AS day, z.k AS k, {step} AS lodds))
                END
            )
            """
        ).alias("walked"),
    )
    lo = F.greatest(F.least(F.col("w.lodds"), F.lit(30.0)), F.lit(-30.0))
    return (
        folded.select("event_type", F.explode("walked").alias("w"))
        .select(
            "event_type",
            F.col("w.day").alias("day"),
            F.col("w.k").alias("k"),
            F.round(lo, 6).alias("log_odds"),
            F.round(1.0 / (1.0 + F.exp(-lo)), 6).alias("p_burst"),
        )
    )


_HURST_NS = (8, 16, 32, 64)


@query(
    "hurst_rescaled_range",
    category="T22-hurst",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS x,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY CAST(floor(epoch(ts)) AS BIGINT) // 3600
                   ) AS rn
            FROM events
            GROUP BY event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600
        ), sized AS (
            SELECT h.event_type, h.rn, h.x, s.n,
                   CAST((h.rn - 1) // s.n AS BIGINT) AS b
            FROM hourly h
            CROSS JOIN (SELECT unnest(ARRAY{list(_HURST_NS)}) AS n) s
        ), framed AS (
            SELECT event_type, n, b, rn, x,
                   CAST(rn - b * n AS BIGINT) AS k,
                   CAST(sum(x) OVER (PARTITION BY event_type, n, b
                                     ORDER BY rn) AS BIGINT) AS p,
                   CAST(sum(x) OVER (PARTITION BY event_type, n, b)
                        AS BIGINT) AS sb,
                   CAST(sum(x * x) OVER (PARTITION BY event_type, n, b)
                        AS BIGINT) AS qb,
                   count(*) OVER (PARTITION BY event_type, n, b) AS cnt
            FROM sized
        ), dev AS (
            SELECT event_type, n, b, sb, qb,
                   p - k * (CAST(sb AS DOUBLE) / n) AS cum
            FROM framed WHERE cnt = n
        ), blocks AS (
            SELECT event_type, n, b,
                   max(cum) - min(cum) AS r,
                   sqrt(CAST(qb AS DOUBLE) / n
                        - (CAST(sb AS DOUBLE) / n) * (CAST(sb AS DOUBLE) / n))
                       AS s
            FROM dev GROUP BY event_type, n, b, sb, qb
        ), rs AS (
            SELECT event_type, n,
                   CAST(count(*) AS BIGINT) AS n_blocks,
                   avg(r / s) AS avg_rs
            FROM blocks WHERE s > 0 GROUP BY event_type, n
        ), slope AS (
            SELECT event_type,
                   (count(*) * sum(ln(CAST(n AS DOUBLE)) * ln(avg_rs))
                    - sum(ln(CAST(n AS DOUBLE))) * sum(ln(avg_rs)))
                   / (count(*) * sum(ln(CAST(n AS DOUBLE)) * ln(CAST(n AS DOUBLE)))
                      - sum(ln(CAST(n AS DOUBLE))) * sum(ln(CAST(n AS DOUBLE))))
                       AS h
            FROM rs GROUP BY event_type
        )
        SELECT rs.event_type, rs.n, rs.n_blocks,
               CAST(round(rs.avg_rs, 6) AS DOUBLE) AS avg_rs,
               CAST(round(slope.h, 6) AS DOUBLE) AS hurst
        FROM rs JOIN slope ON slope.event_type = rs.event_type
        ORDER BY rs.event_type, rs.n
    """,
)
def hurst_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by classical R/S (rescaled-range) analysis over
    each channel's hourly count sequence: for block sizes n ∈
    {{8,16,32,64}}, each full block contributes R/S (range of the
    cumulative deviations over the population std), and H is the
    log-log OLS slope of the averaged R/S against n — the
    long-memory probe (H≈0.5 ⇒ no memory, H>0.5 ⇒ persistent load,
    the number capacity planners fit before choosing a smoothing
    horizon).

    Determinism: counts and their block prefix sums are exact
    integers; each cumulative deviation is the fixed expression
    P_k − k·(S_b/n); R, S are identical-double per block; the only
    cross-engine float accumulations are the ≤90-term block averages
    and the 4-point slope sums, both far under round 6.

    Scale: one rollup to |types|×|hours|, a ×4 literal fan-out, and
    windows partitioned by (type, n, block) — block frames are ≤64
    rows each; nothing touches raw events twice.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            (F.floor(F.unix_timestamp("ts")) / 3600).cast("long").alias("hr"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .select(
            "event_type", "x",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("hr"))
            .alias("rn"),
        )
    )
    sized = hourly.select(
        "event_type", "rn", "x",
        F.explode(F.array(*[F.lit(n) for n in _HURST_NS])).alias("n"),
    ).select(
        "event_type", "rn", "x", "n",
        F.floor((F.col("rn") - 1) / F.col("n")).cast("long").alias("b"),
    )
    wb = Window.partitionBy("event_type", "n", "b")
    wo = wb.orderBy("rn")
    framed = sized.select(
        "event_type", "n", "b", "rn", "x",
        (F.col("rn") - F.col("b") * F.col("n")).cast("long").alias("k"),
        F.sum("x").over(wo).cast("long").alias("p"),
        F.sum("x").over(wb).cast("long").alias("sb"),
        F.sum(F.col("x") * F.col("x")).over(wb).cast("long").alias("qb"),
        F.count(F.lit(1)).over(wb).alias("cnt"),
    )
    dev = framed.filter(F.col("cnt") == F.col("n")).select(
        "event_type", "n", "b", "sb", "qb",
        (F.col("p") - F.col("k") * (F.col("sb").cast("double") / F.col("n")))
        .alias("cum"),
    )
    mean = F.col("sb").cast("double") / F.col("n")
    blocks = dev.groupBy("event_type", "n", "b", "sb", "qb").agg(
        (F.max("cum") - F.min("cum")).alias("r")
    ).select(
        "event_type", "n", "b", "r",
        F.sqrt(F.col("qb").cast("double") / F.col("n") - mean * mean).alias("s"),
    )
    rs = (
        blocks.filter(F.col("s") > 0)
        .groupBy("event_type", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.avg(F.col("r") / F.col("s")).alias("avg_rs"),
        )
    )
    lx = F.log(F.col("n").cast("double"))
    ly = F.log("avg_rs")
    slope = rs.groupBy("event_type").agg(
        (
            (F.count(F.lit(1)) * F.sum(lx * ly) - F.sum(lx) * F.sum(ly))
            / (F.count(F.lit(1)) * F.sum(lx * lx) - F.sum(lx) * F.sum(lx))
        ).alias("h")
    )
    return (
        rs.join(F.broadcast(slope), "event_type")
        .select(
            "event_type", "n", "n_blocks",
            F.round("avg_rs", 6).alias("avg_rs"),
            F.round("h", 6).alias("hurst"),
        )
    )


@query(
    "binary_segmentation_changepoint",
    category="T14-changepoint",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type, CAST(ts AS DATE)
        ), seq AS (
            SELECT event_type, day, cents,
                   row_number() OVER w AS rn,
                   CAST(sum(cents) OVER w AS BIGINT) AS p,
                   CAST(sum(cents * cents) OVER w AS BIGINT) AS q,
                   CAST(sum(cents) OVER (PARTITION BY event_type)
                        AS BIGINT) AS pt,
                   CAST(sum(cents * cents) OVER (PARTITION BY event_type)
                        AS BIGINT) AS qt,
                   count(*) OVER (PARTITION BY event_type) AS nt
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        ), splits AS (
            SELECT event_type, day, rn, nt, pt, qt,
                   (CAST(q AS DOUBLE) - CAST(p AS DOUBLE) * p / rn)
                   + (CAST(qt - q AS DOUBLE)
                      - CAST(pt - p AS DOUBLE) * (pt - p) / (nt - rn))
                       AS sse_split
            FROM seq WHERE rn < nt
        ), keyed AS (
            SELECT event_type, nt, pt, qt,
                   min(lpad(CAST(CAST(round(sse_split * 100) AS BIGINT)
                                 AS VARCHAR), 20, '0')
                       || lpad(CAST(rn AS VARCHAR), 8, '0')) AS k
            FROM splits GROUP BY event_type, nt, pt, qt
        )
        SELECT k2.event_type,
               s.day AS split_day,
               s.rn AS split_at,
               k2.nt AS n_days,
               CAST(round(CAST(k2.qt AS DOUBLE)
                          - CAST(k2.pt AS DOUBLE) * k2.pt / k2.nt, 2)
                    AS DOUBLE) AS sse_full,
               CAST(round(s.sse_split, 2) AS DOUBLE) AS sse_split,
               CAST(round(k2.nt * ln((CAST(k2.qt AS DOUBLE)
                          - CAST(k2.pt AS DOUBLE) * k2.pt / k2.nt)
                          / s.sse_split), 6) AS DOUBLE) AS llr_gain
        FROM keyed k2
        JOIN splits s
          ON s.event_type = k2.event_type
         AND s.rn = CAST(substr(k2.k, 21, 8) AS BIGINT)
        ORDER BY k2.event_type
    """,
)
def binary_segmentation_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-split binary segmentation per channel — the first
    recursion level of the classic changepoint search (the offline
    complement to cusum_reference_check): every split point s is
    scored by SSE(1..s) + SSE(s+1..N) from prefix sums, the argmin
    is taken on an integer centi-SSE key (ties → earliest day), and
    the log-likelihood-ratio gain N·ln(SSE_full/SSE_split) is the
    evidence a segmenter would threshold before recursing.

    Determinism: prefix sums are exact integers, each SSE(s) is a
    fixed double expression of them (no cross-engine accumulation),
    and the argmin runs on a zero-padded integer key.

    Scale: one rollup to the calendar-bounded daily frame, two
    windows, and a per-channel argmin — the O(N) split scan that
    makes binary segmentation the scalable changepoint family.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long").alias("cents")
    )
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("day")
    seq = daily.select(
        "event_type", "day", "cents",
        F.row_number().over(wo).alias("rn"),
        F.sum("cents").over(wo).cast("long").alias("p"),
        F.sum(F.col("cents") * F.col("cents")).over(wo).cast("long").alias("q"),
        F.sum("cents").over(wp).cast("long").alias("pt"),
        F.sum(F.col("cents") * F.col("cents")).over(wp).cast("long").alias("qt"),
        F.count(F.lit(1)).over(wp).alias("nt"),
    )
    sse_split = (
        F.col("q").cast("double") - F.col("p").cast("double") * F.col("p") / F.col("rn")
    ) + (
        (F.col("qt") - F.col("q")).cast("double")
        - (F.col("pt") - F.col("p")).cast("double")
        * (F.col("pt") - F.col("p"))
        / (F.col("nt") - F.col("rn"))
    )
    splits = seq.filter(F.col("rn") < F.col("nt")).select(
        "event_type", "day", "rn", "nt", "pt", "qt",
        sse_split.alias("sse_split"),
    )
    keyed = splits.groupBy("event_type", "nt", "pt", "qt").agg(
        F.min(
            F.concat(
                F.lpad(
                    F.round(F.col("sse_split") * 100).cast("long").cast("string"),
                    20, "0",
                ),
                F.lpad(F.col("rn").cast("string"), 8, "0"),
            )
        ).alias("k")
    )
    sse_full = (
        F.col("qt").cast("double")
        - F.col("pt").cast("double") * F.col("pt") / F.col("nt")
    )
    return (
        keyed.select(
            "event_type", "nt", "pt", "qt",
            F.substring("k", 21, 8).cast("long").alias("split_rn"),
        )
        .join(
            splits.select(
                "event_type", "day",
                F.col("rn").alias("split_rn"), "sse_split",
            ),
            ["event_type", "split_rn"],
        )
        .select(
            "event_type",
            F.col("day").alias("split_day"),
            F.col("split_rn").alias("split_at"),
            F.col("nt").alias("n_days"),
            F.round(sse_full, 2).alias("sse_full"),
            F.round("sse_split", 2).alias("sse_split"),
            F.round(F.col("nt") * F.log(sse_full / F.col("sse_split")), 6)
            .alias("llr_gain"),
        )
    )


@query(
    "ljung_box_whiteness",
    category="T14-diag",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ), seq AS (
            SELECT event_type, x,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM daily
        ), tot AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS s,
                   CAST(sum(x * x) AS BIGINT) AS q
            FROM seq GROUP BY event_type
        ), lagged AS (
            SELECT a.event_type, b.rn - a.rn AS k,
                   CAST(count(*) AS BIGINT) AS nk,
                   CAST(sum(a.x * b.x) AS BIGINT) AS sk,
                   CAST(sum(a.x) AS BIGINT) AS t1,
                   CAST(sum(b.x) AS BIGINT) AS t2
            FROM seq a JOIN seq b
              ON a.event_type = b.event_type
             AND b.rn - a.rn BETWEEN 1 AND 5
            GROUP BY a.event_type, b.rn - a.rn
        ), rho AS (
            SELECT l.event_type, l.k, t.n,
                   (CAST(l.sk AS DOUBLE)
                    - (CAST(t.s AS DOUBLE) / t.n) * (l.t1 + l.t2)
                    + l.nk * (CAST(t.s AS DOUBLE) / t.n)
                         * (CAST(t.s AS DOUBLE) / t.n))
                   / (CAST(t.q AS DOUBLE)
                      - CAST(t.s AS DOUBLE) * t.s / t.n) AS r
            FROM lagged l JOIN tot t ON t.event_type = l.event_type
        ), qlb AS (
            SELECT event_type, n,
                   n * (n + 2.0) * sum(r * r / (n - k)) AS q_lb
            FROM rho GROUP BY event_type, n
        )
        SELECT rho.event_type, rho.k AS lag,
               CAST(round(rho.r, 6) AS DOUBLE) AS rho,
               CAST(round(qlb.q_lb, 6) AS DOUBLE) AS q_ljung_box,
               qlb.n AS n_days
        FROM rho JOIN qlb ON qlb.event_type = rho.event_type
        ORDER BY rho.event_type, rho.k
    """,
)
def ljung_box_whiteness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box whiteness test per channel: autocorrelations ρ_k for
    lags 1..5 of the daily count series (mean-corrected, closed form
    from the lag-k cross sums), pooled into Q = n(n+2)·Σρ²_k/(n−k) —
    the residual-diagnostic every forecasting pipeline runs to ask
    "is anything left to model?".

    Determinism: the lag-k sums (Σx_t·x_{t+k}, marginal sums, counts)
    are exact integers; each ρ_k is a fixed double expression of
    them; the 5-term Q sum rounds at 6.

    Scale: the lag join is a band self-join (offset ≤ 5) on the
    calendar-bounded daily frame — O(5N) pairs; the fact scan
    happens once in the rollup.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    seq = daily.select(
        "event_type", "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("rn"),
    )
    tot = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    a = seq.select("event_type", F.col("rn").alias("ra"), F.col("x").alias("xa"))
    b = seq.select("event_type", F.col("rn").alias("rb"), F.col("x").alias("xb"))
    lagged = (
        a.join(b, "event_type")
        .filter((F.col("rb") - F.col("ra")).between(1, 5))
        .groupBy("event_type", (F.col("rb") - F.col("ra")).alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("nk"),
            F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sk"),
            F.sum("xa").cast("long").alias("t1"),
            F.sum("xb").cast("long").alias("t2"),
        )
    )
    m = F.col("s").cast("double") / F.col("n")
    rho = lagged.join(F.broadcast(tot), "event_type").select(
        "event_type", "k", "n",
        (
            (
                F.col("sk").cast("double")
                - m * (F.col("t1") + F.col("t2"))
                + F.col("nk") * m * m
            )
            / (
                F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
        ).alias("r"),
    )
    qlb = rho.groupBy("event_type", "n").agg(
        (
            F.col("n") * (F.col("n") + 2.0)
            * F.sum(F.col("r") * F.col("r") / (F.col("n") - F.col("k")))
        ).alias("q_lb")
    )
    return (
        rho.join(F.broadcast(qlb.select("event_type", "q_lb")), "event_type")
        .select(
            "event_type",
            F.col("k").alias("lag"),
            F.round("r", 6).alias("rho"),
            F.round("q_lb", 6).alias("q_ljung_box"),
            F.col("n").alias("n_days"),
        )
    )


@query(
    "runs_test_randomness",
    category="ST9-runs",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ), med AS (
            SELECT event_type, quantile_cont(x, 0.5) AS m
            FROM daily GROUP BY event_type
        ), signed AS (
            SELECT d.event_type, d.day,
                   CASE WHEN d.x > med.m THEN 1 ELSE 0 END AS s
            FROM daily d JOIN med ON med.event_type = d.event_type
            WHERE d.x <> med.m
        ), runs AS (
            SELECT event_type, s,
                   CASE WHEN lag(s) OVER (PARTITION BY event_type
                                          ORDER BY day) IS NULL
                             OR lag(s) OVER (PARTITION BY event_type
                                             ORDER BY day) <> s
                        THEN 1 ELSE 0 END AS new_run
            FROM signed
        ), agg AS (
            SELECT event_type,
                   CAST(sum(new_run) AS BIGINT) AS r,
                   CAST(sum(s) AS BIGINT) AS n1,
                   CAST(sum(1 - s) AS BIGINT) AS n2
            FROM runs GROUP BY event_type
        )
        SELECT event_type, r AS n_runs, n1 AS n_above, n2 AS n_below,
               CAST(round(2.0 * n1 * n2 / (n1 + n2) + 1.0, 6) AS DOUBLE)
                   AS mu_runs,
               CAST(round((r - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                    / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                           / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 6)
                    AS DOUBLE) AS z_stat
        FROM agg ORDER BY event_type
    """,
)
def runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per channel: daily counts are signed
    against their median (exact-median days dropped, the standard
    convention), runs of consecutive same-sign days are counted with
    a lag window, and z = (R − μ_R)/σ_R under the randomness null —
    the order-sensitive complement to the distributional tests (a
    trending or oscillating series fails it while passing KS).

    Determinism: the median is an interpolated percentile of exact
    integers (identical both engines), sign and run counts are
    integer; μ_R and σ_R are closed-form expressions of (n1, n2).

    Scale: everything after the day-grain rollup runs on the bounded
    daily frame — one percentile, one lag window, one aggregate.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(x, 0.5)").alias("m")
    )
    signed = (
        daily.join(F.broadcast(med), "event_type")
        .filter(F.col("x") != F.col("m"))
        .select(
            "event_type", "day",
            F.when(F.col("x") > F.col("m"), 1).otherwise(0).alias("s"),
        )
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    runs = signed.select(
        "event_type", "s",
        F.when(
            F.lag("s").over(wo).isNull() | (F.lag("s").over(wo) != F.col("s")),
            1,
        ).otherwise(0).alias("new_run"),
    )
    agg = runs.groupBy("event_type").agg(
        F.sum("new_run").cast("long").alias("r"),
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    sig = F.sqrt(
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return agg.select(
        "event_type",
        r.alias("n_runs"), n1.alias("n_above"), n2.alias("n_below"),
        F.round(mu, 6).alias("mu_runs"),
        F.round((r - mu) / sig, 6).alias("z_stat"),
    )


@query(
    "slo_multiwindow_burn_timeline",
    category="OPS-slo",
    oracle="""
        WITH hourly AS (
            SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN event_type = 'error'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS e
            FROM events GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 3600
        ), windowed AS (
            SELECT hr, n, e,
                   CAST(sum(n) OVER w6 AS BIGINT) AS n6,
                   CAST(sum(e) OVER w6 AS BIGINT) AS e6,
                   CAST(sum(n) OVER w24 AS BIGINT) AS n24,
                   CAST(sum(e) OVER w24 AS BIGINT) AS e24
            FROM hourly
            WINDOW w6 AS (ORDER BY hr
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),
                   w24 AS (ORDER BY hr
                           RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
        )
        SELECT hr, n, e,
               CAST(round(4.0 * e / n, 6) AS DOUBLE) AS burn_1h,
               CAST(round(4.0 * e6 / n6, 6) AS DOUBLE) AS burn_6h,
               CAST(round(4.0 * e24 / n24, 6) AS DOUBLE) AS burn_24h,
               (4 * e >= n AND 4 * e6 >= n6) AS fast_alert,
               (40 * e6 >= 9 * n6 AND 40 * e24 >= 9 * n24) AS slow_alert
        FROM windowed ORDER BY hr
    """,
)
def slo_multiwindow_burn_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow multi-burn-rate SLO alerting (the Google SRE
    workbook policy) against a 75%-success SLO: burn rate = observed
    error rate / error budget (0.25), evaluated at 1 h / 6 h / 24 h
    granularities; the FAST page fires when both the short (1 h) and
    long (6 h) windows burn ≥ 1 (the two-window AND is what kills
    one-spike false pages), the SLOW ticket when 6 h and 24 h both
    burn ≥ 0.9 (sustained slow leak).

    Determinism: alert DECISIONS are pure integer inequalities
    (burn ≥ 1 ⇔ 4e ≥ n; burn ≥ 0.9 ⇔ 40e ≥ 9n) — no float ever
    decides a boolean; displayed burn rates are single divisions of
    exact window-integer sums. Missing hours are handled by RANGE
    frames over the integer hour index, so a traffic gap widens the
    lookback correctly rather than silently shrinking it.

    Scale: ONE map-side-combinable hourly rollup off the fact scan;
    the sliding windows run on the hours frame (10⁴ rows per year) —
    at 100 TB nothing changes but the rollup's shuffle width. The
    unpartitioned ORDER BY hr window is on that bounded frame only.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            (F.floor(F.unix_timestamp("ts")) / F.lit(3600))
            .cast("long")
            .alias("hr"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_e"),
        )
        .groupBy("hr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("is_e").cast("long").alias("e"),
        )
    )
    w6 = Window.orderBy("hr").rangeBetween(-5, 0)
    w24 = Window.orderBy("hr").rangeBetween(-23, 0)
    windowed = hourly.select(
        "hr", "n", "e",
        F.sum("n").over(w6).cast("long").alias("n6"),
        F.sum("e").over(w6).cast("long").alias("e6"),
        F.sum("n").over(w24).cast("long").alias("n24"),
        F.sum("e").over(w24).cast("long").alias("e24"),
    )
    return windowed.select(
        "hr", "n", "e",
        F.round(4.0 * F.col("e") / F.col("n"), 6).alias("burn_1h"),
        F.round(4.0 * F.col("e6") / F.col("n6"), 6).alias("burn_6h"),
        F.round(4.0 * F.col("e24") / F.col("n24"), 6).alias("burn_24h"),
        (
            (4 * F.col("e") >= F.col("n")) & (4 * F.col("e6") >= F.col("n6"))
        ).alias("fast_alert"),
        (
            (40 * F.col("e6") >= 9 * F.col("n6"))
            & (40 * F.col("e24") >= 9 * F.col("n24"))
        ).alias("slow_alert"),
    ).orderBy("hr")


# Erlang-C: shared formula text (a = offered erlangs, b = Erlang-B
# blocking after the c-step recursion)
_ERLANG_C = (
    "(CAST(c AS DOUBLE) * b / (CAST(c AS DOUBLE) - a * (1.0 - b)))"
)


@query(
    "erlang_c_staffing",
    category="OPS-erlang",
    oracle=f"""
        WITH RECURSIVE per AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(min(floor(epoch(ts))) AS BIGINT) AS t0,
                   CAST(max(floor(epoch(ts))) AS BIGINT) AS t1,
                   CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS sum_cs
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        ), loads AS (
            SELECT event_type,
                   (CAST(n AS DOUBLE) / (t1 - t0))
                   * (CAST(sum_cs AS DOUBLE) / n / 100.0) AS a
            FROM per
        ), cand AS (
            SELECT event_type, a,
                   unnest(generate_series(CAST(floor(a) + 1 AS BIGINT),
                                          CAST(floor(a) + 8 AS BIGINT)))
                       AS c
            FROM loads
        ), eb AS (
            SELECT event_type, a, c, CAST(1 AS BIGINT) AS k,
                   a * 1.0 / (CAST(1 AS DOUBLE) + a * 1.0) AS b
            FROM cand
            UNION ALL
            SELECT event_type, a, c, k + 1,
                   a * b / (CAST(k + 1 AS DOUBLE) + a * b)
            FROM eb WHERE k < c
        )
        SELECT event_type, c AS n_servers,
               CAST(round(a, 6) AS DOUBLE) AS offered_erlangs,
               CAST(round(b, 6) AS DOUBLE) AS p_block_erlang_b,
               CAST(round({_ERLANG_C}, 6) AS DOUBLE) AS p_wait_erlang_c,
               ({_ERLANG_C} <= 0.2) AS meets_target
        FROM eb WHERE k = c
        ORDER BY event_type, n_servers
    """,
)
def erlang_c_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-C staffing table per channel: offered load a = λ·s̄
    (arrival rate over the channel's observed span × mean service
    time, treating value as service seconds), then for each candidate
    server count c = ⌊a⌋+1 … ⌊a⌋+8 the probability an arrival must
    WAIT, via the numerically-stable Erlang-B recursion
    B_k = a·B_{k−1}/(k + a·B_{k−1}) followed by
    C = c·B_c/(c − a(1−B_c)) — the capacity-planning table behind
    every "how many workers/agents/replicas do we need for a 20%
    wait target" decision.

    Determinism: λ and s̄ are ratios of exact integers; the recursion
    is PURE rational arithmetic (+,·,/) on identical doubles — every
    step is correctly rounded on both engines, so unlike ln/exp folds
    it is bit-exact with NO per-step requantization (Spark: JVM
    ``aggregate()`` over sequence(1,c), whole-stage codegen; DuckDB:
    recursive CTE carrying (k, B)).

    Scale: one aggregate per channel; the fold runs over ≤⌊a⌋+8
    elements per candidate row — at a million queues it's still one
    groupBy plus per-row codegen arithmetic, no joins, no Python.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(F.floor(F.unix_timestamp("ts"))).cast("long").alias("t0"),
        F.max(F.floor(F.unix_timestamp("ts"))).cast("long").alias("t1"),
        F.sum(F.floor(F.col("value") * 100 + 0.5)).cast("long").alias("sum_cs"),
    )
    loads = per.select(
        "event_type",
        (
            (F.col("n").cast("double") / (F.col("t1") - F.col("t0")))
            * (F.col("sum_cs").cast("double") / F.col("n") / 100.0)
        ).alias("a"),
    )
    cand = loads.select(
        "event_type", "a",
        F.explode(
            F.sequence(
                (F.floor("a") + 1).cast("long"),
                (F.floor("a") + 8).cast("long"),
            )
        ).alias("c"),
    )
    folded = cand.withColumn(
        "b",
        F.expr(
            "aggregate(sequence(CAST(1 AS BIGINT), c), CAST(1.0 AS DOUBLE),"
            " (acc, k) -> a * acc / (CAST(k AS DOUBLE) + a * acc))"
        ),
    )
    return folded.select(
        "event_type",
        F.col("c").alias("n_servers"),
        F.round("a", 6).alias("offered_erlangs"),
        F.round("b", 6).alias("p_block_erlang_b"),
        F.round(F.expr(_ERLANG_C), 6).alias("p_wait_erlang_c"),
        (F.expr(_ERLANG_C) <= 0.2).alias("meets_target"),
    )


@query(
    "max_concurrency_sweep",
    category="OPS-concurrency",
    oracle="""
        WITH iv AS (
            SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) * 100 AS t0_cs,
                   CAST(floor(epoch(ts)) AS BIGINT) * 100
                   + CAST(floor(value * 100 + 0.5) AS BIGINT) AS t1_cs
            FROM events WHERE value IS NOT NULL
        ), pts AS (
            SELECT event_type, t0_cs AS t, 1 AS delta FROM iv
            UNION ALL
            SELECT event_type, t1_cs, -1 FROM iv
        ), net AS (
            SELECT event_type, t, CAST(sum(delta) AS BIGINT) AS net
            FROM pts GROUP BY event_type, t
        ), running AS (
            SELECT event_type, t,
                   CAST(sum(net) OVER (PARTITION BY event_type
                                       ORDER BY t) AS BIGINT) AS conc
            FROM net
        ), peak AS (
            SELECT event_type, t, conc,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY conc DESC, t) AS rk
            FROM running
        )
        SELECT event_type,
               conc AS peak_concurrency,
               t AS peak_at_cs
        FROM peak WHERE rk = 1 ORDER BY event_type
    """,
)
def max_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact peak concurrency per channel by the classic +1/−1 sweep:
    each event is an interval [t₀, t₀+duration) in centiseconds (value
    as service seconds); starts and ends become signed points, a net
    per instant, and a running sum whose maximum is the TRUE peak
    in-flight count — the exact answer Little's-law sampling
    (little_law_consistency) only approximates, and the number
    capacity planning actually needs (erlang_c_staffing's demand-side
    input).

    Determinism: instants are exact integer centiseconds; grouping to
    per-instant nets BEFORE the running sum removes any tie-order
    ambiguity (ends and starts at the same instant collapse into one
    integer); the peak picks the EARLIEST instant on ties by rank.

    Scale: 2 points per event, one (type, t) aggregate, then the
    running sum partitioned BY CHANNEL — parallel across channels;
    for a single global timeline at 100 TB, sweep per day-bucket and
    stitch prefix offsets (the exact_global_rank construction).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (F.floor(F.unix_timestamp("ts")).cast("long") * 100).alias("t0_cs"),
            (
                F.floor(F.unix_timestamp("ts")).cast("long") * 100
                + F.floor(F.col("value") * 100 + 0.5).cast("long")
            ).alias("t1_cs"),
        )
    )
    pts = ev.select(
        "event_type", F.col("t0_cs").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "event_type", F.col("t1_cs").alias("t"), F.lit(-1).alias("delta")
        )
    )
    net = pts.groupBy("event_type", "t").agg(
        F.sum("delta").cast("long").alias("net")
    )
    running = net.select(
        "event_type", "t",
        F.sum("net")
        .over(Window.partitionBy("event_type").orderBy("t"))
        .cast("long")
        .alias("conc"),
    )
    peak = running.select(
        "event_type", "t", "conc",
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(F.desc("conc"), "t")
        )
        .alias("rk"),
    )
    return (
        peak.filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("conc").alias("peak_concurrency"),
            F.col("t").alias("peak_at_cs"),
        )
    )


@query(
    "watermark_delay_tradeoff",
    category="OPS-watermark",
    oracle="""
        WITH delayed AS (
            SELECT CAST(floor(-ln(
                       ((strpos('0123456789abcdef',
                                substr(md5('arr|' ||
                                           CAST(event_id AS VARCHAR)), 1, 1))
                         - 1) * 268435456.0
                        + (strpos('0123456789abcdef',
                                  substr(md5('arr|' ||
                                             CAST(event_id AS VARCHAR)), 2, 1))
                           - 1) * 16777216.0
                        + 0.5) / 4294967296.0
                   ) * 600.0) AS BIGINT) AS delay_s
            FROM events
        ), cand AS (
            SELECT unnest(ARRAY[60, 300, 3600, 21600]) AS w_s
        )
        SELECT c.w_s AS watermark_s,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN d.delay_s > c.w_s THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped_late,
               CAST(round(1.0 - CAST(sum(CASE WHEN d.delay_s > c.w_s
                                              THEN 1 ELSE 0 END) AS DOUBLE)
                                / count(*), 6) AS DOUBLE) AS completeness
        FROM delayed d CROSS JOIN cand c
        GROUP BY c.w_s ORDER BY c.w_s
    """,
)
def watermark_delay_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing from the arrival-delay distribution: each
    event gets a deterministic exponential-ish delay (−ln(u)·600 s
    from two md5 nibbles, mean ≈ 10 min), and candidate watermarks
    {1 m, 5 m, 1 h, 6 h} are scored by how many events they would
    drop as late vs how long results must wait — the measurement that
    should decide every withWatermark() argument instead of folklore.

    Determinism: u is a 2-nibble md5 fraction identical in both
    engines; the floor of −ln(u)·600 differs only if libm/JVM ln
    ulps straddle an integer boundary (~1e-13 relative — negligible);
    the census is integer compares.

    Scale: the delay mint is map-side; the 4-candidate fan-out is a
    broadcast cross of a literal array — one aggregate total.
    """
    ev = load_table(spark, sf_dir, "events")
    u = (
        (
            F.expr(
                "(locate(substr(md5(concat('arr|', cast(event_id AS STRING))), 1, 1),"
                " '0123456789abcdef') - 1)"
            )
            * 268435456.0
            + F.expr(
                "(locate(substr(md5(concat('arr|', cast(event_id AS STRING))), 2, 1),"
                " '0123456789abcdef') - 1)"
            )
            * 16777216.0
            + 0.5
        )
        / 4294967296.0
    )
    delayed = ev.select(
        F.floor(-F.log(u) * 600.0).cast("long").alias("delay_s")
    )
    cand = spark.createDataFrame(
        [(60,), (300,), (3600,), (21600,)], "w_s long"
    )
    return (
        delayed.crossJoin(F.broadcast(cand))
        .groupBy("w_s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.when(F.col("delay_s") > F.col("w_s"), 1).otherwise(0)
            ).cast("long").alias("n_dropped_late"),
            F.round(
                1.0
                - F.sum(
                    F.when(F.col("delay_s") > F.col("w_s"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("completeness"),
        )
        .withColumnRenamed("w_s", "watermark_s")
    )
