"""Model TRAINING as pure relational ops — the queries that prove a
"training-data engine" can also fit the classic models in-engine:
multinomial Naive Bayes (trained on an md5 holdout split of the
documents corpus, evaluated to a confusion matrix), UCB1 bandit
policy replay (sequential decision-making as a fold), and isotonic
calibration by pool-adjacent-violators (the monotone regression
behind every calibrated-probability pipeline).

Determinism contract: every log-likelihood / score term is quantized
to integer MICRO-NATS (round(ln·1e6)) BEFORE summation — each ln's
argument is an exact-integer ratio so the quantized term is
bit-identical, and integer sums commute (the RAKE / langid
micro-score house pattern); argmaxes run on exact integers with
alphabetical tie-breaks expressed as plain aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.sampling import md5_uniform
from ..registry import query
from ._shared import md5_uniform_sql

_SPLIT = 0.8  # train fraction (md5 on doc_id — engine-identical)


@query(
    "naive_bayes_train_eval",
    category="ML7-nbayes",
    oracle=f"""
        WITH docs AS (
            SELECT doc_id, lang, text,
                   CASE WHEN {md5_uniform_sql("'nbsplit:' || CAST(doc_id AS VARCHAR)")}
                        < {_SPLIT} THEN 1 ELSE 0 END AS is_train
            FROM documents
        ), toks AS (
            SELECT doc_id, lang, is_train, tok
            FROM docs, unnest(string_split(text, ' ')) AS t(tok)
            WHERE tok <> ''
        ), priors AS (
            SELECT lang,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
            FROM toks WHERE is_train = 1 GROUP BY lang
        ), prior_tot AS (
            SELECT CAST(sum(nd) AS BIGINT) AS ndt FROM priors
        ), wc AS (
            SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
            FROM toks WHERE is_train = 1 GROUP BY lang, tok
        ), ctot AS (
            SELECT lang, CAST(sum(cnt) AS BIGINT) AS nc FROM wc GROUP BY lang
        ), vocab AS (
            SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
            FROM toks WHERE is_train = 1
        ), lik AS (
            SELECT wc.lang, wc.tok,
                   CAST(round(ln(CAST(wc.cnt + 1 AS DOUBLE)
                                 / (ctot.nc + vocab.v)) * 1000000.0)
                        AS BIGINT) AS micro
            FROM wc JOIN ctot ON wc.lang = ctot.lang CROSS JOIN vocab
        ), fallback AS (
            SELECT ctot.lang,
                   CAST(round(ln(CAST(1 AS DOUBLE) / (ctot.nc + vocab.v))
                              * 1000000.0) AS BIGINT) AS fb_micro,
                   CAST(round(ln(CAST(priors.nd AS DOUBLE) / prior_tot.ndt)
                              * 1000000.0) AS BIGINT) AS prior_micro
            FROM ctot
            JOIN priors ON priors.lang = ctot.lang
            CROSS JOIN vocab CROSS JOIN prior_tot
        ), scored AS (
            SELECT t.doc_id, t.lang AS true_lang, f.lang AS cand,
                   CAST(f.prior_micro
                        + sum(coalesce(lik.micro, f.fb_micro)) AS BIGINT)
                       AS score
            FROM toks t
            CROSS JOIN fallback f
            LEFT JOIN lik ON lik.lang = f.lang AND lik.tok = t.tok
            WHERE t.is_train = 0
            GROUP BY t.doc_id, t.lang, f.lang, f.prior_micro
        ), best AS (
            SELECT doc_id, true_lang,
                   min(cand) FILTER (WHERE score = best_score) AS pred_lang
            FROM (SELECT *, max(score) OVER (PARTITION BY doc_id)
                         AS best_score
                  FROM scored)
            GROUP BY doc_id, true_lang
        ), conf AS (
            SELECT true_lang, pred_lang,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM best GROUP BY true_lang, pred_lang
        ), acc AS (
            SELECT CAST(sum(CASE WHEN true_lang = pred_lang THEN n_docs
                                 ELSE 0 END) AS BIGINT) AS n_right,
                   CAST(sum(n_docs) AS BIGINT) AS n_test
            FROM conf
        )
        SELECT conf.true_lang, conf.pred_lang, conf.n_docs,
               acc.n_test,
               CAST(round(CAST(acc.n_right AS DOUBLE) / acc.n_test, 6)
                    AS DOUBLE) AS accuracy
        FROM conf CROSS JOIN acc
        ORDER BY conf.true_lang, conf.pred_lang
    """,
)
def naive_bayes_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes, trained and evaluated entirely
    in-engine: an 80/20 md5 holdout on doc_id, Laplace-1 token
    likelihoods P(w|c) = (cnt+1)/(N_c+V) from the train split, class
    log-priors from train doc counts, and test docs scored by
    log P(c) + Σ log P(w|c) with the out-of-vocabulary fallback
    1/(N_c+V). Output: the language confusion matrix plus held-out
    accuracy — the complete train→predict→evaluate loop as five hash
    aggregates and two joins.

    Determinism: every log term is quantized to integer micro-nats
    before summation (its argument is an exact-integer ratio, so the
    quantized value is bit-identical); doc scores are exact integer
    sums; argmax = max score with alphabetical-min tie-break, both
    plain aggregates.

    Scale: train tables are token-grain hash aggregates; scoring is
    test-tokens × |classes| (a literal 5-row broadcast) left-joined
    against the (class, word) likelihood table — the standard
    model-as-a-table deployment shape; nothing is per-document
    iterative.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text",
        (
            md5_uniform("concat('nbsplit:', CAST(doc_id AS STRING))")
            < _SPLIT
        ).cast("int").alias("is_train"),
    )
    from ..operators.graph import truncate_lineage

    # the token explode feeds 4 training aggregates plus test scoring
    # — checkpoint so none re-prints (or re-runs) the explode subtree
    toks = truncate_lineage(
        docs.select(
            "doc_id", "lang", "is_train",
            F.explode(F.split("text", " ")).alias("tok"),
        ).filter(F.col("tok") != ""),
        8,
    )
    train = toks.filter(F.col("is_train") == 1)
    priors = train.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("nd")
    )
    prior_tot = priors.agg(F.sum("nd").cast("long").alias("ndt"))
    wc = train.groupBy("lang", "tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    ctot = wc.groupBy("lang").agg(F.sum("cnt").cast("long").alias("nc"))
    vocab = train.agg(F.countDistinct("tok").cast("long").alias("v"))
    lik = (
        wc.join(F.broadcast(ctot), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang", "tok",
            F.round(
                F.log((F.col("cnt") + 1).cast("double") / (F.col("nc") + F.col("v")))
                * 1000000.0
            ).cast("long").alias("micro"),
        )
    )
    fallback = (
        ctot.join(F.broadcast(priors), "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(prior_tot))
        .select(
            "lang",
            F.round(
                F.log(F.lit(1.0) / (F.col("nc") + F.col("v"))) * 1000000.0
            ).cast("long").alias("fb_micro"),
            F.round(
                F.log(F.col("nd").cast("double") / F.col("ndt")) * 1000000.0
            ).cast("long").alias("prior_micro"),
        )
    )
    test_toks = toks.filter(F.col("is_train") == 0).select(
        "doc_id", F.col("lang").alias("true_lang"), "tok"
    )
    scored = (
        test_toks.crossJoin(
            F.broadcast(
                fallback.select(
                    F.col("lang").alias("cand"), "fb_micro", "prior_micro"
                )
            )
        )
        .join(
            F.broadcast(lik.withColumnRenamed("lang", "cand")),
            ["cand", "tok"],
            "left",
        )
        .groupBy("doc_id", "true_lang", "cand", "prior_micro")
        .agg(F.sum(F.coalesce("micro", F.col("fb_micro"))).alias("tok_sum"))
        .select(
            "doc_id", "true_lang", "cand",
            (F.col("prior_micro") + F.col("tok_sum")).cast("long").alias("score"),
        )
    )
    mx = scored.groupBy("doc_id", "true_lang").agg(
        F.max("score").alias("best_score")
    )
    best = (
        scored.join(F.broadcast(mx), ["doc_id", "true_lang"])
        .filter(F.col("score") == F.col("best_score"))
        .groupBy("doc_id", "true_lang")
        .agg(F.min("cand").alias("pred_lang"))
    )
    conf = best.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    acc = conf.agg(
        F.sum(
            F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n_docs"))
            .otherwise(0)
        ).cast("long").alias("n_right"),
        F.sum("n_docs").cast("long").alias("n_test"),
    )
    return (
        conf.crossJoin(F.broadcast(acc))
        .select(
            "true_lang", "pred_lang", "n_docs", "n_test",
            F.round(F.col("n_right").cast("double") / F.col("n_test"), 6)
            .alias("accuracy"),
        )
    )


# --- UCB1 bandit policy replay -------------------------------------
# arms in fixed index order (the tie-break order of the argmax)
_ARMS = ("click", "error", "purchase", "signup", "view")
_EXPLORE = "1e18"  # unplayed-arm sentinel: forces round-robin warmup


def _ucb_exprs(n: str, s: str, t: str) -> list[str]:
    """Per-arm UCB1 value expressions — IDENTICAL text on both
    engines (n/s/t are templates for the state-field references)."""
    return [
        f"CASE WHEN {n.format(i=i)} = 0 THEN {_EXPLORE} "
        f"ELSE {s.format(i=i)} / {n.format(i=i)} "
        f"+ sqrt(2.0 * ln(CAST({t} AS DOUBLE)) / {n.format(i=i)}) END"
        for i in range(1, 6)
    ]


def _arm_name_case(pick: str) -> str:
    arms = " ".join(
        f"WHEN {i + 1} THEN '{a}'" for i, a in enumerate(_ARMS)
    )
    return f"CASE {pick} {arms} END"


def _ucb_oracle() -> str:
    u = _ucb_exprs("r.n{i}", "r.s{i}", "s.rn")
    ulist = "[" + ", ".join(u) + "]"
    pick = f"list_indexof({ulist}, list_aggregate({ulist}, 'max'))"
    reward = ("CASE " + pick + " "
              + " ".join(f"WHEN {i} THEN s.r{i}" for i in range(1, 6))
              + " END")
    n_upd = ", ".join(
        f"r.n{i} + CASE WHEN {pick} = {i} THEN 1 ELSE 0 END" for i in range(1, 6)
    )
    s_upd = ", ".join(
        f"r.s{i} + CASE WHEN {pick} = {i} THEN {reward} ELSE 0.0 END"
        for i in range(1, 6)
    )
    cells = ", ".join(
        f"coalesce(max(CASE WHEN event_type = '{a}' THEN m END) / g.gmax, 0.0)"
        f" AS r{i}" for i, a in enumerate(_ARMS, 1)
    )
    return f"""
        WITH RECURSIVE daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS DOUBLE) / count(*) AS m
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type, CAST(ts AS DATE)
        ), g AS (SELECT max(m) AS gmax FROM daily),
        rmat AS (
            SELECT day, {cells}
            FROM daily CROSS JOIN g
            GROUP BY day, g.gmax
        ), seq AS (
            SELECT rmat.*, row_number() OVER (ORDER BY day) AS rn FROM rmat
        ), r AS (
            SELECT 0 AS rn, CAST(NULL AS DATE) AS day,
                   CAST(0 AS BIGINT) AS n1, CAST(0 AS BIGINT) AS n2,
                   CAST(0 AS BIGINT) AS n3, CAST(0 AS BIGINT) AS n4,
                   CAST(0 AS BIGINT) AS n5,
                   CAST(0.0 AS DOUBLE) AS s1, CAST(0.0 AS DOUBLE) AS s2,
                   CAST(0.0 AS DOUBLE) AS s3, CAST(0.0 AS DOUBLE) AS s4,
                   CAST(0.0 AS DOUBLE) AS s5,
                   CAST(0.0 AS DOUBLE) AS cum, CAST(NULL AS BIGINT) AS pick,
                   CAST(NULL AS DOUBLE) AS reward
            UNION ALL
            SELECT s.rn, s.day, {n_upd}, {s_upd},
                   r.cum + {reward}, {pick}, {reward}
            FROM r JOIN seq s ON s.rn = r.rn + 1
        )
        SELECT rn, day, CAST(pick AS BIGINT) AS pick,
               {_arm_name_case("pick")} AS arm,
               CAST(round(reward, 6) AS DOUBLE) AS reward,
               CAST(round(cum, 6) AS DOUBLE) AS cum_reward
        FROM r WHERE rn >= 1 ORDER BY rn
    """


@query("ucb1_policy_replay", category="ML8-bandit", oracle=_ucb_oracle())
def ucb1_policy_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit policy replayed over the daily reward matrix — the
    sequential-DECISION exemplar (the other folds carry estimates;
    this one's state drives which arm is pulled next): arms are the 5
    event_type channels, day t's reward for an arm is its normalized
    daily mean (m/gmax ∈ (0,1]), and the policy pulls
    argmax_i  s_i/n_i + sqrt(2·ln t / n_i), unplayed arms forced
    first (sentinel 1e18 → the warmup is an index-order round-robin).
    Output: the full 30-day decision walk with per-day reward and
    cumulative reward — what an offline policy-evaluation job
    computes from logged bandit data.

    Determinism: cell means are exact-integer quotients and the
    normalizer is their max, so every reward is bit-identical; the
    UCB expressions are generated from ONE Python template into both
    engines (JVM fold ≡ recursive CTE), and the argmax resolves ties
    by arm index on both (array_position/list_indexof = first match).

    Scale: the fold runs on the |days|-row reward matrix (calendar-
    bounded) after one rollup of the facts; per-key bandit replay
    over millions of keys would partition the same fold by key.
    """
    u = _ucb_exprs("acc.n{i}", "acc.s{i}", "size(acc.walk) + 1")
    ulist = "array(" + ", ".join(u) + ")"
    pick = f"array_position({ulist}, array_max({ulist}))"
    reward = ("CASE " + pick + " "
              + " ".join(f"WHEN {i} THEN z.r{i}" for i in range(1, 6))
              + " END")
    n_upd = ", ".join(
        f"acc.n{i} + CASE WHEN {pick} = {i} THEN 1 ELSE 0 END AS n{i}"
        for i in range(1, 6)
    )
    s_upd = ", ".join(
        f"acc.s{i} + CASE WHEN {pick} = {i} THEN {reward} ELSE 0.0 END AS s{i}"
        for i in range(1, 6)
    )
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        (
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    g = daily.agg(F.max("m").alias("gmax"))
    rmat = (
        daily.crossJoin(F.broadcast(g))
        .groupBy("day", "gmax")
        .agg(*[
            F.coalesce(
                F.max(F.when(F.col("event_type") == a, F.col("m")))
                / F.col("gmax"),
                F.lit(0.0),
            ).alias(f"r{i}")
            for i, a in enumerate(_ARMS, 1)
        ])
    )
    packed = rmat.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("day", "r1", "r2", "r3", "r4", "r5"))
        ).alias("series")
    )
    st0 = (
        "struct(0L AS n1, 0L AS n2, 0L AS n3, 0L AS n4, 0L AS n5, "
        "0.0D AS s1, 0.0D AS s2, 0.0D AS s3, 0.0D AS s4, 0.0D AS s5, "
        "0.0D AS cum, CAST(array() AS ARRAY<STRUCT<rn INT, day DATE, "
        "pick INT, reward DOUBLE, cum DOUBLE>>) AS walk)"
    )
    folded = packed.select(
        F.expr(
            f"""
            aggregate(
                series,
                {st0},
                (acc, z) -> struct(
                    {n_upd}, {s_upd},
                    acc.cum + {reward} AS cum,
                    array_append(acc.walk, struct(
                        CAST(size(acc.walk) + 1 AS INT) AS rn,
                        z.day AS day,
                        CAST({pick} AS INT) AS pick,
                        CAST({reward} AS DOUBLE) AS reward,
                        CAST(acc.cum + {reward} AS DOUBLE) AS cum)) AS walk)
            ).walk
            """
        ).alias("walk")
    )
    return (
        folded.select(F.explode("walk").alias("w"))
        .select(
            F.col("w.rn").cast("long").alias("rn"),
            F.col("w.day").alias("day"),
            F.col("w.pick").cast("long").alias("pick"),
            F.expr(_arm_name_case("w.pick")).alias("arm"),
            F.round("w.reward", 6).alias("reward"),
            F.round("w.cum", 6).alias("cum_reward"),
        )
        .orderBy("rn")
    )


@query(
    "isotonic_calibration_maxmin",
    category="ML8-isotonic",
    oracle="""
        WITH g AS (
            SELECT least(CAST(floor(value) AS BIGINT), 329) AS fv,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
            WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
        ), bins AS (
            SELECT CAST(fv // 11 AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS den,
                   CAST(sum(y) AS BIGINT) AS num
            FROM g GROUP BY fv // 11
        ), ranked AS (
            SELECT bin, den, num,
                   row_number() OVER (ORDER BY bin) AS r,
                   CAST(sum(num) OVER (ORDER BY bin) AS BIGINT) AS cnum,
                   CAST(sum(den) OVER (ORDER BY bin) AS BIGINT) AS cden
            FROM bins
        ), pre AS (
            SELECT r, cnum, cden FROM ranked
            UNION ALL SELECT 0, 0, 0
        ), intervals AS (
            SELECT p.r + 1 AS j, k.r AS k,
                   CAST(k.cnum - p.cnum AS DOUBLE)
                       / (k.cden - p.cden) AS a
            FROM pre p JOIN ranked k ON k.r > p.r
        ), minover AS (
            SELECT i.r AS i, iv.j, min(iv.a) AS m
            FROM ranked i
            JOIN intervals iv ON iv.j <= i.r AND iv.k >= i.r
            GROUP BY i.r, iv.j
        ), iso AS (
            SELECT i, max(m) AS iso_rate FROM minover GROUP BY i
        )
        SELECT ranked.bin,
               ranked.den AS n,
               CAST(round(CAST(ranked.num AS DOUBLE) / ranked.den, 6)
                    AS DOUBLE) AS obs_rate,
               CAST(round(iso.iso_rate, 6) AS DOUBLE) AS iso_rate
        FROM ranked JOIN iso ON iso.i = ranked.r
        ORDER BY ranked.bin
    """,
)
def isotonic_calibration_maxmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of the pseudo-probability score against
    the purchase label, computed by the MINIMAX formula
    ŷ_i = max_{j≤i} min_{k≥i} avg(y over bins j..k) — exactly the
    pool-adjacent-violators solution, but as three joins over the
    interval-average table instead of a sequential merge stack (PAV's
    while-loop doesn't fold; the minimax form is pure relational
    algebra on the BINNED frame, the standard trick for distributed
    isotonic).

    Determinism: interval averages are exact-integer ratios from
    prefix sums ((cnum_k−cnum_{j−1})/(cden_k−cden_{j−1})), so every
    min/max comparison sees bit-identical doubles.

    Scale: facts collapse to B=30 score bins in one hash aggregate;
    the O(B³) minimax join runs on that bounded frame (4.5k interval
    rows) — B stays fixed as data grows, so the expensive step is
    scale-free. The monotone fit is the per-bin calibration map a
    serving layer would range-join scores against.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    )
    fv = F.least(F.floor("value").cast("long"), F.lit(329))
    bins = (
        ev.select(
            F.floor(fv / 11).cast("long").alias("bin"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("den"),
            F.sum("y").cast("long").alias("num"),
        )
    )
    wo = Window.orderBy("bin")
    ranked = bins.select(
        "bin", "den", "num",
        F.row_number().over(wo).alias("r"),
        F.sum("num").over(wo).cast("long").alias("cnum"),
        F.sum("den").over(wo).cast("long").alias("cden"),
    ).localCheckpoint()  # 4 consumers (pre/kside/iside/final) — cut the
    # lineage so the B-row binned frame scans+aggregates the facts ONCE
    pre = ranked.select("r", "cnum", "cden").unionAll(
        ranked.sparkSession.range(1).select(
            F.lit(0).cast("int").alias("r"),
            F.lit(0).cast("long").alias("cnum"),
            F.lit(0).cast("long").alias("cden"),
        )
    )
    kside = ranked.select(
        F.col("r").alias("k"), F.col("cnum").alias("knum"),
        F.col("cden").alias("kden"),
    )
    intervals = (
        pre.join(F.broadcast(kside), F.col("k") > F.col("r"))
        .select(
            (F.col("r") + 1).alias("j"), "k",
            (
                (F.col("knum") - F.col("cnum")).cast("double")
                / (F.col("kden") - F.col("cden"))
            ).alias("a"),
        )
    )
    iside = ranked.select(F.col("r").alias("i"))
    minover = (
        iside.join(
            F.broadcast(intervals),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("a").alias("m"))
    )
    iso = minover.groupBy("i").agg(F.max("m").alias("iso_rate"))
    return (
        ranked.join(F.broadcast(iso), ranked.r == iso.i)
        .select(
            "bin",
            F.col("den").alias("n"),
            F.round(F.col("num").cast("double") / F.col("den"), 6)
            .alias("obs_rate"),
            F.round("iso_rate", 6).alias("iso_rate"),
        )
    )


_RIDGE_ALPHA = "0.1"

# correlation helper: rho(u,v) in the n·Σuv − ΣuΣv closed form, all
# operands exact integers cast to DOUBLE (identical on both engines)
def _rho(pu_v: str, su: str, sv: str, qu: str, qv: str) -> str:
    return (
        f"(CAST(n AS DOUBLE) * {pu_v} - CAST({su} AS DOUBLE) * {sv})"
        f" / sqrt((CAST(n AS DOUBLE) * {qu} - CAST({su} AS DOUBLE) * {su})"
        f" * (CAST(n AS DOUBLE) * {qv} - CAST({sv} AS DOUBLE) * {sv}))"
    )


@query(
    "ridge_regression_closed_form",
    category="ML8-ridge",
    oracle=f"""
        WITH feat AS (
            SELECT CAST(hour(ts) AS BIGINT) AS x1,
                   CAST(dayofweek(ts) AS BIGINT) AS x2,
                   CAST(day(ts) AS BIGINT) AS x3,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
            FROM events WHERE value IS NOT NULL
        ), mom AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
                   CAST(sum(x3) AS BIGINT) AS s3, CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x1*x1) AS BIGINT) AS q1,
                   CAST(sum(x2*x2) AS BIGINT) AS q2,
                   CAST(sum(x3*x3) AS BIGINT) AS q3,
                   CAST(sum(y*y) AS BIGINT) AS qy,
                   CAST(sum(x1*x2) AS BIGINT) AS p12,
                   CAST(sum(x1*x3) AS BIGINT) AS p13,
                   CAST(sum(x2*x3) AS BIGINT) AS p23,
                   CAST(sum(x1*y) AS BIGINT) AS p1y,
                   CAST(sum(x2*y) AS BIGINT) AS p2y,
                   CAST(sum(x3*y) AS BIGINT) AS p3y
            FROM feat
        ), corr AS (
            SELECT {_rho("p12", "s1", "s2", "q1", "q2")} AS d,
                   {_rho("p13", "s1", "s3", "q1", "q3")} AS e,
                   {_rho("p23", "s2", "s3", "q2", "q3")} AS f,
                   {_rho("p1y", "s1", "sy", "q1", "qy")} AS r1,
                   {_rho("p2y", "s2", "sy", "q2", "qy")} AS r2y,
                   {_rho("p3y", "s3", "sy", "q3", "qy")} AS r3,
                   1.0 + {_RIDGE_ALPHA} AS a
            FROM mom
        ), solved AS (
            SELECT
                a * (a * a - f * f) - d * (d * a - f * e)
                    + e * (d * f - a * e) AS det,
                (a * a - f * f) * r1 + (e * f - d * a) * r2y
                    + (d * f - a * e) * r3 AS n1,
                (e * f - d * a) * r1 + (a * a - e * e) * r2y
                    + (d * e - a * f) * r3 AS n2,
                (d * f - a * e) * r1 + (d * e - a * f) * r2y
                    + (a * a - d * d) * r3 AS n3,
                r1, r2y, r3
            FROM corr
        ), betas AS (
            SELECT 'hour' AS feature, n1 / det AS beta,
                   (n1 * r1 + n2 * r2y + n3 * r3) / det AS rr
            FROM solved
            UNION ALL SELECT 'dow', n2 / det,
                   (n1 * r1 + n2 * r2y + n3 * r3) / det FROM solved
            UNION ALL SELECT 'dom', n3 / det,
                   (n1 * r1 + n2 * r2y + n3 * r3) / det FROM solved
        )
        SELECT feature,
               CAST(round(beta, 6) AS DOUBLE) AS beta_std,
               CAST(round(rr, 6) AS DOUBLE) AS r2_ridge
        FROM betas ORDER BY feature
    """,
)
def ridge_regression_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (α=0.1) of the metric on the (hour, dow,
    day-of-month) calendar features, solved in CLOSED FORM on the
    standardized scale: (R + αI)·β = r with R the 3×3 feature
    correlation matrix and r the feature-target correlations, β via
    the symmetric-3×3 adjugate; r²_ridge = βᵀr. The shrinkage-fit
    exemplar: training a regularized linear model is two aggregates
    and a 1-row matrix solve — no gradient loop, no Python.

    Determinism: all 15 moments are exact integer sums; every
    correlation, cofactor, determinant, and β is a fixed double
    expression over them — bit-identical across engines.

    Scale: one map-side-combinable moment aggregate over the facts,
    then 1-row algebra — identical cost at any data size; for p
    features the same plan carries p(p+3)/2 moments.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    feat = ev.select(
        F.hour("ts").cast("long").alias("x1"),
        F.dayofweek("ts").cast("long").alias("x2"),
        F.dayofmonth("ts").cast("long").alias("x3"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("y"),
    )
    mom = feat.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.sum(c).cast("long").alias(f"s{c[1:]}" if c != "y" else "sy")
          for c in ("x1", "x2", "x3", "y")],
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("q1"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("q2"),
        F.sum(F.col("x3") * F.col("x3")).cast("long").alias("q3"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("qy"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("p12"),
        F.sum(F.col("x1") * F.col("x3")).cast("long").alias("p13"),
        F.sum(F.col("x2") * F.col("x3")).cast("long").alias("p23"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("p1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("p2y"),
        F.sum(F.col("x3") * F.col("y")).cast("long").alias("p3y"),
    )
    corr = mom.selectExpr(
        _rho("p12", "s1", "s2", "q1", "q2") + " AS d",
        _rho("p13", "s1", "s3", "q1", "q3") + " AS e",
        _rho("p23", "s2", "s3", "q2", "q3") + " AS f",
        _rho("p1y", "s1", "sy", "q1", "qy") + " AS r1",
        _rho("p2y", "s2", "sy", "q2", "qy") + " AS r2y",
        _rho("p3y", "s3", "sy", "q3", "qy") + " AS r3",
        f"1.0 + {_RIDGE_ALPHA} AS a",
    )
    a, d, e, f_, r1, r2y, r3 = (
        F.col("a"), F.col("d"), F.col("e"), F.col("f"),
        F.col("r1"), F.col("r2y"), F.col("r3"),
    )
    det = a * (a * a - f_ * f_) - d * (d * a - f_ * e) + e * (d * f_ - a * e)
    n1 = (a * a - f_ * f_) * r1 + (e * f_ - d * a) * r2y + (d * f_ - a * e) * r3
    n2 = (e * f_ - d * a) * r1 + (a * a - e * e) * r2y + (d * e - a * f_) * r3
    n3 = (d * f_ - a * e) * r1 + (d * e - a * f_) * r2y + (a * a - d * d) * r3
    solved = corr.select(
        det.alias("det"), n1.alias("n1"), n2.alias("n2"), n3.alias("n3"),
        "r1", "r2y", "r3",
    )
    rr = (
        F.col("n1") * F.col("r1")
        + F.col("n2") * F.col("r2y")
        + F.col("n3") * F.col("r3")
    ) / F.col("det")
    # explode a literal struct array instead of unionAll(solved × 3):
    # a union re-plans (and re-scans) the moment aggregate per branch,
    # while explode keeps the whole fit at ONE fact scan
    betas = solved.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("hour").alias("feature"),
                    (F.col("n1") / F.col("det")).alias("beta"),
                ),
                F.struct(
                    F.lit("dow").alias("feature"),
                    (F.col("n2") / F.col("det")).alias("beta"),
                ),
                F.struct(
                    F.lit("dom").alias("feature"),
                    (F.col("n3") / F.col("det")).alias("beta"),
                ),
            )
        ).alias("fb"),
        rr.alias("rr"),
    ).select("fb.feature", "fb.beta", "rr")
    return betas.select(
        "feature",
        F.round("beta", 6).alias("beta_std"),
        F.round("rr", 6).alias("r2_ridge"),
    ).orderBy("feature")
