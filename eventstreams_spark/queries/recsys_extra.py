"""Recommender-system evaluation: an item-item co-occurrence
recommender built on the TPC-H purchase bipartite graph (customer ×
part through orders), evaluated by the held-out MRR@10 / hit-rate
protocol — the leave-last-orders-out loop every CF system ships with.

Float discipline: co-occurrence weights and ranks are exact integers;
reciprocal-rank credits are scaled by 2520 = lcm(1..10) so MRR is one
integer quotient — no float sum of 1/rank anywhere.

Scale: pair generation is item-item over the PART dimension (never
user×user); each item's co-occurrence list is capped at its top-64
neighbors IN-PLAN (the df-cap discipline, mirrored in the oracle),
so candidate scoring is ≤64 rows per train item at any catalog size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# split: first ceil(0.8k) of each customer's orders (by date, key)
# train the model, the rest are held out
_SPLIT_CTE = """
    co AS (
        SELECT o_orderkey, o_custkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY o_custkey) AS k
        FROM orders
    ), inter AS (
        SELECT DISTINCT c.o_custkey AS cust, l.l_partkey AS part,
               c.rn <= (8 * c.k + 9) // 10 AS is_train
        FROM co c JOIN lineitem l ON l.l_orderkey = c.o_orderkey
    ), train AS (
        SELECT DISTINCT cust, part FROM inter WHERE is_train
    ), test AS (
        SELECT DISTINCT i.cust, i.part
        FROM inter i
        WHERE NOT i.is_train
          AND NOT EXISTS (SELECT 1 FROM train t
                          WHERE t.cust = i.cust AND t.part = i.part)
    )"""


@query(
    "recsys_mrr_at_10",
    category="RS-mrr",
    oracle=f"""
        WITH {_SPLIT_CTE}, cooc_full AS (
            SELECT a.part AS pa, b.part AS pb,
                   CAST(count(*) AS BIGINT) AS w
            FROM train a JOIN train b
              ON a.cust = b.cust AND a.part <> b.part
            GROUP BY a.part, b.part
        ), cooc AS (
            SELECT pa, pb, w FROM (
                SELECT pa, pb, w,
                       row_number() OVER (PARTITION BY pa
                                          ORDER BY w DESC, pb) AS nr
                FROM cooc_full) capped
            WHERE nr <= 64
        ), scores AS (
            SELECT t.cust, c.pb AS cand,
                   CAST(sum(c.w) AS BIGINT) AS score
            FROM train t JOIN cooc c ON c.pa = t.part
            GROUP BY t.cust, c.pb
        ), fresh AS (
            SELECT s.cust, s.cand, s.score
            FROM scores s
            WHERE NOT EXISTS (SELECT 1 FROM train t
                              WHERE t.cust = s.cust AND t.part = s.cand)
        ), ranked AS (
            SELECT cust, cand,
                   CAST(row_number() OVER (PARTITION BY cust
                                           ORDER BY score DESC, cand)
                        AS BIGINT) AS rk
            FROM fresh
        ), hits AS (
            SELECT e.cust, e.part, r.rk
            FROM test e LEFT JOIN ranked r
              ON r.cust = e.cust AND r.cand = e.part AND r.rk <= 10
        )
        SELECT CAST(count(*) AS BIGINT) AS n_test_items,
               CAST(count(DISTINCT cust) AS BIGINT) AS n_users,
               CAST(sum(CASE WHEN rk IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS hits_at_10,
               CAST(round(CAST(sum(CASE WHEN rk IS NOT NULL THEN 1 ELSE 0
                                        END) AS DOUBLE) / count(*), 6)
                    AS DOUBLE) AS hit_rate,
               CAST(round(CAST(sum(CASE WHEN rk IS NOT NULL
                                        THEN 2520 // rk ELSE 0 END)
                               AS DOUBLE) / (2520.0 * count(*)), 6)
                    AS DOUBLE) AS mrr_at_10
        FROM hits
    """,
)
def recsys_mrr_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering evaluation: train a
    co-occurrence recommender on the first 80% of each customer's
    orders (shared-customer counts between parts), recommend the
    top-10 unseen parts per customer (score = Σ co-occurrence with
    the customer's training parts, ties broken by part id), and score
    the held-out orders by hit-rate@10 and MRR@10 — the
    leave-last-out protocol that turns "we built a recommender" into
    a number.

    Determinism: weights, scores, and ranks are exact integers under
    total orders; reciprocal-rank credit is the INTEGER 2520//rank
    (2520 = lcm 1..10), so MRR is one division.

    Scale: the co-occurrence self-join is item-item through the
    customer key (Σ basket² work, never user×user); each item's
    neighbor list is then CAPPED at its top-64 co-occurrences
    (w DESC, part id — deterministic), so candidate scoring is
    ≤ 64 rows per (user, train item) at any catalog size; top-10 is
    a per-user WindowGroupLimit. The cap is applied identically in
    the DuckDB oracle — the metric is the capped-model's MRR, which
    is the model a production CF system actually serves.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w_ord = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    co = orders.select(
        "o_orderkey", "o_custkey",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("k"),
    )
    # inter/train feed 2 and 4 downstream consumers — persist so the
    # orders x lineitem lineage is derived once, not per consumer
    # (the kcore/louvain cached-frame discipline)
    inter = (
        co.join(li, co["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
            (F.col("rn") <= F.expr("(8 * k + 9) DIV 10")).alias("is_train"),
        )
        .distinct()
        .persist()
    )
    train = inter.filter("is_train").select("cust", "part").distinct().persist()
    test = (
        inter.filter(~F.col("is_train"))
        .select("cust", "part")
        .distinct()
        .join(train, ["cust", "part"], "left_anti")
    )
    a = train.alias("a")
    b = train.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.part") != F.col("b.part")),
        )
        .groupBy(F.col("a.part").alias("pa"), F.col("b.part").alias("pb"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    # top-M neighbor cap (M=64, ties by part id): the df-cap
    # discipline IN-PLAN, not prose — it bounds the scoring join's
    # fan-out to 64 rows per train item, so the (cust, cand) partial
    # aggregate is O(|train| * 64) at ANY catalog size. The uncapped
    # scoring join is |train| x full co-occurrence lists — quadratic
    # in basket overlap; the r10-open driver sim watched it OOM the
    # vanilla session's default 1g heap mid-spill-merge. The oracle
    # applies the identical cap (cooc CTE), so the metric stays
    # hash-checked.
    w_cap = Window.partitionBy("pa").orderBy(F.desc("w"), "pb")
    cooc = (
        cooc.select(
            "pa", "pb", "w", F.row_number().over(w_cap).alias("nr")
        )
        .filter(F.col("nr") <= 64)
        .drop("nr")
    )
    scores = (
        train.join(cooc, train["part"] == cooc["pa"])
        .groupBy("cust", F.col("pb").alias("cand"))
        .agg(F.sum("w").cast("long").alias("score"))
    )
    fresh = scores.join(
        train.select("cust", F.col("part").alias("cand")),
        ["cust", "cand"],
        "left_anti",
    )
    ranked = fresh.select(
        "cust", "cand",
        F.row_number()
        .over(Window.partitionBy("cust").orderBy(F.desc("score"), "cand"))
        .cast("long")
        .alias("rk"),
    ).filter(F.col("rk") <= 10)
    hits = test.join(
        ranked,
        (test["cust"] == ranked["cust"]) & (test["part"] == ranked["cand"]),
        "left",
    ).select(test["cust"].alias("tcust"), test["part"], "rk")
    hit = F.when(F.col("rk").isNotNull(), 1).otherwise(0)
    return hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_test_items"),
        F.countDistinct("tcust").cast("long").alias("n_users"),
        F.sum(hit).cast("long").alias("hits_at_10"),
        F.round(F.sum(hit).cast("double") / F.count(F.lit(1)), 6).alias(
            "hit_rate"
        ),
        F.round(
            F.sum(
                F.when(
                    F.col("rk").isNotNull(), F.expr("2520 DIV rk")
                ).otherwise(0)
            ).cast("double")
            / (2520.0 * F.count(F.lit(1))),
            6,
        ).alias("mrr_at_10"),
    )
