"""M0 core queries — the nine baseline-validated shapes (BASELINE.md).

These span the §2 categories: hash aggregate (A1), top-k under total
order (O2), multiway join (J2), window top-k (W2), sessionization (W8),
tumbling window (T1 batch analog), JSON extraction (§2.8), exact knn
(L3), exact dedup (L1). Each was validated Spark-vs-DuckDB during the
survey session (SURVEY.md tag [M]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import exact_money_sum
from ..registry import query


@query(
    "agg_pricing_summary",
    category="A1",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity)                                          AS sum_qty,
               sum(l_extendedprice)                                     AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount))                  AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))    AS sum_charge,
               avg(l_quantity)                                          AS avg_qty,
               avg(l_extendedprice)                                     AS avg_price,
               avg(l_discount)                                          AS avg_disc,
               count(*)                                                 AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: two-key hash aggregate with 8 aggregates.

    Scale: partial (map-side) + final HashAggregate, no sort until the
    tiny 6-row result — the shuffle moves only per-group partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )  # no ORDER BY: parity hash is order-insensitive (json_extract
    # precedent); the final sort of 6 rows cost a rangepartitioning
    # Exchange + an extra AQE stage every run


@query(
    "topk_orders_by_revenue",
    category="O2",
    oracle="""
        SELECT l_orderkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
                   / 10000.0 AS revenue,
               o_orderdate
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def topk_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + total-order top-k.

    Scale: customer is the small side (auto-broadcast); limit under a
    TOTAL order (revenue DESC, l_orderkey tiebreak) so the physical
    plan is TakeOrderedAndProject — no global sort materialization.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(exact_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "join_multiway_tpch_q5",
    category="J2",
    oracle="""
        SELECT n_name,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
                   / 10000.0 AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
)
def join_multiway_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join, local-supplier condition, agg.

    Scale: dims (region/nation/supplier/customer) broadcast; only
    orders⋈lineitem shuffles on orderkey. AQE converts residual SMJs
    to broadcast at runtime when the filtered side is small.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # Fact-first join order (guide §3.1): lineitem is the stream side of
    # every join, so the fact table is never a broadcast BUILD side. The
    # pre-r10 order (c⋈o⋈li) let Catalyst broadcast LINEITEM itself at
    # bench scale (10.8 MB scan → driver collect + hash build of 600k
    # rows, the single most expensive step of the query); with li on the
    # left, the small sides (filtered orders, customer, dims) broadcast
    # and lineitem is only scanned. At cluster scale the same order
    # degrades to the canonical plan: li⋈o sort-merge on orderkey, then
    # the (much smaller) joined result shuffles on custkey.
    # No ORDER BY: the driver's parity hash is order-insensitive
    # (sorted canonicalized rows — json_extract_props precedent, r1);
    # the final sort cost a rangepartitioning Exchange for 25 rows.
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(exact_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "window_top3_per_user",
    category="W2",
    oracle="""
        SELECT user_id, event_id, event_type, value, rn
        FROM (
            SELECT user_id, event_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rn
            FROM events
        )
        WHERE rn <= 3
    """,
)
def window_top3_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window (event_id tiebreak = determinism).

    Scale: single hash-shuffle on user_id then per-partition sort; no
    global sort. Skewed users are the risk at 100 TB — AQE skew-join
    doesn't apply to windows, so extreme skew would call for two-phase
    top-k (partial per-partition top-k then final), see operators.topk.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.select("user_id", "event_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "sessionize_gap30m_batch",
    category="W8",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessioned AS (
            SELECT user_id, ts,
                   -- CAST: DuckDB window sum(INT) yields HUGEINT, which the
                   -- driver canonicalizer renders as float64 (hash red vs
                   -- Spark's int64). BIGINT on both sides.
                   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts)  AS session_start,
               max(ts)  AS session_end
        FROM sessioned
        GROUP BY user_id, session_id
    """,
)
def sessionize_gap30m_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-min-gap lag flag + running sum = session id.

    Scale: one shuffle on user_id serves both windows (same partitioning);
    the groupBy(user_id, session_id) reuses it — Catalyst removes the
    second exchange. Gap semantics match streaming session_window (T3).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000  # strict '>' matches the oracle interval compare
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "tumbling_1h_agg",
    category="T1",
    oracle="""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
               event_type,
               count(*)   AS n_events,
               sum(value) AS sum_value
        FROM events
        GROUP BY bucket_start, event_type
    """,
)
def tumbling_1h_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window aggregate (batch analog of streaming T1).

    Same plan-builder works on a streaming DataFrame (groupBy(window)
    is the streaming tumbling agg); oracle = DuckDB time_bucket,
    verified equal during survey [M].
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "json_extract_props",
    category="F-json",
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
               count(*)   AS n_events,
               sum(value) AS sum_value
        FROM events
        WHERE CAST(json_extract(props, '$.k') AS INTEGER) < 20
        GROUP BY k
        ORDER BY k
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the dynamic event payload (§2.8 JSON).

    get_json_object runs JVM-side (codegen'd Jayway path) — no Python
    UDF in the hot path. At scale prefer promoting hot JSON fields to
    typed columns once at ingest (pipeline op `json`).
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(k.alias("k"), "value")
        .filter(F.col("k") < 20)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )  # no ORDER BY: the parity hash is order-insensitive; a global
    # sort would add a range-partition exchange for nothing


@query(
    "knn_cosine_topk",
    category="L3",
    oracle="""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id AS vec_id,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY cos_sim DESC, vec_id
        LIMIT 5
    """,
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k against one query vector (L3 baseline).

    Vector math stays JVM-side: zip_with/aggregate higher-order
    functions over array<double>; floats cast to double first for
    oracle parity (SURVEY §1.3). Scale: broadcast the single query
    vector — a scan + TakeOrderedAndProject, embarrassingly parallel.
    L4 (LSH buckets) is the path when the query side is also large.
    """
    from ..functions.vectors import cosine_similarity, to_double_array

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("vec")
    )
    qvec = emb.filter(F.col("vec_id") == 0).select(F.col("vec").alias("qvec"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qvec))
        .select(
            "vec_id",
            cosine_similarity(F.col("vec"), F.col("qvec")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(5)
    )


@query(
    "dedup_exact_distinct",
    category="L1",
    oracle="""
        SELECT count(*)                 AS n_docs,
               count(DISTINCT md5(text)) AS n_unique,
               count(*) - count(DISTINCT md5(text)) AS n_dupes
        FROM documents
    """,
)
def dedup_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup accounting over the document corpus (L1).

    md5 fingerprint → distinct count; the removal variant is
    operators.dedup.drop_exact_duplicates (row_number()=1 keeps a
    deterministic winner). Scale: two-phase distinct aggregation,
    content hash computed map-side so only 16-byte digests shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.col("text").cast("binary"))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct(fp)).alias("n_dupes"),
    )


@query(
    "tpch_q13_custdist",
    category="J3-q13",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution. A left
    outer join with a join-side (not WHERE) predicate — customers
    whose every order is filtered out must survive with c_count=0 —
    then a second aggregation over the first's output. Scale: both
    aggs hash-partition on their single key; the outer join shuffles
    on custkey and AQE coalesces the tiny second-agg exchange.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q17_small_quantity",
    category="J2-q17",
    oracle="""
        SELECT sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0
                   AS small_qty_revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN (
            SELECT l_partkey AS a_partkey,
                   0.5 * avg(l_quantity) AS qty_threshold
            FROM lineitem
            GROUP BY l_partkey
        ) ON a_partkey = l_partkey
        WHERE p_brand = 'Brand#11' AND p_size < 15
          AND l_quantity < qty_threshold
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one
    brand's small parts — the correlated-average pattern
    (l_quantity < 0.5 * per-part mean) decorrelated into an explicit
    per-part aggregate joined back. Scale: the per-part avg shuffles
    once on partkey and is then co-partitioned with the fact join;
    the part dim filter broadcasts. avg(l_quantity) is exact
    cross-engine: quantities are small integers-as-doubles, a single
    partial-sum tree per partkey group.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    thresholds = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_threshold")
    )
    dim = p.filter((F.col("p_brand") == "Brand#11") & (F.col("p_size") < 15))
    return (
        li.join(F.broadcast(dim), li.l_partkey == dim.p_partkey)
        .join(thresholds, li.l_partkey == thresholds.a_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            exact_money_sum(F.col("l_extendedprice"), 100).alias(
                "small_qty_revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q22_idle_accounts",
    category="J5-q22",
    oracle="""
        WITH thresh AS (
            SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) * 1.0
                       / (count(*) * 100.0) AS avg_bal
            FROM customer
            WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey,
               count(*) AS numcust,
               sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0
                   AS totacctbal
        FROM customer, thresh
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
          )
        GROUP BY c_nationkey
    """,
)
def tpch_q22_idle_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-idle accounts per nation — an
    uncorrelated scalar aggregate used as a filter threshold plus an
    anti join (customers with no urgent orders; every customer here
    has SOME order, so the classic no-orders predicate adapts to
    priority). The threshold is computed as exact integer cents
    divided once, so the comparison boundary is bit-identical in both
    engines (a raw double avg drifts with accumulation order). Scale:
    the scalar is one tiny broadcast; the anti join shuffles on
    custkey only for the filtered (above-threshold) minority.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    thresh = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(cents) * 1.0 / (F.count(F.lit(1)) * 100.0)).alias("avg_bal")
        )
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    rich = c.join(F.broadcast(thresh)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    return (
        rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact_money_sum(F.col("c_acctbal"), 100).alias("totacctbal"),
        )
    )


@query(
    "session_stats_summary",
    category="W8-stats",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessioned AS (
            SELECT user_id, ts,
                   CAST(sum(new_sess) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS BIGINT) AS session_id
            FROM flagged
        ), sessions AS (
            SELECT user_id, session_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT)
                       // 1000000 AS dur_s
            FROM sessioned GROUP BY user_id, session_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_sessions,
               round(avg(n_events), 6) AS avg_events,
               round(count(CASE WHEN n_events = 1 THEN 1 END) * 1.0
                     / count(*), 6) AS bounce_rate,
               CAST(quantile_disc(dur_s, 0.5) AS BIGINT) AS p50_dur_s,
               CAST(quantile_disc(dur_s, 0.9) AS BIGINT) AS p90_dur_s
        FROM sessions
    """,
)
def session_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session QUALITY rollup on top of gap-30m sessionization: session
    count, mean events/session, bounce rate (single-event sessions),
    and p50/p90 session duration — the product-analytics dashboard
    row derived from the W8 construction (same two windows over ONE
    user_id exchange, then a tiny global summary).

    Scale: identical to sessionize_gap30m_batch until the session
    frame (which is |sessions|-sized, already aggregated); the final
    percentiles sort only that frame. Durations integral seconds via
    `div`; the discrete percentile picks an actual element
    (percentile_disc ↔ quantile_disc, conventions).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    sessioned = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(new_sess).over(w).cast("long").alias("session_id"),
    )
    sessions = sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000").alias(
            "dur_s"
        ),
    )
    return sessions.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events"),
        F.round(
            F.count(F.when(F.col("n_events") == 1, 1)) / F.count(F.lit(1)), 6
        ).alias("bounce_rate"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dur_s)")
        .cast("long")
        .alias("p50_dur_s"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY dur_s)")
        .cast("long")
        .alias("p90_dur_s"),
    )
