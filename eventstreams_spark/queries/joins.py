"""J-series: join operators (SURVEY §2.4).

Scale discipline: every dim-side join here broadcasts explicitly;
fact-fact joins shuffle on their equi keys and lean on AQE for skew.
Non-equi shapes (theta, range, as-of) document their 100 TB strategy
in the docstring since Catalyst's default (BroadcastNestedLoopJoin)
only works when one side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import exact_money_sum
from ..registry import query


@query(
    "join_broadcast_enrich",
    category="J1",
    oracle="""
        SELECT c_mktsegment AS segment, event_type,
               count(*) AS n_events,
               sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) / 10000.0 AS sum_value
        FROM events
        JOIN customer ON user_id = c_custkey
        GROUP BY segment, event_type
    """,
)
def join_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrichment join (Logstash translate/elasticsearch filter class).

    The dim side broadcasts — zero shuffle on the event stream; the
    canonical 100 TB enrichment pattern (dim ≤ a few hundred MB).
    """
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_money_sum(F.col("value")).alias("sum_value"),
        )
    )


@query(
    "join_outer_orders_customers",
    category="J3",
    oracle="""
        SELECT c_custkey, c_name,
               count(o_orderkey) AS n_orders,
               coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 0) / 100.0
                   AS total_spend
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
)
def join_outer_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (n_orders=0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    scaled = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (F.coalesce(F.sum(scaled), F.lit(0)) / 100.0).alias("total_spend"),
        )
    )


@query(
    "join_semi",
    category="J4",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 pending order (EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    category="J5",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no pending order (NOT EXISTS).

    Filtered to 'P' status so the result is non-empty at every sf —
    the exact complement of join_semi.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_theta_value_band",
    category="J6",
    oracle="""
        SELECT b.band, count(*) AS n_events,
               sum(CAST(floor(e.value * 10000 + 0.5) AS BIGINT)) / 10000.0 AS sum_value
        FROM events e
        JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1e9))
             AS b(band, lo, hi)
          ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.band
    """,
)
def join_theta_value_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join against a banding table.

    Physical plan: BroadcastNestedLoopJoin — fine because the band
    side is 3 rows; a large-large theta join must instead bucketize
    the range key into an equi key (see join_range strategy).
    """
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        ev.join(F.broadcast(bands), (ev.value >= bands.lo) & (ev.value < bands.hi))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_money_sum(F.col("value")).alias("sum_value"),
        )
    )


@query(
    "join_range_events_in_order_window",
    category="J8",
    oracle="""
        SELECT e1.event_id, count(e2.event_id) AS n_clicks_10m
        FROM events e1
        LEFT JOIN events e2
          ON e1.user_id = e2.user_id
         AND e2.event_type = 'click'
         AND e2.ts >= e1.ts - INTERVAL '10 minutes'
         AND e2.ts < e1.ts
        WHERE e1.event_type = 'error'
        GROUP BY e1.event_id
    """,
)
def join_range_events_in_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks within the 10 minutes before each error.

    Equi key (user_id) + time-range residual → shuffle hash join on
    user_id with the range as a post-filter: correct and shuffle-
    minimal. At 100 TB add a coarse time-bucket equi key on both
    sides (bucket + bucket-1) so state per join task stays bounded
    even for hot users.
    """
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("event_id"), F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    cond = (
        (F.col("e_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") < F.col("e_ts"))
    )
    return (
        errors.join(clicks, cond, "left")
        .groupBy("event_id")
        .agg(F.count("c_id").alias("n_clicks_10m"))
    )


@query(
    "join_asof_last_event_before_order",
    category="J9",
    oracle="""
        SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
               (SELECT max(c.ts) FROM events c
                WHERE c.user_id = p.user_id
                  AND c.event_type = 'click'
                  AND c.ts < p.ts) AS last_click_ts
        FROM events p
        WHERE p.event_type = 'purchase'
    """,
)
def join_asof_last_event_before_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: last click strictly before each purchase (J9).

    Spark has no native as-of; this is the scalable composite: union-
    tag both sides, one window over (user_id, ts) carrying forward the
    last click timestamp, then keep purchase rows. O(n log n) with a
    single shuffle on user_id — no per-key cross product, unlike the
    naive join+row_number shape. The sort key (ts, kind) with
    purchases BEFORE clicks at equal ts enforces the strict '<'.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(0).alias("kind")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(1).alias("kind")
    )
    tagged = purchases.unionAll(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.last(
        F.when(F.col("kind") == 1, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("last_click_ts", last_click)
        .filter(F.col("kind") == 0)
        .select("event_id", "user_id", F.col("ts").alias("purchase_ts"), "last_click_ts")
    )


@query(
    "supplier_return_rate_by_nation",
    category="J1-supplier",
    oracle="""
        SELECT n.n_name AS nation,
               count(*) AS n_lines,
               count(CASE WHEN l.l_returnflag = 'R' THEN 1 END)
                   AS n_returned,
               round(count(CASE WHEN l.l_returnflag = 'R' THEN 1 END)
                     * 1.0 / count(*), 6) AS return_rate,
               CAST(sum(CASE WHEN l.l_returnflag = 'R'
                             THEN CAST(round(l.l_extendedprice * 100)
                                       AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS returned_cents
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY nation
    """,
)
def supplier_return_rate_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier quality scorecard: return rate and returned value per
    supplier nation — the ops-dashboard cut of the returns data
    (TPC-H Q10 looks at customers; this is the supply side). Pure J1
    broadcast-enrichment chain + one conditional census; money in
    integral cents.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    dim = F.broadcast(
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
            "s_suppkey", F.col("n_name").alias("nation")
        )
    )
    ret = F.col("l_returnflag") == "R"
    return (
        li.join(dim, li["l_suppkey"] == dim["s_suppkey"])
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(ret, 1)).alias("n_returned"),
            F.round(F.count(F.when(ret, 1)) / F.count(F.lit(1)), 6).alias(
                "return_rate"
            ),
            F.sum(
                F.when(
                    ret, F.round(F.col("l_extendedprice") * 100).cast("long")
                ).otherwise(0)
            )
            .cast("long")
            .alias("returned_cents"),
        )
    )


def _bloom_oracle() -> str:
    from ._shared import md5_uniform_sql

    def pos(expr: str, i: int) -> str:
        u = md5_uniform_sql(f"concat('bloom{i}|', cast({expr} as varchar))")
        return f"CAST(floor({u} * 65536.0) AS BIGINT)"

    return f"""
        WITH keys AS (
            SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        ), pos AS (
            SELECT DISTINCT p FROM (
                SELECT {pos('k', 0)} AS p FROM keys
                UNION ALL SELECT {pos('k', 1)} FROM keys
                UNION ALL SELECT {pos('k', 2)} FROM keys
            )
        ), flags AS (
            SELECT o_orderkey,
                   ({pos('o_custkey', 0)} IN (SELECT p FROM pos)
                    AND {pos('o_custkey', 1)} IN (SELECT p FROM pos)
                    AND {pos('o_custkey', 2)} IN (SELECT p FROM pos)) AS is_cand,
                   o_custkey IN (SELECT k FROM keys) AS is_true
            FROM orders
        )
        SELECT count(*) AS n_total,
               CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
               CAST(sum(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_candidates,
               CAST(sum(CASE WHEN is_true AND NOT is_cand THEN 1 ELSE 0 END)
                    AS BIGINT) = 0 AS no_false_negatives,
               sum(CASE WHEN is_cand AND NOT is_true THEN 1 ELSE 0 END)
                   <= 0.05 * sum(CASE WHEN NOT is_true THEN 1 ELSE 0 END)
                   AS fp_rate_ok
        FROM flags
    """


@query("bloom_prefilter_semi_join", category="J13-runtime-filter", oracle=_bloom_oracle())
def bloom_prefilter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime prefilter for a selective semi join — the
    shape behind Spark's own runtime row-group filtering and every
    100 TB "build a filter from the dim side, prune the fact scan
    before the shuffle" optimization, made explicit and hash-checked:
    BUILDING-segment customer keys are hashed into a 65536-slot / 3-
    probe Bloom position set; each order tests its 3 probe positions
    against the set (three BROADCAST left joins — the entire probe is
    map-side, no fact shuffle) and only candidates would proceed to
    the real join. One aggregate certifies the contract: zero false
    negatives (structural for a Bloom filter, audited anyway) and
    false-positive rate ≤ 5%.

    Cross-engine exactness: probe positions are minted from the md5
    positional-digit uniform (functions/sampling.py::md5_uniform — the
    repo's proven-identical mint), so BOTH engines build the identical
    position set and n_candidates is hash-checked EXACTLY, not gated.

    Scale: the position set is ≤ 65536 rows (here ~3·|keys|),
    broadcast; the fact side never shuffles — flags fold in ONE
    combinable aggregate. At larger key counts, size m from an
    upstream approx_count_distinct (fill ≤ ~25% keeps fp under
    (fill)³ ≈ 1.6%); this build pins m so the oracle can replay it.

    Variant-of: ``bloom_semijoin_reduction`` — r7 twin builds the filter as a per-partition bitmap fold.
    """
    from ..functions.sampling import md5_uniform

    def pos(expr: str, i: int):
        return F.floor(
            md5_uniform(f"concat('bloom{i}|', cast({expr} as string))") * 65536.0
        ).cast("long")

    cust = load_table(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    positions = (
        keys.select(pos("k", 0).alias("p"))
        .unionAll(keys.select(pos("k", 1).alias("p")))
        .unionAll(keys.select(pos("k", 2).alias("p")))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    orders = load_table(spark, sf_dir, "orders")
    probe = orders.select(
        "o_orderkey", "o_custkey",
        pos("o_custkey", 0).alias("p0"),
        pos("o_custkey", 1).alias("p1"),
        pos("o_custkey", 2).alias("p2"),
    )
    bp = F.broadcast(positions)
    flagged = (
        probe.join(bp.withColumnRenamed("p", "p0").withColumnRenamed("hit", "h0"),
                   "p0", "left")
        .join(bp.withColumnRenamed("p", "p1").withColumnRenamed("hit", "h1"),
              "p1", "left")
        .join(bp.withColumnRenamed("p", "p2").withColumnRenamed("hit", "h2"),
              "p2", "left")
        .join(
            F.broadcast(keys.withColumn("is_true", F.lit(True))),
            probe.o_custkey == keys.k, "left",
        )
        .select(
            (F.col("h0").isNotNull() & F.col("h1").isNotNull()
             & F.col("h2").isNotNull()).alias("is_cand"),
            F.coalesce("is_true", F.lit(False)).alias("is_true"),
        )
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("is_true").cast("long")).alias("n_true"),
        F.sum(F.col("is_cand").cast("long")).alias("n_candidates"),
        (F.sum((F.col("is_true") & ~F.col("is_cand")).cast("long")) == 0)
        .alias("no_false_negatives"),
        (
            F.sum((F.col("is_cand") & ~F.col("is_true")).cast("long"))
            <= 0.05 * F.sum((~F.col("is_true")).cast("long"))
        ).alias("fp_rate_ok"),
    )


def _md5_int_sql(expr: str, *, duck: bool) -> str:
    """Engine-twin 32-bit integer from the first 8 hex digits of
    md5(expr), parsed positionally (same construction as
    functions/sampling.md5_uniform, without the (0,1) scaling):
    every term is an exact integer in double, so the BIGINT cast is
    exact on both engines."""
    pos = "strpos('0123456789abcdef', substr(md5({e}), {i}, 1))" if duck else \
          "locate(substr(md5({e}), {i}, 1), '0123456789abcdef')"
    terms = " + ".join(
        f"({pos.format(e=expr, i=i)} - 1) * {float(16 ** (8 - i))}"
        for i in range(1, 9)
    )
    return f"CAST(({terms}) AS BIGINT)"


_BF_POW2 = (
    "(VALUES (CAST(1024 AS BIGINT)),(2048),(4096),(8192),(16384),"
    "(32768),(65536),(131072),(262144),(524288),(1048576),(2097152),"
    "(4194304),(8388608),(16777216),(33554432),(67108864),(134217728),"
    "(268435456),(536870912),(1073741824))"
)

_BF_HASH_DUCK = _md5_int_sql(
    "concat('bf', CAST(hi AS VARCHAR), '|', CAST(k AS VARCHAR))", duck=True
)


@query(
    "bloom_semijoin_reduction",
    category="J12-bloom",
    variant_of="bloom_prefilter_semi_join",
    oracle=f"""
        WITH urgent AS (
            SELECT DISTINCT o_orderkey AS k FROM orders
            WHERE o_orderpriority = '1-URGENT'
        ), nm AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   (SELECT min(p) FROM {_BF_POW2} v(p)
                    WHERE p >= 10 * (SELECT count(*) FROM urgent)) AS m
            FROM urgent
        ), hashes AS (
            SELECT k, ({_BF_HASH_DUCK}) % (SELECT m FROM nm) AS bit
            FROM urgent, LATERAL unnest(generate_series(0, 6)) AS t(hi)
        ), bitmap AS (
            -- 62 bits per word: DuckDB rejects 1<<63 (signed
            -- overflow) where Spark wraps — 62 keeps both exact
            SELECT bit // 62 AS word,
                   bit_or(CAST(1 AS BIGINT)
                          << CAST(bit % 62 AS INTEGER)) AS bits
            FROM hashes GROUP BY bit // 62
        ), probe_keys AS (
            SELECT DISTINCT l_orderkey AS k FROM lineitem
        ), probe_hashes AS (
            SELECT k, ({_BF_HASH_DUCK}) % (SELECT m FROM nm) AS bit
            FROM probe_keys, LATERAL unnest(generate_series(0, 6)) AS t(hi)
        ), probed AS (
            SELECT ph.k,
                   bool_and(coalesce((b.bits & (CAST(1 AS BIGINT)
                        << CAST(ph.bit % 62 AS INTEGER))) <> 0,
                        false)) AS cand
            FROM probe_hashes ph
            LEFT JOIN bitmap b ON ph.bit // 62 = b.word
            GROUP BY ph.k
        ), flagged AS (
            SELECT p.k, p.cand, (u.k IS NOT NULL) AS is_true
            FROM probed p LEFT JOIN urgent u ON p.k = u.k
        )
        SELECT (SELECT n FROM nm) AS n_build_keys,
               (SELECT m FROM nm) AS m_bits,
               CAST(count(*) AS BIGINT) AS n_probe_keys,
               CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_true,
               CAST(sum(CASE WHEN cand THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_candidates,
               bool_and(CASE WHEN is_true THEN cand ELSE TRUE END)
                   AS no_false_negatives,
               CAST(round(sum(CASE WHEN cand AND NOT is_true
                                   THEN 1 ELSE 0 END) * 1.0
                          / nullif(sum(CASE WHEN NOT is_true
                                            THEN 1 ELSE 0 END), 0), 6)
                    AS DOUBLE) AS fp_rate
        FROM flagged
    """,
)
def bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join REDUCTION via an explicit Bloom filter (Bernstein &
    Chiu 1981's semi-join programs; the hand-rolled twin of Spark's
    AQE runtime row-group filter): build a k=7-hash Bloom bitmap over
    urgent order keys, probe every lineitem order key against it, and
    emit the reduction census — exact member count, candidate count,
    measured false-positive rate, and the no-false-negatives GATE the
    structure guarantees by construction (hash-checked against the
    oracle computing the identical md5 bit arithmetic).

    Sizing is data-driven and engine-twinned: m = smallest power of
    two >= 10 bits/key, picked from an integer VALUES ladder (no
    float log2 — a power-of-two boundary must not flip on one engine
    ULP). Words carry 62 bits: DuckDB rejects 1<<63 where Spark
    wraps, so neither engine touches the sign bit. ~0.4% fp at 10
    bits/key, the textbook Bloom operating point.

    Variant note: the round-3 `bloom_prefilter_semi_join` pins the
    same semi-join-reduction family with per-position broadcast joins;
    THIS form packs the filter into 62-bit bitmap words (one bit_or
    aggregate, one broadcast), the shape that stays one frame as m
    grows. Both kept deliberately: they certify each other's family.

    Scale: THE distributed-join-pruning primitive — the bitmap is
    m/62 longs (one broadcastable frame even for millions of build
    keys), the probe side never shuffles (hash + broadcast lookup +
    per-key bool_and), and the exact semi-join it replaces would
    shuffle the full fact table. At billions of build keys, shard the
    bitmap by key range (partitioned Bloom) or lean on the built-in
    AQE runtime filter; the census here is what sizes that decision
    (fp_rate x probe volume = wasted downstream work).

    Variant-of: ``bloom_prefilter_semi_join`` — r7 variant: per-partition bitmap built with aggregate() vs the r3 broadcast Bloom array.
    """
    n_hashes = 7
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
        .persist()  # build side: bitmap + truth flags + n
    )
    n = urgent.count()  # bounded metadata scalar (sizes the filter)
    m = next(p for i in range(10, 31) if (p := 1 << i) >= 10 * n)

    hash_bit = (
        F.expr(
            _md5_int_sql(
                "concat('bf', CAST(hi AS STRING), '|', CAST(k AS STRING))",
                duck=False,
            )
        )
        % m
    )
    hashes = urgent.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("hi")
    ).select("k", hash_bit.alias("bit"))
    bitmap = (
        hashes.groupBy((F.col("bit") / 62).cast("long").alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 62 AS INT))")
            ).alias("bits")
        )
    )
    probe = li.select(F.col("l_orderkey").alias("k")).distinct()
    probe_hashes = probe.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("hi")
    ).select("k", hash_bit.alias("bit"))
    probed = (
        probe_hashes.withColumn("word", (F.col("bit") / 62).cast("long"))
        .join(F.broadcast(bitmap), "word", "left")
        .groupBy("k")
        .agg(
            F.bool_and(
                F.coalesce(
                    F.expr(
                        "(bits & shiftleft(CAST(1 AS BIGINT),"
                        " CAST(bit % 62 AS INT))) <> 0"
                    ),
                    F.lit(False),
                )
            ).alias("cand")
        )
    )
    flagged = probed.join(
        F.broadcast(urgent.withColumn("is_true", F.lit(True))), "k", "left"
    ).select("k", "cand", F.coalesce("is_true", F.lit(False)).alias("is_true"))
    return flagged.agg(
        F.lit(n).cast("long").alias("n_build_keys"),
        F.lit(m).cast("long").alias("m_bits"),
        F.count(F.lit(1)).cast("long").alias("n_probe_keys"),
        F.sum(F.col("is_true").cast("long")).cast("long").alias("n_true"),
        F.sum(F.col("cand").cast("long")).cast("long").alias("n_candidates"),
        F.bool_and(F.when(F.col("is_true"), F.col("cand")).otherwise(F.lit(True)))
        .alias("no_false_negatives"),
        F.round(
            F.sum((F.col("cand") & ~F.col("is_true")).cast("long"))
            / F.nullif(F.sum((~F.col("is_true")).cast("long")), F.lit(0)),
            6,
        ).alias("fp_rate"),
    )
