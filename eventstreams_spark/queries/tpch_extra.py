"""Additional TPC-H query shapes over the reduced driver schema.

The driver's testdata carries a reduced TPC-H: no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode, no p_container. Queries whose
canonical form needs those (Q2/Q9/Q11/Q12/Q16/Q20) are adapted to the
available columns while preserving the *operator shape* (the thing the
engine is exercised on): EXISTS decorrelation, disjunctive pushdown,
conditional market-share aggregation, HAVING-filtered semi join,
argmax-by-scalar-subquery.

Determinism: every post-join money sum goes through exact_money_sum /
its scaled-bigint oracle twin (functions/exact.py rationale); ratios
divide the scaled bigints directly on both sides so the scale cancels
bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import MONEY_SCALE, exact_money_sum
from ..registry import query


def _scaled(expr: F.Column) -> F.Column:
    """Row-exact scaled-bigint money term (matches the oracle pattern)."""
    return F.floor(expr * MONEY_SCALE + F.lit(0.5)).cast("long")


@query(
    "tpch_q6_forecast_revenue",
    category="P5",
    oracle="""
        SELECT sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5) AS BIGINT)) / 10000.0
                   AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive filter + global agg.

    Scale: the showcase pushdown query — all four predicates reach the
    parquet scan (PushedFilters), ReadSchema is 4 columns, and the agg
    is a two-phase partial/final with a 1-row result. No shuffle of
    data, only of partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        exact_money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q4_late_ship_priority",
    category="J4",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def tpch_q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: late-ship EXISTS instead of the absent
    commit/receipt dates): decorrelated EXISTS -> LEFT SEMI join with an
    equi key plus a non-equi residual, then a tiny priority rollup.

    Scale: semi join shuffles both sides on orderkey once; the residual
    (l_shipdate > o_orderdate + 60d) evaluates inside the join without a
    second pass. Output is 5 rows.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q8_market_share",
    category="A11",
    oracle="""
        WITH vol AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                     AS volume_cents,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN part     ON l_partkey = p_partkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1998-01-01')
        SELECT o_year,
               sum(CASE WHEN supp_nation = 'BRAZIL' THEN volume_cents ELSE 0 END)
                 / sum(volume_cents) AS mkt_share
        FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join + conditional market-share ratio.

    Scale: part/customer/nation/region/supplier broadcast (all dims);
    the only big shuffle is lineitem><orders on orderkey. The ratio
    divides two scaled-bigint sums so the money scale cancels exactly
    on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = load_table(spark, sf_dir, "supplier")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _scaled(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume_cents"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "BRAZIL", F.col("volume_cents")).otherwise(F.lit(0)))
                / F.sum("volume_cents")
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q10_returned_items",
    category="O2",
    oracle="""
        SELECT c_custkey, c_name,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
                   / 10000.0 AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-items revenue per customer, top 20.

    Scale: nation broadcasts; orders is date-pruned before its shuffle;
    the returnflag filter is pushed to the lineitem scan. Top-20 under a
    total order (revenue DESC, custkey) -> TakeOrderedAndProject.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q12_late_priority_counts",
    category="A11",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                   AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                   AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def tpch_q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: returnflag stands in for the absent
    l_shipmode; late = shipped >90d after order): join + CASE buckets.

    Scale: one orderkey shuffle; the non-equi lateness predicate runs
    as a join residual; counts are map-side-combinable longs.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    joined = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_effect",
    category="A11",
    oracle="""
        SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                     ELSE 0 END)
                 / sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
                 AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share over a month window.

    Scale: part broadcasts into the date-pruned lineitem scan — zero
    shuffles of fact data. The 100.0 multiplier is applied to the
    scaled-bigint ratio identically on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    cents = _scaled(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0)))
                / F.sum(cents)
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q15_top_supplier",
    category="J2",
    oracle="""
        WITH rev AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
                     / 10000.0 AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN rev ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax via scalar-subquery over a derived view.

    Scale: revenue is one suppkey shuffle; the max is a 1-row agg
    broadcast back (crossJoin of a scalar), NOT a global window — the
    derived frame can be millions of suppliers at 100 TB. The exact
    scaled sum makes the equality join on a double safe cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        exact_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.max_revenue)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q18_large_orders",
    category="A1",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               sum(l_quantity) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 300)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered IN subquery -> semi join.

    Scale: the qualifying-orderkey set is produced by one lineitem
    groupBy and is tiny (99.9th-percentile filter), so it broadcasts
    into the semi join; quantities are integral doubles, so the re-sum
    after the join is order-insensitive exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(big.withColumnRenamed("l_orderkey", "big_orderkey")),
               F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "tpch_q19_disjunctive_revenue",
    category="P5",
    oracle="""
        SELECT sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
                   / 10000.0 AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#7'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted: p_size for the absent p_container):
    disjunctive mixed-table predicate over a broadcast join.

    Scale: Catalyst extracts the common single-table conjuncts — the
    p_brand IN (...) and p_size <= 15 / l_quantity <= 30 envelopes push
    to the scans — while the full disjunction evaluates post-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    q, br, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disj = (
        ((br == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((br == "Brand#24") & sz.between(1, 10) & q.between(10, 20))
        | ((br == "Brand#7") & sz.between(1, 15) & q.between(20, 30))
    )
    return j.filter(disj).agg(
        exact_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q2_min_cost_supplier",
    category="J2",
    oracle="""
        WITH offers AS (
          SELECT l_partkey, l_suppkey,
                 min(CAST(floor(l_extendedprice * (1 - l_discount) / l_quantity
                                * 10000 + 0.5) AS BIGINT)) AS offer_cents
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ), eu AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        ), eu_offers AS (
          SELECT o.l_partkey, o.offer_cents, eu.s_name, eu.s_acctbal, eu.n_name
          FROM offers o JOIN eu ON o.l_suppkey = eu.s_suppkey
        ), best AS (
          SELECT l_partkey, min(offer_cents) AS min_cents
          FROM eu_offers GROUP BY l_partkey
        )
        SELECT eo.s_acctbal, eo.s_name, eo.n_name,
               p.p_partkey, p.p_name,
               eo.offer_cents / 10000.0 AS min_unit_price
        FROM eu_offers eo
        JOIN best b ON eo.l_partkey = b.l_partkey AND eo.offer_cents = b.min_cents
        JOIN part p ON eo.l_partkey = p.p_partkey
        WHERE p.p_type = 'LARGE' AND p.p_size <= 10
        ORDER BY eo.s_acctbal DESC, eo.n_name, eo.s_name, p.p_partkey
        LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: per-pair min unit price from lineitem
    stands in for the absent partsupp supplycost): the correlated
    min-cost scalar subquery, DECORRELATED — per-part minimum over the
    region-restricted offers, equi-joined back on (part, min) instead
    of re-running a subquery per row.

    Ties keep every supplier at the minimum (canonical Q2 semantics);
    the (s_acctbal DESC, n_name, s_name, p_partkey) sort is a total
    order over the (part, supplier) output rows, so LIMIT 100 is
    deterministic.

    Scale: lineitem aggregates once on (partkey, suppkey) — the only
    big shuffle; the EUROPE supplier dim broadcasts into it; `best` is
    an agg over the already-small offers frame, and the min-join is
    offers><best on partkey (both tiny vs lineitem). Unit price is a
    scaled bigint so min/equality survive cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    unit_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) / F.col("l_quantity")
        * MONEY_SCALE + F.lit(0.5)
    ).cast("long")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_cents).alias("offer_cents")
    )
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_offers = offers.join(
        F.broadcast(eu), offers.l_suppkey == eu.s_suppkey
    ).select("l_partkey", "offer_cents", "s_name", "s_acctbal", "n_name")
    # rename the group key: `best` derives from eu_offers, so joining
    # back on same-named attributes would be a self-join ambiguity
    best = (
        eu_offers.groupBy("l_partkey")
        .agg(F.min("offer_cents").alias("min_cents"))
        .withColumnRenamed("l_partkey", "b_partkey")
    )
    return (
        eu_offers.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("offer_cents") == F.col("min_cents")),
        )
        .drop("b_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("offer_cents") / F.lit(float(MONEY_SCALE))).alias("min_unit_price"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_profit_decomposition",
    category="J2",
    oracle="""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                   - CAST(floor(p_retailprice * l_quantity * 0.6 * 10000 + 0.5) AS BIGINT))
                   / 10000.0 AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%re%'
        GROUP BY n_name, year(o_orderdate)
        ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_profit_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: 60% of p_retailprice × quantity stands
    in for the absent ps_supplycost): product-line profit decomposed by
    supplier nation and order year across a 5-table join with a
    substring part filter.

    Scale: ONE big shuffle (lineitem><orders on orderkey); part,
    supplier and nation all broadcast — part carries the '%re%' filter
    to cut the probe early. Profit is a difference of two scaled
    bigints per row, summed as bigint: order-insensitive and
    cross-engine exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%re%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit_cents = _scaled(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) - F.floor(
        F.col("p_retailprice") * F.col("l_quantity") * 0.6 * MONEY_SCALE + F.lit(0.5)
    ).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit_cents) / F.lit(float(MONEY_SCALE))).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock_share",
    category="A11",
    oracle="""
        WITH natval AS (
          SELECT l_partkey,
                 CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                     AS value_cents
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_7'
        ), per_part AS (
          SELECT l_partkey, sum(value_cents) AS part_cents
          FROM natval GROUP BY l_partkey
        ), total AS (
          SELECT sum(part_cents) AS total_cents FROM per_part
        )
        SELECT l_partkey, part_cents / 10000.0 AS part_value
        FROM per_part, total
        WHERE part_cents * 1000 > total_cents
        ORDER BY part_cents DESC, l_partkey
    """,
)
def tpch_q11_important_stock_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: shipped value from NATION_7 suppliers
    stands in for partsupp stock value): per-part value with a HAVING
    threshold against a SCALAR global-share subquery — the decorrelated
    form computes the total once and broadcasts it, instead of
    re-evaluating the subquery per group.

    The share test multiplies integers (part_cents * 1000 >
    total_cents ⇔ share > 0.1%) — no double division, so the
    threshold is bit-exact on both engines.

    Scale: lineitem shuffles once on partkey (supplier/nation
    broadcast before it); the total folds the per-part frame to one
    row broadcast back over it. Ordering ties broken by partkey.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    natval = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "l_partkey",
            _scaled(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "value_cents"
            ),
        )
    )
    per_part = natval.groupBy("l_partkey").agg(
        F.sum("value_cents").alias("part_cents")
    )
    total = per_part.agg(F.sum("part_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_cents") * 1000 > F.col("total_cents"))
        .select(
            "l_partkey",
            (F.col("part_cents") / F.lit(float(MONEY_SCALE))).alias("part_value"),
        )
    )


@query(
    "tpch_q16_supplier_part_counts",
    category="J5",
    oracle="""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sp
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#9'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 9, 14, 19, 24, 28, 35)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: distinct lineitem (part, supplier)
    pairs stand in for partsupp; negative-balance suppliers stand in
    for the complaint-comment exclusion): NOT-IN anti join + distinct
    supplier counts per (brand, type, size) bucket.

    Scale: the DISTINCT pair extraction is the one lineitem shuffle;
    the excluded-supplier set (6 rows at sf0.01) broadcasts as a LEFT
    ANTI join — NOT IN over a non-nullable key is exactly anti-join
    semantics; part broadcasts with all three predicates pushed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 35))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_excess_shippers",
    category="J4",
    oracle="""
        WITH bparts AS (
          SELECT p_partkey FROM part WHERE p_name LIKE 'b%'
        ), q97 AS (
          SELECT l_partkey, l_suppkey,
                 sum(CAST(l_quantity AS BIGINT)) AS qty97
          FROM lineitem JOIN bparts ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_partkey, l_suppkey
        ), qall AS (
          SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS qtyall
          FROM lineitem JOIN bparts ON l_partkey = p_partkey
          GROUP BY l_partkey
        ), excess AS (
          SELECT DISTINCT q97.l_suppkey
          FROM q97 JOIN qall ON q97.l_partkey = qall.l_partkey
          WHERE q97.qty97 * 50 > qall.qtyall * 3
        )
        SELECT s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (SELECT l_suppkey FROM excess)
        ORDER BY s_name
    """,
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: '1997 share of a part's lifetime
    shipped quantity > 6%' stands in for the availqty-vs-half-of-
    shipped test): the NESTED semi-join — an inner correlated
    aggregate comparison decorrelated into two aggregates joined on
    partkey, collapsed to a supplier set, then semi-joined into the
    supplier dim.

    The share test is integer math (qty97*50 > qtyall*3): quantities
    are integral, summed as bigint — bit-exact both engines.

    Scale: lineitem is read twice but both passes keep the pushed
    'b%'-part semi filter (broadcast) and aggregate before any wide
    join; the final IN collapses to a broadcast LEFT SEMI against the
    100-row supplier dim. No correlated re-execution anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bparts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("b%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    lib = li.join(F.broadcast(bparts), li.l_partkey == bparts.p_partkey)
    q97 = (
        lib.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty97"))
    )
    qall = lib.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qtyall")
    )
    excess = (
        q97.join(qall, "l_partkey")
        .filter(F.col("qty97") * 50 > F.col("qtyall") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(excess), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "s_acctbal", "n_name")
    )
