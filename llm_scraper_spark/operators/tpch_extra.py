"""Extended relational query shapes over the driver testdata tables.

Widens the relational backbone beyond operators/relational.py with the
classic TPC-H decision-support shapes the reference's analytics would
need at 100 TB: EXISTS / NOT-EXISTS subqueries, scalar-subquery
predicates, HAVING over grouped facts, disjunctive pushdown, outer-join
distributions, rollup hierarchies, and an as-of join.  Each query keeps
the plan-quality discipline of the suite:

- per-table filters issued BEFORE joins so Catalyst pushes them into
  the parquet scans (PushedFilters);
- dims broadcast explicitly; fact⋈fact joins shuffle on the join key
  only after both sides are pruned;
- money/measure sums via decimal(18,2) for engine-exact value hashes;
- every top-k sorts with a unique tie-break key.

Adapted to the driver schema (TESTDATA.md): no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode columns, so Q4/Q12 use
l_returnflag/o_orderpriority stand-ins with the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _rev(price="l_extendedprice", disc="l_discount"):
    return F.col(price).cast(DEC) * (F.lit(1) - F.col(disc)).cast(DEC)


# ------------------------------------------------------------------ Q4
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery = left-semi join of a
    date-pruned orders scan against a flag-pruned lineitem scan, then
    priority rollup.  (l_returnflag='R' stands in for the reference's
    commitdate<receiptdate predicate — same semi-join plan.)"""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(
            li.select("l_orderkey"), orders.o_orderkey == li.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------------------------ Q7
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair flows.  Both nation
    lookups broadcast (fixed 25 rows); supplier/customer scale with SF
    so AQE sizes those joins at runtime; the disjunctive pair predicate
    applies after the dims resolve; revenue per
    (supp_nation, cust_nation, year)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ------------------------------------------------------------------ Q8
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — the share of NATION_1
    suppliers in AMERICA-region customers' ECONOMY-part revenue, by
    order year.  part is pruned at the scan (p_type pushed down) before
    the fact join; part/supplier/customer scale with SF so AQE sizes
    those joins; nation (25 rows) and region (5 rows) broadcast.
    Conditional decimal sums in one pass, double division last."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    zero = F.lit(0).cast(DEC)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", _rev()).otherwise(zero))
            .cast("double")
            .alias("nation_revenue"),
            F.sum(_rev()).cast("double").alias("total_revenue"),
        )
        .select(
            "o_year",
            "nation_revenue",
            "total_revenue",
            (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


# ------------------------------------------------------------------ Q15
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier by quarterly revenue — the
    revenue view folded inline, the scalar max joined back as a 1-row
    broadcast (never a single-partition global window, which would
    funnel every supplier row through one task at scale).  Revenue
    kept decimal through the max-equality so ties are exact; cast to
    double only on output."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("_rev_dec"))
    max_rev = revenue.agg(F.max("_rev_dec").alias("_max_rev"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("_rev_dec") == F.col("_max_rev"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ------------------------------------------------------------------ Q17
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue — the correlated
    AVG subquery decorrelated into a per-part aggregate joined back to
    the fact (p_brand + p_size stand in for the missing p_container;
    same plan).  The 0.2·avg threshold is compared in exact integer
    arithmetic (qty < 0.2·sum/cnt ⟺ 5·qty·cnt < sum — l_quantity is
    integer-valued), so the filter is engine-exact with no float
    division; revenue summed decimal, divided by 7.0 last."""
    part_f = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    li_parts = li.join(part_f, li.l_partkey == part_f.p_partkey, "left_semi")
    stats = li_parts.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_q"),
        F.count("*").alias("cnt"),
    )
    return (
        li_parts.alias("l")
        .join(stats.alias("s"), F.col("l.l_partkey") == F.col("s.l_partkey"))
        .filter(
            F.lit(5) * F.col("l.l_quantity").cast("long") * F.col("s.cnt")
            < F.col("s.sum_q")
        )
        .agg(
            (
                F.sum(F.col("l.l_extendedprice").cast(DEC)).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count("*").cast("long").alias("n_small"),
        )
    )


# ------------------------------------------------------------------ Q10
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue top-20.  lineitem pruned
    to returns at the scan, orders date-pruned, nation broadcast
    (customer scales with SF — AQE decides);
    TakeOrderedAndProject caps the result."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ------------------------------------------------------------------ Q12
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts per category after a
    fact⋈fact join (o_orderpriority buckets stand in for l_shipmode)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ------------------------------------------------------------------ Q13
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer-join fan-out distribution — customers by
    order count including zero-order customers (left outer join, count
    of non-null keys, then distribution of the counts)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ------------------------------------------------------------------ Q14
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-revenue share — conditional decimal sums
    in one pass over the part-joined fact (part scales with SF, so no
    broadcast hint — AQE decides), double division last."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = _t(spark, sf_dir, "part")
    zero = F.lit(0).cast(DEC)
    agg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero))
            .cast("double")
            .alias("promo_revenue_part"),
            F.sum(_rev()).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue_part",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue_part") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


# ------------------------------------------------------------------ Q18
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped fact (sum qty > 200),
    joined back to orders+customer, top-100 by totalprice.

    The HAVING set scales linearly with lineitem, so it is NOT
    broadcast (100 TB OOM); shuffle_hash keeps the join linear and
    skips the sort a merge join would add.  customer also scales with
    the corpus — no hint; AQE picks broadcast only if the runtime size
    is actually small."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_sum_qty"))
        .filter(F.col("_sum_qty") > 200)
        .select(
            F.col("l_orderkey").alias("big_orderkey"),
            F.col("_sum_qty").cast("double").alias("total_qty"),
        )
    )
    return (
        orders.join(big.hint("shuffle_hash"), orders.o_orderkey == F.col("big_orderkey"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ------------------------------------------------------------------ Q19
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    clauses across the part join — Catalyst extracts the common
    l_partkey=p_partkey conjunct so the join stays an equi-join and
    the OR evaluates post-join; part scales with SF, so AQE sizes the
    join at runtime instead of a compile-time broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    clause1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 21))
    )
    clause2 = (
        (F.col("p_brand") == "Brand#11")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 30))
    )
    clause3 = (
        (F.col("p_brand") == "Brand#20")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 40))
    )
    return joined.filter(clause1 | clause2 | clause3).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
    )


# ------------------------------------------------------------------ Q22
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (global avg over
    positive balances — computed once, joined as a 1-row broadcast) +
    NOT EXISTS anti-join against orders, grouped by segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(
            orders.select("o_custkey"),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# ------------------------------------------------------------- rollup
def rollup_pricing_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup hierarchy (returnflag → linestatus → grand total) in one
    pass — Spark expands grouping sets map-side, so the fact scans
    once; null group labels coalesce to 'ALL' for engine-stable
    ordering and hashing."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(_rev()).cast("double").alias("sum_disc_price"),
            F.count("*").cast("long").alias("n_rows"),
            F.grouping_id().cast("long").alias("level_id"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "sum_disc_price",
            "n_rows",
            "level_id",
        )
        .orderBy("level_id", "returnflag", "linestatus")
    )


# ------------------------------------------------------------- as-of
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the latest click at
    or before it by the same user.  Implemented as the scalable
    union+carry-forward composition (one shuffle on user_id, no range
    explosion): tag both sides, sort within user, carry the last click
    forward.  Clicks deduped to one per (user, ts) — max event_id —
    so the match is deterministic; DuckDB's native ASOF JOIN is the
    oracle twin (different algorithm, same answer)."""
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "ts", "click_id", F.lit(0).alias("side"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("side"),
    )
    unioned = clicks.withColumn("purchase_id", F.lit(None).cast("long")).unionByName(
        purchases.withColumn("click_id", F.lit(None).cast("long"))
    )
    # clicks sort before purchases at equal ts (side 0 < 1) so an
    # equal-ts click is visible to the purchase — ASOF '>=' semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn(
            "matched_click_id", F.last("click_id", ignorenulls=True).over(w)
        )
        .filter(F.col("purchase_id").isNotNull())
        .select(
            "user_id",
            F.col("purchase_id").cast("long"),
            F.col("matched_click_id").cast("long"),
        )
        .orderBy("user_id", "purchase_id")
    )


ORACLE_SQL: dict[str, str] = {
    "tpch_q4_order_priority": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "tpch_q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "tpch_q8_market_share": """
        WITH yr AS (
          SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                 CAST(sum(CASE WHEN n1.n_name = 'NATION_1'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_revenue,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region ON n2.n_regionkey = r_regionkey
          WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY o_year
        )
        SELECT o_year, nation_revenue, total_revenue,
               nation_revenue / total_revenue AS mkt_share
        FROM yr ORDER BY o_year
    """,
    "tpch_q15_top_supplier": """
        WITH revenue AS (
          SELECT l_suppkey,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS rev_dec
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)
        ORDER BY s_suppkey
    """,
    "tpch_q17_small_qty_revenue": """
        WITH pq AS (
          SELECT p_partkey FROM part WHERE p_brand = 'Brand#13' AND p_size <= 10
        ),
        li_parts AS (
          SELECT l.* FROM lineitem l JOIN pq ON l.l_partkey = pq.p_partkey
        ),
        stats AS (
          SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS sum_q,
                 count(*) AS cnt
          FROM li_parts GROUP BY l_partkey
        )
        SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_small
        FROM li_parts l JOIN stats s ON l.l_partkey = s.l_partkey
        WHERE 5 * CAST(l.l_quantity AS BIGINT) * s.cnt < s.sum_q
    """,
    "tpch_q10_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "tpch_q12_priority_shipping": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "tpch_q13_customer_distribution": """
        WITH per_cust AS (
          SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM per_cust GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q14_promo_effect": """
        WITH agg AS (
          SELECT
            CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue_part,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
        )
        SELECT promo_revenue_part, total_revenue,
               100.0 * promo_revenue_part / total_revenue AS promo_pct
        FROM agg
    """,
    "tpch_q18_large_volume": """
        WITH big AS (
          SELECT l_orderkey AS big_orderkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM orders
        JOIN big ON o_orderkey = big_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "tpch_q19_disjunctive": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
    "tpch_q22_sales_opportunity": """
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "rollup_pricing_hierarchy": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS level_id
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY level_id, returnflag, linestatus
    """,
    "asof_join_events": """
        WITH clicks AS (
          SELECT user_id, ts, max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        ), purchases AS (
          SELECT user_id, ts, event_id AS purchase_id
          FROM events WHERE event_type = 'purchase'
        )
        SELECT p.user_id AS user_id,
               CAST(p.purchase_id AS BIGINT) AS purchase_id,
               CAST(c.click_id AS BIGINT) AS matched_click_id
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY user_id, purchase_id
    """,
}

QUERIES = {
    "tpch_q4_order_priority": tpch_q4_order_priority,
    "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q17_small_qty_revenue": tpch_q17_small_qty_revenue,
    "tpch_q10_returned_items": tpch_q10_returned_items,
    "tpch_q12_priority_shipping": tpch_q12_priority_shipping,
    "tpch_q13_customer_distribution": tpch_q13_customer_distribution,
    "tpch_q14_promo_effect": tpch_q14_promo_effect,
    "tpch_q18_large_volume": tpch_q18_large_volume,
    "tpch_q19_disjunctive": tpch_q19_disjunctive,
    "tpch_q22_sales_opportunity": tpch_q22_sales_opportunity,
    "rollup_pricing_hierarchy": rollup_pricing_hierarchy,
    "asof_join_events": asof_join_events,
}
