"""The remaining classic TPC-H decision-support shapes (Q2, Q9, Q11,
Q16, Q20, Q21) adapted to the driver schema.

The driver testdata has no ``partsupp`` table, so every query that
needs the part↔supplier supply relation derives the stand-in

    supply(ps_partkey, ps_suppkey, ps_cost)
      = distinct (l_partkey, l_suppkey) pairs observed in lineitem,
        ps_cost = min(l_extendedprice / l_quantity) over the pair

which is deterministic, identical in Spark and DuckDB (IEEE-754 double
division + min), and keeps the original plan shapes: Q2's correlated
min-cost subquery, Q11's HAVING-vs-global-scalar, Q16's NOT-IN +
count-distinct, Q20's nested-IN semi chain, Q21's double
EXISTS / NOT-EXISTS self-join on the fact.

Plan discipline (same as tpch_extra.py):
- per-table filters issued before joins (parquet pushdown);
- only FIXED-cardinality dims (nation=25, region=5) and 1-row global
  aggregates carry compile-time broadcast hints; supplier/part/customer
  scale with SF, so those joins are left to AQE, which picks broadcast
  at runtime only when the built side actually fits;
- the supply relation aggregates lineitem FIRST (map-side partials on
  (partkey, suppkey)), so the expensive fact is reduced before any
  join — at 100 TB the supply agg is the only full-fact shuffle and
  everything downstream is millions of pairs, not billions of rows;
- Q21 replaces the correlated EXISTS pair with one order-level
  aggregate + equi-join: O(fact) scan + one shuffle on orderkey
  instead of two self-joins of the fact (the EXISTS form is the
  DuckDB twin — different algorithm, same answer);
- money sums decimal(18,2)-exact; doubles only divided/compared,
  never summed; every top-k carries a unique tie-break.

Reference parity: the reference's analytics are imperative Python over
scraped rows (`/root/reference/server/scripts/analysis/*.py`); these
shapes are the SURVEY §2.3/§2.4 join-aggregate semantics at
decision-support scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp stand-in: one row per (partkey, suppkey) pair seen
    in lineitem, costed at the cheapest observed unit price.  Aggregates
    the fact before any join — map-side partial on the pair key."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_cost"))
    )


_SUPPLY_SQL = """
  supply AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS ps_cost
    FROM lineitem GROUP BY 1, 2
  )
"""


# ------------------------------------------------------------------ Q2
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the ASIA supplier(s)
    offering the minimum supply cost.  The correlated scalar subquery
    becomes a window min over the region-filtered supply relation —
    one shuffle on ps_partkey, no self-join; nation/region broadcast,
    the supplier and part joins sized by AQE (both scale with SF)."""
    supply = _supply(spark, sf_dir)
    nat = _t(spark, sf_dir, "nation").join(
        F.broadcast(
            _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
        ),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    eligible = supply.join(
        supp.select("s_suppkey", "s_name", "s_acctbal", "n_name"),
        supply.ps_suppkey == F.col("s_suppkey"),
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eligible.withColumn("min_cost", F.min("ps_cost").over(w))
        .filter(F.col("ps_cost") == F.col("min_cost"))
        .join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("ps_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# ------------------------------------------------------------------ Q9
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over
    name-matched parts.  Supply cost stands in as 10% of p_retailprice
    per unit.  Both money legs sum decimal-exact and combine as
    doubles only at the end; part filter pushes into the scan before
    the fact join; nation broadcast, part/supplier joins sized by
    AQE."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(
            part.select("p_partkey", "p_retailprice"),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
            ).alias("_rev"),
            F.sum(
                F.col("p_retailprice").cast(DEC) * F.col("l_quantity").cast(DEC)
            ).alias("_retail_qty"),
        )
        .select(
            "nation",
            "o_year",
            (
                F.col("_rev").cast("double")
                - F.lit(0.1) * F.col("_retail_qty").cast("double")
            ).alias("profit"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )


# ----------------------------------------------------------------- Q11
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part supply value restricted to ASIA
    suppliers, HAVING value above a fixed fraction of the global
    total.  The global scalar is a 1-row broadcast cross-join; the
    per-part agg shuffles once on l_partkey."""
    nat = _t(spark, sf_dir, "nation").join(
        F.broadcast(
            _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
        ),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    asia_supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    li = _t(spark, sf_dir, "lineitem").join(
        asia_supp.select("s_suppkey"),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(
            F.col("l_extendedprice").cast(DEC)
            * (F.lit(1) + F.col("l_tax")).cast(DEC)
        )
        .cast("double")
        .alias("part_value")
    )
    total = per_part.agg(F.sum(F.col("part_value")).alias("_total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.008) * F.col("_total"))
        .select("partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "partkey")
    )


# ----------------------------------------------------------------- Q16
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) over attribute-filtered parts, excluding complaint suppliers
    via NOT IN (anti-join against the filtered supplier set).  The
    supply pairs aggregate first; the part and supplier joins scale
    with SF, so AQE sizes them at runtime."""
    supply = _supply(spark, sf_dir).select("ps_partkey", "ps_suppkey")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%3")
    )
    return (
        supply.join(
            bad_supp.select("s_suppkey"),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            part.select("p_partkey", "p_brand", "p_type", "p_size"),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ----------------------------------------------------------------- Q20
def tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate the 1996 supply of a
    name-matched part (shipped more than half the part's total — the
    availqty>half-of-shipped predicate inverted for the schema).  The
    nested-IN chain becomes: filtered fact agg on (part, supp) →
    window part total (same shuffle key, no extra exchange) → filter →
    distinct supplier semi-join."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("large%"))
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(
            part.select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
    )
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("_pair_qty")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_pair.withColumn("_part_qty", F.sum("_pair_qty").over(w))
        .filter(
            F.col("_pair_qty").cast("double") * 2
            > F.col("_part_qty").cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            dominant,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ----------------------------------------------------------------- Q21
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone failed (returnflag 'R')
    on a finished multi-supplier order.  The classic double
    EXISTS / NOT-EXISTS pair of fact self-joins collapses to ONE
    order-level aggregate — n_supp / n_r_supp per order — equi-joined
    back to the distinct (order, R-supplier) pairs: the fact scans
    once and shuffles once on orderkey, instead of three fact scans
    with two correlated self-joins (which the DuckDB twin runs —
    different algorithm, same answer)."""
    f_orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = _t(spark, sf_dir, "lineitem").join(
        f_orders.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_n_r_supp"),
    )
    r_pairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    waiting = r_pairs.join(
        stats.filter((F.col("_n_supp") > 1) & (F.col("_n_r_supp") == 1)),
        "l_orderkey",
        "left_semi",
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("numwait"))
        .join(
            _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


ORACLE_SQL: dict[str, str] = {
    "tpch_q2_min_cost_supplier": """
        WITH supply AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 min(l_extendedprice / l_quantity) AS ps_cost
          FROM lineitem GROUP BY 1, 2
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
               CAST(ps_cost AS DOUBLE) AS supply_cost
        FROM supply
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN part ON ps_partkey = p_partkey
        WHERE r_name = 'ASIA' AND p_size <= 15 AND p_type = 'STANDARD'
          AND ps_cost = (
            SELECT min(s2.ps_cost) FROM supply s2
            JOIN supplier ON s2.ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND s2.ps_partkey = supply.ps_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "tpch_q9_product_profit": """
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 - 0.1 * CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))*CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, o_year
        ORDER BY nation, o_year DESC
    """,
    "tpch_q11_important_stock": """
        WITH asia_li AS (
          SELECT l_partkey, l_extendedprice, l_tax
          FROM lineitem
          WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA')
        ), per_part AS (
          SELECT l_partkey AS partkey,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1+l_tax AS DECIMAL(18,2))) AS DOUBLE) AS part_value
          FROM asia_li GROUP BY 1
        )
        SELECT partkey, part_value FROM per_part
        WHERE part_value > 0.008 * (SELECT sum(part_value) FROM per_part)
        ORDER BY part_value DESC, partkey
    """,
    "tpch_q16_supplier_part_counts": """
        WITH supply AS (
          SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem
        )
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM supply JOIN part ON ps_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND ps_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_name LIKE '%3')
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "tpch_q20_dominant_suppliers": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
          WITH pair AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS pair_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
            GROUP BY 1, 2
          )
          SELECT l_suppkey FROM pair p
          WHERE CAST(pair_qty AS DOUBLE) * 2 > (
            SELECT CAST(sum(pair_qty) AS DOUBLE) FROM pair p2
            WHERE p2.l_partkey = p.l_partkey)
        )
        ORDER BY s_suppkey
    """,
    "tpch_q21_waiting_suppliers": """
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM (
          SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
          FROM lineitem l1
          JOIN orders ON l1.l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
            AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R')
        ) w
        JOIN supplier ON w.l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
}

QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q11_important_stock": tpch_q11_important_stock,
    "tpch_q16_supplier_part_counts": tpch_q16_supplier_part_counts,
    "tpch_q20_dominant_suppliers": tpch_q20_dominant_suppliers,
    "tpch_q21_waiting_suppliers": tpch_q21_waiting_suppliers,
}
