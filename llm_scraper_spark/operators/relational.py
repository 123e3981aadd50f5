"""Relational operator suite over the driver testdata tables.

Each function implements one operator family from SURVEY.md §2
(aggregations A*, joins J*, windows W*, sorts O*, set-ops U*, scalar
functions F*) as idiomatic DataFrame code, and has a DuckDB oracle twin
in ``ORACLE_SQL`` (same column names, same values).

Determinism discipline for the driver's value-hash compare:
- money/measure sums go through ``decimal(18,2)`` (exact, associative,
  identical across engines regardless of partition order), then cast
  to double for the output schema;
- every computed column is aliased identically in Spark and SQL;
- ties in any top-k/sort are broken by a unique key;
- int-typed outputs are cast to bigint on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from llm_scraper_spark.operators.sketches import hot_host_duck, hot_host_spark

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- A1/O2
def a1_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-count top-k (reference: AQL inbound-edge count,
    search_validation_playwright.py:214-226).  orders.o_custkey plays
    the edge-destination role.  Plan: partial+final hash agg, then
    TakeOrderedAndProject (no global sort)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("degree"))
        .orderBy(F.desc("degree"), F.asc("o_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------- A2-A4
def a2_a4_validation_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-validation aggregate: best normal vs opposing evidence per
    key, weight ratio, binary vote (reference:
    search_validation_playwright.py:62-82; src/validators/
    search_validation.py:116-120).  events.purchase≈normal,
    events.error≈opposing."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("value"))).alias(
            "normal_best"
        ),
        F.max(F.when(F.col("event_type") == "error", F.col("value"))).alias(
            "opposing_best"
        ),
    )
    n = F.coalesce(F.col("normal_best"), F.lit(0.0))
    o = F.coalesce(F.col("opposing_best"), F.lit(0.0))
    return agg.select(
        "user_id",
        "normal_best",
        "opposing_best",
        F.when(n + o > 0, n / (n + o)).otherwise(F.lit(0.5)).alias("weight"),
        F.when(n > o, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("vote"),
    ).orderBy("user_id")


# ---------------------------------------------------------------- A6/A7
def a6_precision_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group precision/recall/F1 arithmetic (reference:
    precision_recall.py:410-503).  lineitem return flags play
    tp/fp/fn: A=tp, R=fp, N=fn.  Decimal sums keep the hash exact."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    agg = li.groupBy("l_orderkey").agg(
        F.sum(F.when(F.col("l_returnflag") == "A", qty).otherwise(F.lit(0).cast(DEC)))
        .alias("tp"),
        F.sum(F.when(F.col("l_returnflag") == "R", qty).otherwise(F.lit(0).cast(DEC)))
        .alias("fp"),
        F.sum(F.when(F.col("l_returnflag") == "N", qty).otherwise(F.lit(0).cast(DEC)))
        .alias("fn"),
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    rec = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    return (
        agg.select(
            "l_orderkey",
            tp.alias("tp_qty"),
            fp.alias("fp_qty"),
            fn.alias("fn_qty"),
            prec.alias("precision"),
            rec.alias("recall"),
        )
        .orderBy("l_orderkey")
    )


def a7_macro_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Macro averages across groups (precision_recall.py:505-518).
    Computed over bigint counts so the average is count-ratio exact."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_orderkey").agg(
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("tp_n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("fp_n"),
    )
    per = agg.select(
        F.when(
            F.col("tp_n") + F.col("fp_n") > 0,
            F.col("tp_n").cast("double") / (F.col("tp_n") + F.col("fp_n")).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("precision")
    )
    # avg = sum(decimal-rounded precisions)/n would still reassociate;
    # instead use exact rational sums: sum of precisions is not needed —
    # report counts + a decimal-rounded mean which is stable at 1e-6.
    return per.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.col("precision").cast("decimal(18,9)")).cast("double").alias(
            "sum_precision"
        ),
    ).select(
        "n_groups",
        "sum_precision",
        (F.col("sum_precision") / F.col("n_groups")).alias("macro_precision"),
    )


# ---------------------------------------------------------------- A10/A11
def a10_accuracy_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """✅/❌ accuracy summary (method2.py:97-104)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_fail"),
        F.sum(F.when(F.col("event_type") != "error", 1).otherwise(0))
        .cast("long")
        .alias("n_ok"),
        F.count("*").cast("long").alias("n_total"),
    ).select(
        "n_fail",
        "n_ok",
        "n_total",
        (F.col("n_ok").cast("double") / F.col("n_total").cast("double")).alias(
            "accuracy"
        ),
    )


def a11_entity_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality entity set union (scrape_eccomerce.py:238-244):
    explode token arrays, distinct per source — Spark's
    explode+countDistinct replaces Python set unions."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("entity")
    ).filter(F.col("entity") != "")
    return (
        toks.groupBy("source")
        .agg(F.countDistinct("entity").cast("long").alias("n_entities"))
        .orderBy("source")
    )


# ---------------------------------------------------------------- joins
def j2_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-endpoint-style dim lookup (db.py:91-95) — fact⋈dim hash
    join, then exact decimal agg.  The dim (part) scales with SF, so
    no compile-time broadcast hint: AQE picks broadcast at runtime
    when the actual size is small (it is at test scale) and degrades
    to a shuffled join at 100 TB instead of OOMing the driver."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # factors cast to decimal BEFORE multiplying: decimal×decimal is
    # exact, so no engine-specific .005-boundary rounding can creep in
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(DEC)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
        .orderBy("p_brand")
    )


def j3_anti_join_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier⟕anti seen (extract_product_urls.py:39-41): orders whose
    customer is NOT in the 'seen' set (negative-balance customers).

    shuffle_hash, not broadcast: this query is the named demonstrator
    of the J3 frontier⟕seen shape, and a seen set is unbounded — it
    must teach the same plan the real crawl path uses
    (frontier.py seen-set anti-joins), not the broadcast anti-pattern."""
    orders = _t(spark, sf_dir, "orders")
    seen = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    return (
        orders.join(
            seen.select("c_custkey").hint("shuffle_hash"),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_price"),
        )
    )


def j7_semi_join_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple-membership semi-join (precision_recall.py:176-177)."""
    li = _t(spark, sf_dir, "lineitem")
    big = _t(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return (
        li.join(
            big.select("p_partkey"),  # scales with SF — AQE decides
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"))
        .orderBy("l_returnflag")
    )


def j5_keyword_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-map canonicalization join (scrape_pp.py:137-146): rewrite
    via a broadcast lookup table (nation -> region name)."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_balance"),
        )
        .orderBy("region_name")
    )


def j6_topdegree_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corruption⋈top-degree semi-join
    (search_validation_playwright.py:165-212): restrict facts to the
    top-5 highest-degree keys, excluding self-matches."""
    orders = _t(spark, sf_dir, "orders")
    top = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("degree"))
        .orderBy(F.desc("degree"), F.asc("o_custkey"))
        .limit(5)
        .select(F.col("o_custkey").alias("top_custkey"))
    )
    return (
        orders.join(F.broadcast(top), orders.o_custkey == F.col("top_custkey"), "left_semi")
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.max(F.col("o_totalprice")).alias("max_price"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------- windows
def w1_carry_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heading carry-forward fold (scrape_pp.py:26-47): last non-null
    marker over an ordered per-key stream — the reference's sequential
    `prev`-tag state machine as a window function."""
    ev = _t(spark, sf_dir, "events")
    marker = F.when(F.col("event_type") == "signup", F.col("event_id"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.last(marker, ignorenulls=True).over(w).alias("session_marker"),
    ).orderBy("user_id", "event_id")


def w2_politeness_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host politeness slot assignment (W2; reference analog: fixed
    sleeps scrape_eccomerce.py:121-124) — row_number per key."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("long").alias("slot"),
    ).withColumn("eligible", F.col("slot") <= 3).orderBy("user_id", "event_id")


def o3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5-per-group (llm_validation_playwright.py:35,58-60)."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rank_in_segment", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_segment") <= 5)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rank_in_segment")
        .orderBy("c_mktsegment", "rank_in_segment")
    )


def w_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-key cumulative sum (decimal-exact prefix sums)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
    ).orderBy("user_id", "event_id")


FUNNEL_SCALE = 1_000_000


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered event funnel over the events stream: users who
    viewed, then clicked AFTER their first view, then purchased AFTER
    that first qualifying click — the canonical product-analytics
    funnel, one row out.  Each stage is one groupBy-min plus an
    equi-join on user_id with the time bound riding as a range filter
    (never a cartesian); conversion ratios are fixed-point integers.

    Scale shape: stage frames shrink monotonically (viewers ⊇
    clickers ⊇ purchasers); every join keys on user_id, so all three
    stages co-partition on one exchange at scale."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter("event_type = 'view'")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter("event_type = 'click'")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter("event_type = 'purchase'")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").cast("long").alias("n_viewed"))
        .crossJoin(F.broadcast(s2.agg(F.count("*").cast("long").alias("n_clicked"))))
        .crossJoin(F.broadcast(s3.agg(F.count("*").cast("long").alias("n_purchased"))))
        .selectExpr(
            "n_viewed",
            "n_clicked",
            "n_purchased",
            f"if(n_viewed = 0, 0L, n_clicked * {FUNNEL_SCALE}L div n_viewed)"
            " AS click_rate_units",
            f"if(n_clicked = 0, 0L, n_purchased * {FUNNEL_SCALE}L div n_clicked)"
            " AS purchase_rate_units",
        )
    )


def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the events' JSON props column
    (``{"k": <int>}``) — the engine's JSON surface (the reference
    reads JSON site configs and LLM JSON replies everywhere, e.g.
    util/llm/llm_connector.py responses and config/*.json): per event
    type, count/min/max/sum of the extracted integer.  Extraction is
    ``get_json_object`` — row-local JVM codegen, no Python."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").cast("long").alias("k_sum"),
        )
        .orderBy("event_type")
    )


#: partition fan the skew report simulates (a cluster-shuffle width)
SKEW_PARTS = 32
SKEW_SCALE = 1_000


def shuffle_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational skew audit for a planned shuffle: hash the shuffle
    key (here: the crawl host of each document) into SKEW_PARTS
    buckets exactly as a hash partitioner would and report each
    bucket's row count plus the corpus-wide imbalance factor
    ``max/avg`` in fixed-point — the number that predicts the straggler
    task BEFORE the job runs.  One groupBy over row-local bucket ids;
    output is O(partitions).  (The synthetic host key is ~35% hot —
    same construction as the CMS stream — so the report shows real
    imbalance, not a uniform strawman.)"""
    docs = _t(spark, sf_dir, "documents")
    buckets = (
        docs.selectExpr(f"{hot_host_spark('doc_id')} AS host")
        .selectExpr(
            f"cast(conv(substr(md5(host), 1, 15), 16, 10) as bigint)"
            f" % {SKEW_PARTS} AS bucket"
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    totals = buckets.agg(
        F.sum("n_rows").cast("long").alias("total"),
        F.max("n_rows").cast("long").alias("mx"),
        F.count("*").cast("long").alias("nb"),
    )
    return (
        buckets.crossJoin(F.broadcast(totals))
        .selectExpr(
            "bucket",
            "n_rows",
            f"mx * {SKEW_SCALE}L * nb div total AS imbalance_units",
        )
        .orderBy("bucket")
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix over the event stream: users
    grouped by first-seen week (the cohort), each later week's activity
    counted as (cohort_week, week_offset, n_active) plus the cohort
    size and a fixed-point retention ratio — the standard
    product-analytics triangle, and for a crawler the same shape as
    "of the hosts first seen in round R, how many still serve new
    URLs k rounds later".

    Weeks are integer epoch-weeks (epoch div 604800 — no calendar/
    timezone arithmetic, identical in both engines).  Scale shape:
    first-seen is one groupBy-min on user_id; activity distinct-weeks
    one agg; the matrix join keys on user_id (co-partitioned)."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "user_id",
        "cast(floor(unix_timestamp(ts) / 604800) as long) AS week",
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    sizes = first.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    matrix = (
        active.join(first, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    return (
        matrix.join(sizes, "cohort_week")
        .selectExpr(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            f"n_active * {FUNNEL_SCALE}L div cohort_size AS retention_units",
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------- sorts
def o2_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (AQL SORT … LIMIT; O2) — TakeOrderedAndProject."""
    orders = _t(spark, sf_dir, "orders")
    return orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def o4_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'random' sample-50 (entity_analysis.py:137-138
    shuffle+slice) — md5-keyed order is the seeded shuffle both engines
    agree on."""
    docs = _t(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("sample42:"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "lang", key.alias("shuffle_key"))
        .orderBy("shuffle_key")
        .limit(50)
    )


# ---------------------------------------------------------------- set ops
def u4_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union+distinct merge-with-official (extract_product_urls.py:
    146-152)."""
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct().orderBy("c_custkey")


def u6_except_missed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall 'except' set (precision_recall.py:301-303): keys present
    in facts but missing from the reference set."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.select(F.col("o_orderkey").alias("orderkey"))
        .exceptAll(li.select(F.col("l_orderkey").alias("orderkey")))
        .distinct()
        .orderBy("orderkey")
    )


# ---------------------------------------------------------------- strings
def f_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function battery F1-F15 (db.py:46-50,66;
    content_cleaner.py:5-6; precision_recall.py:17-22) over documents."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        F.regexp_replace(F.col("source"), "[^a-zA-Z0-9_-]", "_").alias("node_key"),
        F.regexp_replace(norm, "\\s+", " ").alias("norm_text"),
        F.md5(norm).alias("fingerprint"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
        F.substring_index(F.col("text"), " ", 1).alias("first_token"),
    ).orderBy("doc_id")


def f14_word_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence/token split + length predicate + frequency top-k
    (precision_recall.py:327; llm_validation_playwright.py:94-97)."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word")).filter(
        F.length("word") >= 5
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(20)
    )


# ---------------------------------------------------------------- TPC-H-ish
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic scan→filter→agg shape; decimal-exact measures."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1997-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join narrowed by per-table filters BEFORE
    the joins (Catalyst pushes them into the scans), revenue top-10.
    customer scales with SF so it carries no broadcast hint (AQE
    broadcasts the filtered segment only when the runtime size is
    small); orders⋈lineitem shuffles on the join key only after both
    sides are pruned."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join against the fact chain with the
    customer-nation == supplier-nation colocation predicate.  Only the
    fixed-cardinality dims (nation/region) are broadcast by hint;
    supplier/customer scale with SF, so AQE sizes those joins at
    runtime."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation_name"))
    )


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single scan, every predicate pushed to parquet,
    one global decimal agg — the pushdown/pruning showcase."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC))
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


ORACLE_SQL: dict[str, str] = {
    "tpch_q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "tpch_q5_local_supplier_volume": """
        SELECT n_name AS nation_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name ORDER BY revenue DESC, nation_name
    """,
    "tpch_q6_forecast_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "a1_degree_topk": """
        SELECT o_custkey, count(*) AS degree
        FROM orders GROUP BY o_custkey
        ORDER BY degree DESC, o_custkey LIMIT 10
    """,
    "a2_a4_validation_weights": """
        WITH agg AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'purchase' THEN value END) AS normal_best,
                 max(CASE WHEN event_type = 'error' THEN value END) AS opposing_best
          FROM events GROUP BY user_id
        )
        SELECT user_id, normal_best, opposing_best,
               CASE WHEN coalesce(normal_best,0)+coalesce(opposing_best,0) > 0
                    THEN coalesce(normal_best,0)/(coalesce(normal_best,0)+coalesce(opposing_best,0))
                    ELSE 0.5 END AS weight,
               CAST(CASE WHEN coalesce(normal_best,0) > coalesce(opposing_best,0)
                    THEN 1 ELSE 0 END AS BIGINT) AS vote
        FROM agg ORDER BY user_id
    """,
    "a6_precision_recall": """
        WITH agg AS (
          SELECT l_orderkey,
            sum(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS tp,
            sum(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS fp,
            sum(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS fn
          FROM lineitem GROUP BY l_orderkey
        )
        SELECT l_orderkey,
               CAST(tp AS DOUBLE) AS tp_qty, CAST(fp AS DOUBLE) AS fp_qty,
               CAST(fn AS DOUBLE) AS fn_qty,
               CASE WHEN CAST(tp AS DOUBLE)+CAST(fp AS DOUBLE) > 0
                    THEN CAST(tp AS DOUBLE)/(CAST(tp AS DOUBLE)+CAST(fp AS DOUBLE)) ELSE 0.0 END AS precision,
               CASE WHEN CAST(tp AS DOUBLE)+CAST(fn AS DOUBLE) > 0
                    THEN CAST(tp AS DOUBLE)/(CAST(tp AS DOUBLE)+CAST(fn AS DOUBLE)) ELSE 0.0 END AS recall
        FROM agg ORDER BY l_orderkey
    """,
    "a7_macro_average": """
        WITH agg AS (
          SELECT l_orderkey,
                 sum(CASE WHEN l_returnflag='A' THEN 1 ELSE 0 END) AS tp_n,
                 sum(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) AS fp_n
          FROM lineitem GROUP BY l_orderkey
        ), per AS (
          SELECT CASE WHEN tp_n+fp_n > 0
                      THEN CAST(tp_n AS DOUBLE)/CAST(tp_n+fp_n AS DOUBLE)
                      ELSE 0.0 END AS precision
          FROM agg
        ), tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(sum(CAST(precision AS DECIMAL(18,9))) AS DOUBLE) AS sum_precision
          FROM per
        )
        SELECT n_groups, sum_precision, sum_precision/n_groups AS macro_precision
        FROM tot
    """,
    "a10_accuracy_summary": """
        SELECT CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
               CAST(sum(CASE WHEN event_type<>'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN event_type<>'error' THEN 1 ELSE 0 END) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS accuracy
        FROM events
    """,
    "a11_entity_union": """
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS entity FROM documents
        )
        SELECT source, CAST(count(DISTINCT entity) AS BIGINT) AS n_entities
        FROM toks WHERE entity <> '' GROUP BY source ORDER BY source
    """,
    "j2_broadcast_dim_join": """
        SELECT p_brand,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand
    """,
    "j3_anti_join_seen": """
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_acctbal < 0 AND c.c_custkey = o.o_custkey)
    """,
    "cohort_retention": f"""
        WITH ev AS (
          SELECT user_id,
                 CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
          FROM events),
        first AS (
          SELECT user_id, min(week) AS cohort_week
          FROM ev GROUP BY user_id),
        active AS (SELECT DISTINCT user_id, week FROM ev),
        sizes AS (
          SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
          FROM first GROUP BY cohort_week),
        matrix AS (
          SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
                 CAST(count(*) AS BIGINT) AS n_active
          FROM active a JOIN first f ON a.user_id = f.user_id
          GROUP BY 1, 2)
        SELECT m.cohort_week, m.week_offset, m.n_active, s.cohort_size,
               m.n_active * {FUNNEL_SCALE} // s.cohort_size
                 AS retention_units
        FROM matrix m JOIN sizes s ON m.cohort_week = s.cohort_week
        ORDER BY m.cohort_week, m.week_offset
    """,
    "json_props_stats": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(k) AS BIGINT) AS k_min,
               CAST(max(k) AS BIGINT) AS k_max,
               CAST(sum(k) AS BIGINT) AS k_sum
        FROM (
          SELECT event_type,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k
          FROM events)
        WHERE k IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    "shuffle_skew_report": f"""
        WITH b AS (
          SELECT CAST('0x' || substr(md5(
                   {hot_host_duck("doc_id")}
                 ), 1, 15) AS BIGINT) % {SKEW_PARTS} AS bucket
          FROM documents),
        c AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows
          FROM b GROUP BY bucket),
        t AS (
          SELECT CAST(sum(n_rows) AS BIGINT) AS total,
                 CAST(max(n_rows) AS BIGINT) AS mx,
                 CAST(count(*) AS BIGINT) AS nb
          FROM c)
        SELECT bucket, n_rows,
               mx * {SKEW_SCALE} * nb // total AS imbalance_units
        FROM c CROSS JOIN t ORDER BY bucket
    """,
    "funnel_conversion": f"""
        WITH s1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t1
          GROUP BY e.user_id),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          GROUP BY e.user_id),
        c1 AS (SELECT CAST(count(*) AS BIGINT) AS n_viewed FROM s1),
        c2 AS (SELECT CAST(count(*) AS BIGINT) AS n_clicked FROM s2),
        c3 AS (SELECT CAST(count(*) AS BIGINT) AS n_purchased FROM s3)
        SELECT n_viewed, n_clicked, n_purchased,
               CAST(CASE WHEN n_viewed = 0 THEN 0
                    ELSE n_clicked * {FUNNEL_SCALE} // n_viewed END
                    AS BIGINT) AS click_rate_units,
               CAST(CASE WHEN n_clicked = 0 THEN 0
                    ELSE n_purchased * {FUNNEL_SCALE} // n_clicked END
                    AS BIGINT) AS purchase_rate_units
        FROM c1 CROSS JOIN c2 CROSS JOIN c3
    """,
    "j7_semi_join_membership": """
        SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem l
        WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_size > 40 AND p.p_partkey = l.l_partkey)
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "j5_keyword_canonicalization": """
        SELECT r_name AS region_name,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY region_name
    """,
    "j6_topdegree_semi": """
        WITH top AS (
          SELECT o_custkey AS top_custkey, count(*) AS degree
          FROM orders GROUP BY o_custkey
          ORDER BY degree DESC, o_custkey LIMIT 5
        )
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
               max(o_totalprice) AS max_price
        FROM orders WHERE o_custkey IN (SELECT top_custkey FROM top)
        GROUP BY o_custkey ORDER BY o_custkey
    """,
    "w1_carry_forward": """
        SELECT user_id, event_id,
               last_value(CASE WHEN event_type='signup' THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_marker
        FROM events ORDER BY user_id, event_id
    """,
    "w2_politeness_slots": """
        SELECT user_id, event_id,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS slot,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 3 AS eligible
        FROM events ORDER BY user_id, event_id
    """,
    "o3_topk_per_group": """
        WITH ranked AS (
          SELECT c_mktsegment, c_custkey, c_acctbal,
                 CAST(row_number() OVER (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rank_in_segment
          FROM customer
        )
        SELECT * FROM ranked WHERE rank_in_segment <= 5
        ORDER BY c_mktsegment, rank_in_segment
    """,
    "w_running_total": """
        SELECT user_id, event_id,
               CAST(sum(CAST(value AS DECIMAL(18,2)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        FROM events ORDER BY user_id, event_id
    """,
    "o2_global_topk": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "o4_seeded_sample": """
        SELECT doc_id, lang, md5('sample42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM documents ORDER BY shuffle_key LIMIT 50
    """,
    "u4_union_distinct": """
        SELECT DISTINCT c_custkey FROM (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
          UNION ALL
          SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        ) ORDER BY c_custkey
    """,
    "u6_except_missed": """
        SELECT DISTINCT o_orderkey AS orderkey FROM orders
        WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        ORDER BY orderkey
    """,
    "f_string_suite": """
        SELECT doc_id,
               regexp_replace(source, '[^a-zA-Z0-9_-]', '_', 'g') AS node_key,
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm_text,
               md5(lower(trim(text))) AS fingerprint,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_computed,
               string_split(text, ' ')[1] AS first_token
        FROM documents ORDER BY doc_id
    """,
    "f14_word_topk": """
        WITH words AS (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents
        )
        SELECT word, CAST(count(*) AS BIGINT) AS freq
        FROM words WHERE length(word) >= 5
        GROUP BY word ORDER BY freq DESC, word LIMIT 20
    """,
    "tpch_q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1997-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
}

QUERIES = {
    "a1_degree_topk": a1_degree_topk,
    "a2_a4_validation_weights": a2_a4_validation_weights,
    "a6_precision_recall": a6_precision_recall,
    "a7_macro_average": a7_macro_average,
    "a10_accuracy_summary": a10_accuracy_summary,
    "a11_entity_union": a11_entity_union,
    "j2_broadcast_dim_join": j2_broadcast_dim_join,
    "j3_anti_join_seen": j3_anti_join_seen,
    "j7_semi_join_membership": j7_semi_join_membership,
    "j5_keyword_canonicalization": j5_keyword_canonicalization,
    "j6_topdegree_semi": j6_topdegree_semi,
    "w1_carry_forward": w1_carry_forward,
    "w2_politeness_slots": w2_politeness_slots,
    "o3_topk_per_group": o3_topk_per_group,
    "w_running_total": w_running_total,
    "funnel_conversion": funnel_conversion,
    "json_props_stats": json_props_stats,
    "shuffle_skew_report": shuffle_skew_report,
    "cohort_retention": cohort_retention,
    "o2_global_topk": o2_global_topk,
    "o4_seeded_sample": o4_seeded_sample,
    "u4_union_distinct": u4_union_distinct,
    "u6_except_missed": u6_except_missed,
    "f_string_suite": f_string_suite,
    "f14_word_topk": f14_word_topk,
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q5_local_supplier_volume": tpch_q5_local_supplier_volume,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
}
