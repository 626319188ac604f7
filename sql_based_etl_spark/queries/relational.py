"""Relational operator coverage (SURVEY.md §2b/§2c + implied extensions).

Each query is a ``(spark, sf_dir) -> DataFrame`` built with the
DataFrame API (Catalyst plans it; no hand scheduling), paired with a
DuckDB oracle in ``ORACLES``. Reference-surface citations:

- projection/alias/literal/cast:   scd2-job.ipynb:143-145, 275-277, 309
- filter =/<>/, AND conjunction:   scd2-job.ipynb:313-314, 346, 444
- inner equi-join w/ aliases:      scd2-job.ipynb:310-312
- UNION (distinct):                scd2-job.ipynb:316-319
- md5/concat (null-propagating):   scd2-job.ipynb:144, 276
- wordcount (native job, implied): native-spark-job-scheduler.yaml:4,12
- expired-count agg (implied):     scd2-job.ipynb:390-392

Everything else (windows, rollup, pivot, semi/anti joins, sessionize,
as-of join) is the extension checklist: free via Spark SQL built-ins,
designed so the same plan survives 100 TB (broadcast dims, partial
aggregation, no driver-side loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_based_etl_spark.queries._util import MICROS, load, micros, xsum


# --- TPC-H-ish core -------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan + filter + hash aggregate.

    Partial (map-side) aggregation on 6 grouped columns; the filter and
    the 8-column projection push into the parquet scan. Sums are exact
    decimals so results are reproducible at any parallelism.
    """
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            xsum(F.col("l_quantity")).alias("sum_qty"),
            xsum(F.col("l_extendedprice")).alias("sum_base_price"),
            xsum(disc_price).alias("sum_disc_price"),
            xsum(charge).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + agg + deterministic top-10.

    customer is the small side → Catalyst broadcasts it; lineitem⋈orders
    shuffles on the order key only once.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(xsum(disc_price).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS → left-semi join with a non-equi residual
    condition (shipped more than 60 days after order date)."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style snowflake join: two broadcastable dims (nation,
    region) + supplier; co-located customer/supplier nation condition."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(xsum(disc_price).alias("revenue"))
    )


def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan-filter-aggregate; all three predicates
    push down to the parquet reader."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(xsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


# --- reference SQL surface (R1-R8, F1-F3) ---------------------------------


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1/R5/R6: projection + aliasing + <>/AND filters
    (scd2-job.ipynb:143-145,313-314)."""
    o = load(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderstatus") != "F") & (F.col("o_totalprice") > 1000.0)).select(
        "o_orderkey",
        "o_totalprice",
        F.upper("o_orderpriority").alias("priority_uc"),
        F.when(F.col("o_totalprice") > 200000.0, "big").otherwise("small").alias("size_class"),
    )


def q_literal_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2/R3/R4: star + literal + NULL-cast projection, the SCD2 staging
    shape `SELECT NULL AS mergeKey, new.*` (scd2-job.ipynb:309,143-144)."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        F.lit(None).cast("string").alias("merge_key"),
        F.lit(1).alias("iscurrent"),
        "*",
    )


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8: SQL UNION deduplicates (scd2-job.ipynb:316-319) — DataFrame
    union() is UNION ALL, so .distinct() is required for parity."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue: distinct suppliers per (brand, size) for
    non-ECONOMY parts, excluding suppliers with negative balance via a
    NOT IN subquery (the anti-join-with-null-semantics shape)."""
    p = load(spark, sf_dir, "part").filter(~F.col("p_type").startswith("ECONOMY"))
    li = load(spark, sf_dir, "lineitem")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analogue: average yearly revenue lost if small-quantity
    orders (below 20%% of the part's mean quantity) were not taken.
    The correlated scalar-avg subquery is rewritten exactly:
    ``q < 0.2 * sum/n  <=>  5*q*n < sum`` over integer micros, so both
    engines compare identical int64s (no float avg in the predicate)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15)
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(micros(F.col("l_quantity"))).alias("sum_q_micros"),
        F.count(F.lit(1)).alias("n_q"),
    )
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, "l_partkey")
        .filter(F.lit(5) * micros(F.col("l_quantity")) * F.col("n_q") < F.col("sum_q_micros"))
    )
    return joined.agg(
        F.round(F.sum(micros(F.col("l_extendedprice"))) / F.lit(MICROS) / 7.0, 6).alias(
            "avg_yearly"
        )
    )


def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analogue: a supplier nation's share of STANDARD-part
    revenue sold to AMERICA-region customers, by order year — the
    widest join tree in the suite (lineitem ⋈ part ⋈ orders ⋈ customer
    ⋈ supplier ⋈ 2×nation ⋈ region). Share = conditional sum / total
    sum over identical int64-micro revenues, one double division."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type").startswith("STANDARD"))
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select(F.col("r_regionkey").alias("c_rk"))
    )
    rev = micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    base = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.c_nk)
        .join(F.broadcast(n2), s.s_nationkey == n2.s_nk)
        .join(F.broadcast(r), "c_rk")
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("rev_micros"),
            F.col("supp_nation"),
        )
    )
    target = F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("rev_micros")).otherwise(F.lit(0)))
    return base.groupBy("o_year").agg(
        F.round(target / F.sum("rev_micros"), 6).alias("mkt_share")
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analogue: distribution of per-customer order counts,
    counting only non-urgent orders — a LEFT join with an extra join-
    side predicate (customers with zero qualifying orders must still
    appear with c_count = 0), then a second aggregation over the first."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analogue: supplier(s) with the maximum Q1-1995 revenue
    — an aggregate view joined against its own scalar max (ties kept,
    like the spec). Revenue compared in exact int64 micros so the
    max-equality predicate is bit-stable in both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1995-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "rev_micros"
        )
    )
    top = rev.agg(F.max("rev_micros").alias("rev_micros"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), "rev_micros")
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_micros") / F.lit(MICROS), 6).alias("total_revenue"),
        )
    )


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue through an explicitly salted fact⋈dim join
    (operators/joins.py) — the skew-mitigation lever for hot keys that
    AQE's sort-merge-only skew split can't reach. The salt must be
    invisible: the oracle is the plain join."""
    from sql_based_etl_spark.operators.joins import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_micros"),
    )
    p = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), "p_brand"
    )
    return (
        salted_join(li, p, "pk", how="inner", salt=8)
        .groupBy("p_brand")
        .agg((F.sum("rev_micros") / F.lit(MICROS)).alias("revenue"))
    )


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface: per-order sorted quantity vector plus
    size / element_at / slice / array_contains / reverse — built on one
    sort_array(collect_list()) so the vector is deterministic (collect
    order is not; the sort makes both engines agree)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 1000 == 0)
    arr = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list(micros(F.col("l_quantity")))).alias("q"))
    )
    return arr.select(
        "l_orderkey",
        F.size("q").alias("n_items"),
        (F.element_at("q", 1) / F.lit(MICROS)).alias("min_qty"),
        (F.element_at("q", -1) / F.lit(MICROS)).alias("max_qty"),
        F.array_contains("q", F.lit(1_000_000)).alias("has_qty_1"),
        (
            F.aggregate(F.slice("q", 1, 3), F.lit(0).cast("long"), lambda a, x: a + x)
            / F.lit(MICROS)
        ).alias("sum_small3"),
    )


def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile() window coverage: quartile bucket of customers by account
    balance within market segment (unique custkey tiebreak so bucket
    boundaries are deterministic), then per-bucket aggregates."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    binned = c.select(
        "c_mktsegment",
        micros(F.col("c_acctbal")).alias("bal_micros"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return binned.groupBy("c_mktsegment", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("bal_micros") / F.lit(MICROS)).alias("sum_bal"),
    )


def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations beyond UNION: INTERSECT and EXCEPT (both
    distinct, per SQL semantics — DataFrame intersect()/exceptAll()
    differ exactly here). Market segments of big spenders vs overdrawn
    customers, labeled by which set operation produced them."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    big = (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_totalprice") > 200000.0)
        .select(F.col("c_mktsegment").alias("segment"))
    )
    overdrawn = c.filter(F.col("c_acctbal") < 0).select(
        F.col("c_mktsegment").alias("segment")
    )
    both = big.intersect(overdrawn).select(F.lit("both").alias("which"), "segment")
    # subtract == SQL EXCEPT (distinct); exceptAll would only remove as
    # many duplicates as the right side holds
    only_big = big.subtract(overdrawn).select(F.lit("only_big").alias("which"), "segment")
    return both.unionByName(only_big)


def q_md5_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: md5(concat(...)) row checksum with *null-propagating*
    concat — any NULL input nulls the checksum (scd2-job.ipynb:144,276).
    nullif() manufactures NULLs to prove the semantic."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.concat(F.col("c_name"), F.expr("nullif(c_mktsegment, 'MACHINERY')"))).alias(
            "checksum"
        ),
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi: customers having at least one P order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti: customers with no orders at all."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


def q_outer_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving empty groups (count(col) skips nulls)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --- windows / grouping extensions ----------------------------------------


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment: window row_number with a unique
    tiebreaker (deterministic under any partitioning)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per supplier: ordered window sum over exact
    decimals with a total ordering (shipdate, orderkey, linenumber)."""
    l = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(micros(F.col("l_extendedprice"))).over(w) / F.lit(MICROS)).alias("running_rev"),
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: subtotals + grand total."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(xsum(F.col("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (oracle: FILTERed counts)."""
    l = load(spark, sf_dir, "lineitem")
    p = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
    )


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) alongside plain count (expand-based plan)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n"),
    )


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction + grouped exact-decimal totals."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(F.count(F.lit(1)).alias("n"), xsum(F.col("o_totalprice")).alias("total"))
    )


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function suite: upper/substring/length/replace."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 10).alias("name10"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_type", " ", "_").alias("type_us"),
    )


def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's native-job wordcount
    (native-spark-job-scheduler.yaml:4,12): explode(split) + count."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --- time-series extensions ------------------------------------------------


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap > 30 min starts a new session; cumulative
    sum of the start flags numbers sessions per user. Single shuffle on
    user_id serves both windows."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0)
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(w))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
    )


def q_event_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window aggregate over the event stream (batch
    form; the streaming form is queries/streaming.py)."""
    e = load(spark, sf_dir, "events")
    bucket = (F.floor(F.col("ts").cast("long") / 300) * 300).alias("bucket_epoch")
    return (
        e.groupBy(bucket, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            xsum(F.col("value")).alias("sum_value"),
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): for each purchase event,
    the latest click by the same user at or before it.

    Scalable pattern: union both sides tagged, one window partitioned by
    user ordered by (ts, kind, event_id), last(click, ignorenulls) —
    one shuffle total, no pairwise join blow-up. Clicks sort before
    purchases at equal ts so ties are included, and later event_id wins
    among equal click timestamps (matches the oracle's max(ts,id))."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", F.coalesce("click_id", "purchase_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_id", F.last("click_id", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("purchase_id").isNotNull()).select(
        "purchase_id",
        "user_id",
        F.col("last_click_id").alias("click_id"),
    )


def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style bi-nation shipping volume: revenue between two
    nations by ship year, in both directions. Both nation dims
    broadcast; the fact joins shuffle on their keys once."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(xsum(disc_price).alias("revenue"))
    )


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by revenue lost to returned
    items in one quarter (join + agg + deterministic top-k)."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(xsum(disc_price).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo share: conditional aggregation over a
    broadcast part join. Both sums are exact int64 micros; the final
    ratio is one double division (bit-identical across engines)."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    disc_micros = micros(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc_micros).otherwise(F.lit(0))).alias(
                "promo_micros"
            ),
            F.sum(disc_micros).alias("total_micros"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("promo_micros") / F.col("total_micros"), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: HAVING on a grouped sum,
    then join back to orders/customer. Quantities are integral doubles,
    so the per-order sum is exact at any parallelism."""
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300.0)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style OR-of-ANDs predicate over a part join: exercises
    disjunctive filter planning (the shared l_partkey=p_partkey conjunct
    still drives the join; per-branch residuals evaluate post-join)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(xsum(disc_price).alias("revenue"))
    )


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: customers with above-average account balance
    and no recent orders (scalar aggregate subquery + anti join).

    The above-average compare is exact integer cross-multiplication
    (micros(bal) * n_customers > sum_micros) — no double average whose
    accumulation order could differ between engines. The global
    aggregate is one tiny row, joined in by broadcast."""
    c = load(spark, sf_dir, "customer")
    stats = c.agg(
        F.sum(micros(F.col("c_acctbal"))).alias("sum_bal_micros"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp")
    )
    rich = (
        c.join(F.broadcast(stats))
        .filter(micros(F.col("c_acctbal")) * F.col("n_cust") > F.col("sum_bal_micros"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        (F.sum(micros(F.col("c_acctbal"))) / F.lit(MICROS)).alias("totacctbal"),
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events props column: per
    event_type count + exact integer sum of the extracted value
    (get_json_object stays JVM-side; no UDF)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90) of quantity per
    return flag. Uses exact ``percentile`` (not approx_percentile —
    sketch-based results are not engine-reproducible); quantities are
    integral doubles so interpolation arithmetic is exact, rounded to
    absorb formula-ulp differences."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel signup → click → purchase: per user, the
    first signup, the first click at-or-after it, the first purchase
    at-or-after that; count users reaching each stage.

    Built as conditional min-aggregates + broadcastable per-user step
    tables — each step is one map-side-combinable agg + one join, no
    window over the full event log."""
    e = load(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("signup_ts").alias("n_signup"),
            F.count("click_ts").alias("n_click_after_signup"),
            F.count("purchase_ts").alias("n_purchase_after_click"),
        )
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: for each purchase, count same-user clicks in the
    preceding hour (inclusive bounds).

    The user_id equi-conjunct drives a hash join; the time-range
    residual evaluates post-match, so this never degenerates into a
    cross product. At 100 TB the additional lever is bucketing both
    sides by user_id so the hash join is co-located, or time-bucketing
    (join on (user, hour_bucket) ± 1) when a single user's history is
    too long."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("c_ts")
    )
    cond = (
        (purchases.user_id == clicks.user_id)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.c_ts <= purchases.p_ts)
    )
    return (
        purchases.join(clicks, cond, "left")
        .groupBy("purchase_id", purchases.user_id.alias("user_id"))
        .agg(F.count("c_ts").alias("n_clicks_1h_before"))
    )


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: minute-bucket
    aggregates per event type, re-aggregated to hourly — the hourly
    level consumes the minute AGGREGATE, not the raw log (the
    continuous-aggregate pattern: at 100 TB the fine level is the
    materialized hypertable and every coarser resolution is a cheap
    rollup over it; counts and int64-micros sums compose exactly)."""
    e = load(spark, sf_dir, "events")
    minute = e.groupBy(
        F.date_trunc("minute", "ts").alias("m_bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(micros(F.col("value"))).alias("value_micros"),
    )
    return (
        minute.groupBy(
            F.date_format(F.date_trunc("hour", "m_bucket"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("value_micros") / F.lit(MICROS)).alias("sum_value"),
            F.count(F.lit(1)).alias("n_active_minutes"),
        )
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with mixed granularities + grouping_id to
    disambiguate the all-rows set from genuine NULL groups. One
    shuffle; Spark expands the sets with partial aggregation per set."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n,
               -- literal 1000000.0 parses as DECIMAL in Spark SQL (vs
               -- DOUBLE in DuckDB); cast so both divide in doubles
               sum(CAST(round(o_totalprice * CAST(1000000.0 AS DOUBLE)) AS BIGINT))
                   / CAST(1000000.0 AS DOUBLE) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample of orders by key hash (md5 of the
    order key, first 8 hex chars mod 100 < 10), then an aggregate over
    the sample. Unlike TABLESAMPLE/rand() this is reproducible in any
    engine and stable under repartitioning — the standard idiom for
    consistent samples of a 100 TB fact table (and for sampled joins:
    hashing the JOIN KEY keeps related rows together)."""
    o = load(spark, sf_dir, "orders")
    digits = F.lit("0123456789abcdef")
    m = F.md5(F.col("o_orderkey").cast("string"))
    h = F.lit(0).cast("bigint")
    for k in range(8):
        h = h * 16 + (F.instr(digits, F.substring(m, k + 1, 1)) - 1).cast("bigint")
    return (
        o.filter(h % 100 < 10)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            (F.sum(micros(F.col("o_totalprice"))) / F.lit(MICROS)).alias("sampled_total"),
        )
    )


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (Spark's built-in gap-based session
    operator, usable in batch and streaming): 30-minute gap, per-user
    event counts with session bounds. Complements the gaps-and-islands
    formulation in :func:`q_sessionize` — the built-in closes a session
    when the gap is ≥ the duration (half-open window), and the oracle
    reproduces exactly that boundary."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def q_moving_sum_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per event, the sum of same-user values
    in the trailing hour (inclusive). RANGE frames include peer rows,
    so the result is deterministic even with tied timestamps; ordering
    is on epoch microseconds so both engines bound the frame with
    integer arithmetic (no sub-second truncation)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        (F.sum(micros(F.col("value"))).over(w) / F.lit(MICROS)).alias("sum_value_1h"),
    )


def q_exact_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares slope of value vs time, computed with the
    closed form (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) over EXACT integer
    sums: x = whole seconds since the user's first event, y = value
    micros, partial sums carried in DECIMAL(38). Built-in regr_slope
    accumulates doubles (order-dependent across engines); this version
    is reproducible anywhere at any parallelism. Two shuffles: the
    per-user min, then the aggregate."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("tmic"), micros(F.col("value")).alias("y")
    )
    mins = e.groupBy("user_id").agg(F.min("tmic").alias("t0"))
    xy = e.join(mins, "user_id").select(
        "user_id",
        F.expr("(tmic - t0) div 1000000").alias("x"),
        "y",
    )
    dec = "decimal(38,0)"
    agg = xy.groupBy("user_id").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return (
        agg.filter(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0)
        .select(
            "user_id",
            F.round(num / den / F.lit(MICROS), 12).alias("slope_per_sec"),
        )
    )


# --- remaining TPC-H analogues (schema gaps bridged, shapes preserved) ----
#
# The testdata has no partsupp table and no l_shipmode / l_commitdate /
# l_receiptdate columns, so Q2/Q9/Q11/Q12/Q20/Q21 cannot be transcribed
# literally. Each analogue below keeps the query's *relational shape*
# (the thing that matters for engine coverage and the 100 TB plan) and
# substitutes the nearest available column, documented per query.


def q02_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analogue — correlated-min subquery + 5-way join + ordered
    top-k. Schema bridge: distinct ``lineitem`` (part, supplier) pairs
    stand in for ``partsupp``; ``s_acctbal`` for ``ps_supplycost``.

    For each LARGE size-8 part, the EUROPE supplier(s) with the minimum
    account balance among those who ever shipped it. The correlated min
    is one window (min over part) + filter — per-part state only, no
    re-scan, and the tiny dims broadcast."""
    ps = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 8) & (F.col("p_type") == "LARGE")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    base = (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(s, ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        base.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(20)
    )


def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue — LIKE-filtered part, 5-way join, computed
    profit measure, group by (nation, year). Schema bridge: unit cost
    ``ps_supplycost`` → ``0.6 * p_retailprice``.

    Profit is summed with the integer-micros pattern over a double
    expression written identically in both engines (same IEEE op order
    → identical bits → identical rounding)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(micros(profit)) / F.lit(MICROS)).alias("sum_profit"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analogue — per-key aggregate HAVING a global-scalar
    threshold. Schema bridge: a part's "stock value held by NATION_7
    suppliers" = extended price shipped by them (no partsupp).

    The global total is a 1-row aggregate broadcast into the filter (no
    driver collect); threshold compare is exact int64 micros × 1000."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    base = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    per_part = base.groupBy("l_partkey").agg(
        F.sum(micros(F.col("l_extendedprice"))).alias("value_micros")
    )
    total = per_part.agg(F.sum("value_micros").alias("total_micros"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_micros") * F.lit(1000) > F.col("total_micros"))
        .select(
            "l_partkey",
            (F.col("value_micros") / F.lit(MICROS)).alias("value"),
        )
    )


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue — join + CASE-bucketed priority counts per
    class. Schema bridge: no l_shipmode/l_commitdate; the class is the
    shipping-delay bucket ``clamp(floor((ship-order)/30d), -2..6)`` and
    "late" semantics live in the bucketing itself.

    One join + one hash aggregate; the CASE sums combine map-side."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    delay_class = F.greatest(
        F.lit(-2),
        F.least(F.lit(6), F.floor(F.datediff("l_shipdate", "o_orderdate") / F.lit(30.0))),
    ).cast("int")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(delay_class.alias("delay_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_count"),
        )
    )


def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analogue — nested semi-join chain. Schema bridge: no
    partsupp.availqty; a supplier "holds excess stock" of a red part if
    their 1997 shipped quantity exceeds 20% of all 1997 shipments of
    that part.

    Per-(part,supplier) partial sums first (map-side combine), the
    per-part total as a window over the *aggregated* relation (small),
    then a semi-join up to ASIA suppliers — no self-join of lineitem."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    red = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    ps = (
        li.join(F.broadcast(red.select("p_partkey")), li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(micros(F.col("l_quantity"))).alias("q_micros"))
    )
    w = Window.partitionBy("l_partkey")
    excess = (
        ps.withColumn("t_micros", F.sum("q_micros").over(w))
        .filter(F.col("q_micros") * F.lit(5) > F.col("t_micros"))
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


def q21_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue — the EXISTS / NOT-EXISTS pair over the same
    fact table. Schema bridge: no receipt/commit dates; "late" =
    shipped more than 60 days after the order date.

    Q21's two correlated self-joins collapse into ONE per-order
    aggregation: count distinct suppliers, count distinct late
    suppliers, and (when exactly one is late) that supplier's key via
    ``max(CASE WHEN late)``. One shuffle on orderkey instead of three
    scans of lineitem — the formulation that survives 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("lone_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    s = load(spark, sf_dir, "supplier")
    return (
        per_order.join(s, per_order.lone_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): lineitem's four measure columns to long-form
    (measure, value) rows, then exact per-measure totals — the
    wide-to-long inverse of q_pivot. Spark plans the melt as one
    map-side Expand (4 output rows per input row, no shuffle); the
    only exchange is the 4-group aggregate's combine."""
    li = load(spark, sf_dir, "lineitem")
    longf = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return longf.groupBy("measure").agg(
        xsum(F.col("value")).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q03_shipping_priority": q03_shipping_priority,
    "q04_order_priority": q04_order_priority,
    "q05_region_revenue": q05_region_revenue,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q_filter_project": q_filter_project,
    "q_literal_cast": q_literal_cast,
    "q_union_distinct": q_union_distinct,
    "q_intersect_except": q_intersect_except,
    "q16_supplier_part_count": q16_supplier_part_count,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q_array_functions": q_array_functions,
    "q_ntile_quartiles": q_ntile_quartiles,
    "q08_market_share": q08_market_share,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q_salted_join": q_salted_join,
    "q_md5_checksum": q_md5_checksum,
    "q_semi_join": q_semi_join,
    "q_anti_join": q_anti_join,
    "q_outer_join_count": q_outer_join_count,
    "q_topk_per_group": q_topk_per_group,
    "q_running_total": q_running_total,
    "q_rollup": q_rollup,
    "q_pivot": q_pivot,
    "q_distinct_agg": q_distinct_agg,
    "q_date_functions": q_date_functions,
    "q_string_functions": q_string_functions,
    "q_wordcount": q_wordcount,
    "q_sessionize": q_sessionize,
    "q_event_window_agg": q_event_window_agg,
    "q_asof_join": q_asof_join,
    "q07_nation_volume": q07_nation_volume,
    "q10_returned_revenue": q10_returned_revenue,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_pred": q19_disjunctive_pred,
    "q22_idle_rich_customers": q22_idle_rich_customers,
    "q_json_extract": q_json_extract,
    "q_percentiles": q_percentiles,
    "q_funnel": q_funnel,
    "q_range_join": q_range_join,
    "q_hypertable_rollup": q_hypertable_rollup,
    "q_grouping_sets": q_grouping_sets,
    "q_deterministic_sample": q_deterministic_sample,
    "q_session_window": q_session_window,
    "q_moving_sum_range": q_moving_sum_range,
    "q_exact_regression": q_exact_regression,
    "q02_min_acctbal_supplier": q02_min_acctbal_supplier,
    "q09_product_profit": q09_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_late_shipment_priority": q12_late_shipment_priority,
    "q20_excess_share_suppliers": q20_excess_share_suppliers,
    "q21_lone_late_supplier": q21_lone_late_supplier,
    "q_unpivot_measures": q_unpivot_measures,
}


ORACLES = {
    "q07_nation_volume": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0) AS BIGINT)) / 1000000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
    "q10_returned_revenue": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0) AS BIGINT)) / 1000000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q14_promo_revenue": """
        SELECT round(100.0 * promo_micros / total_micros, 6) AS promo_revenue_pct
        FROM (
            SELECT sum(CASE WHEN p_type = 'PROMO'
                            THEN CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0) AS BIGINT)
                            ELSE 0 END) AS promo_micros,
                   sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0) AS BIGINT)) AS total_micros
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
        )
    """,
    "q18_large_orders": """
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_totalprice, sum_qty
        FROM (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300.0
        )
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "q19_disjunctive_pred": """
        SELECT sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0) AS BIGINT)) / 1000000.0 AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    "q22_idle_rich_customers": """
        SELECT c_nationkey, count(*) AS numcust,
               sum(CAST(round(c_acctbal * 1000000.0) AS BIGINT)) / 1000000.0 AS totacctbal
        FROM customer c
        WHERE CAST(round(c_acctbal * 1000000.0) AS BIGINT)
                * (SELECT count(*) FROM customer)
              > (SELECT sum(CAST(round(c_acctbal * 1000000.0) AS BIGINT)) FROM customer)
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
          )
        GROUP BY c_nationkey
    """,
    "q_json_extract": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events
        GROUP BY event_type
    """,
    "q_exact_regression": """
        WITH base AS (
            SELECT user_id, epoch_us(ts) AS tmic,
                   CAST(round(value * 1000000.0) AS BIGINT) AS y
            FROM events
        ),
        mins AS (SELECT user_id, min(tmic) AS t0 FROM base GROUP BY user_id),
        xy AS (
            SELECT b.user_id, (b.tmic - m.t0) // 1000000 AS x, b.y
            FROM base b JOIN mins m ON b.user_id = m.user_id
        ),
        agg AS (
            SELECT user_id,
                   CAST(count(*) AS HUGEINT) AS n,
                   sum(CAST(x AS HUGEINT)) AS sx,
                   sum(CAST(y AS HUGEINT)) AS sy,
                   sum(CAST(x * y AS HUGEINT)) AS sxy,
                   sum(CAST(x * x AS HUGEINT)) AS sxx
            FROM xy GROUP BY user_id
        )
        SELECT user_id,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) / 1000000.0, 12)
                   AS slope_per_sec
        FROM agg
        WHERE n * sxx - sx * sx <> 0
    """,
    "q_moving_sum_range": """
        SELECT event_id, user_id,
               sum(CAST(round(value * 1000000.0) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) / 1000000.0 AS sum_value_1h
        FROM events
    """,
    "q_session_window": """
        WITH ordered AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             OR epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ),
        islands AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM ordered
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n_events
        FROM islands
        GROUP BY user_id, session_id
    """,
    "q_deterministic_sample": """
        SELECT o_orderstatus,
               count(*) AS n_sampled,
               sum(CAST(round(o_totalprice * 1000000.0) AS BIGINT)) / 1000000.0
                   AS sampled_total
        FROM orders
        WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
        GROUP BY o_orderstatus
    """,
    "q_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n,
               sum(CAST(round(o_totalprice * 1000000.0) AS BIGINT)) / 1000000.0
                   AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """,
    "q_hypertable_rollup": """
        WITH minute AS (
            SELECT date_trunc('minute', ts) AS m_bucket, event_type,
                   count(*) AS n,
                   sum(CAST(round(value * 1000000.0) AS BIGINT)) AS value_micros
            FROM events
            GROUP BY 1, 2
        )
        SELECT strftime(date_trunc('hour', m_bucket), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
               event_type,
               CAST(sum(n) AS BIGINT) AS n_events,
               sum(value_micros) / 1000000.0 AS sum_value,
               count(*) AS n_active_minutes
        FROM minute
        GROUP BY 1, 2
    """,
    "q_range_join": """
        SELECT p.event_id AS purchase_id, p.user_id,
               count(c.c_ts) AS n_clicks_1h_before
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.c_ts >= p.ts - INTERVAL 1 HOUR
         AND c.c_ts <= p.ts
        GROUP BY p.event_id, p.user_id
    """,
    "q_percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
               round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "q_funnel": """
        WITH s AS (
            SELECT user_id, min(ts) AS signup_ts FROM events
            WHERE event_type = 'signup' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS click_ts
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'click' AND e.ts >= s.signup_ts
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS purchase_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
            GROUP BY e.user_id
        )
        SELECT count(s.signup_ts) AS n_signup,
               count(c.click_ts) AS n_click_after_signup,
               count(p.purchase_ts) AS n_purchase_after_click
        FROM s
        LEFT JOIN c ON s.user_id = c.user_id
        LEFT JOIN p ON s.user_id = p.user_id
    """,
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(CAST(round((l_quantity) * 1000000.0) AS BIGINT)) / 1000000.0 AS sum_qty,
               sum(CAST(round((l_extendedprice) * 1000000.0) AS BIGINT)) / 1000000.0 AS sum_base_price,
               sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0) AS BIGINT)) / 1000000.0 AS sum_disc_price,
               sum(CAST(round((l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) * 1000000.0) AS BIGINT)) / 1000000.0 AS sum_charge,
               round(avg(l_quantity), 2) AS avg_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q03_shipping_priority": """
        SELECT l_orderkey,
               sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0) AS BIGINT)) / 1000000.0 AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q04_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
    """,
    "q05_region_revenue": """
        SELECT n_name,
               sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0) AS BIGINT)) / 1000000.0 AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """,
    "q06_forecast_revenue": """
        SELECT sum(CAST(round((l_extendedprice * l_discount) * 1000000.0) AS BIGINT)) / 1000000.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.04 AND l_discount <= 0.06
          AND l_quantity < 24
    """,
    "q_filter_project": """
        SELECT o_orderkey, o_totalprice,
               upper(o_orderpriority) AS priority_uc,
               CASE WHEN o_totalprice > 200000.0 THEN 'big' ELSE 'small' END AS size_class
        FROM orders
        WHERE o_orderstatus <> 'F' AND o_totalprice > 1000.0
    """,
    "q_literal_cast": """
        SELECT CAST(NULL AS VARCHAR) AS merge_key, 1 AS iscurrent, *
        FROM nation
    """,
    "q16_supplier_part_count": """
        SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type NOT LIKE 'ECONOMY%'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
    """,
    "q17_small_qty_revenue": """
        WITH per_part AS (
            SELECT l_partkey,
                   sum(CAST(round(l_quantity * 1000000.0) AS BIGINT)) AS sum_q_micros,
                   count(*) AS n_q
            FROM lineitem GROUP BY l_partkey
        )
        SELECT round(sum(CAST(round(l_extendedprice * 1000000.0) AS BIGINT))
                     / 1000000.0 / 7.0, 6) AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN per_part USING (l_partkey)
        WHERE p_brand = 'Brand#1' AND p_size <= 15
          AND 5 * CAST(round(l_quantity * 1000000.0) AS BIGINT) * n_q < sum_q_micros
    """,
    "q_array_functions": """
        SELECT l_orderkey,
               len(q) AS n_items,
               q[1] / 1000000.0 AS min_qty,
               q[-1] / 1000000.0 AS max_qty,
               list_contains(q, 1000000) AS has_qty_1,
               list_aggregate(list_slice(q, 1, 3), 'sum') / 1000000.0 AS sum_small3
        FROM (
            SELECT l_orderkey,
                   list_sort(list(CAST(round(l_quantity * 1000000.0) AS BIGINT))) AS q
            FROM lineitem WHERE l_orderkey % 1000 = 0
            GROUP BY l_orderkey
        )
    """,
    "q_ntile_quartiles": """
        SELECT c_mktsegment, quartile, count(*) AS n,
               sum(bal_micros) / 1000000.0 AS sum_bal
        FROM (
            SELECT c_mktsegment,
                   CAST(round(c_acctbal * 1000000.0) AS BIGINT) AS bal_micros,
                   ntile(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
            FROM customer
        )
        GROUP BY c_mktsegment, quartile
    """,
    "q08_market_share": """
        SELECT o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_micros ELSE 0 END)
                     / sum(rev_micros), 6) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   CAST(round(l_extendedprice * (1 - l_discount) * 1000000.0) AS BIGINT)
                       AS rev_micros,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            WHERE p_type LIKE 'STANDARD%' AND r_name = 'AMERICA'
        )
        GROUP BY o_year
    """,
    "q13_order_count_distribution": """
        SELECT c_count, count(*) AS custdist FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "q15_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000.0) AS BIGINT))
                       AS rev_micros
            FROM lineitem
            WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, round(rev_micros / 1000000.0, 6) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_micros = (SELECT max(rev_micros) FROM rev)
    """,
    "q_salted_join": """
        SELECT p_brand,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000.0) AS BIGINT))
                   / 1000000.0 AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "q_intersect_except": """
        WITH big AS (
            SELECT c_mktsegment AS segment FROM customer
            JOIN orders ON c_custkey = o_custkey
            WHERE o_totalprice > 200000.0
        ),
        overdrawn AS (
            SELECT c_mktsegment AS segment FROM customer WHERE c_acctbal < 0
        )
        SELECT 'both' AS which, segment FROM (SELECT segment FROM big INTERSECT SELECT segment FROM overdrawn)
        UNION ALL
        SELECT 'only_big' AS which, segment FROM (SELECT segment FROM big EXCEPT SELECT segment FROM overdrawn)
    """,
    "q_union_distinct": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "q_md5_checksum": """
        SELECT c_custkey,
               md5(c_name || nullif(c_mktsegment, 'MACHINERY')) AS checksum
        FROM customer
    """,
    "q_semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    "q_anti_join": """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q_outer_join_count": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "q_topk_per_group": """
        SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rk <= 3
    """,
    "q_running_total": """
        SELECT l_suppkey, l_orderkey, l_linenumber,
               sum(CAST(round(l_extendedprice * 1000000.0) AS BIGINT))
                    OVER (PARTITION BY l_suppkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    / 1000000.0 AS running_rev
        FROM lineitem
    """,
    "q_rollup": """
        SELECT l_returnflag, l_linestatus,
               sum(CAST(round((l_quantity) * 1000000.0) AS BIGINT)) / 1000000.0 AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q_pivot": """
        SELECT l_returnflag,
               count(*) FILTER (WHERE l_linestatus = 'O') AS cnt_o,
               count(*) FILTER (WHERE l_linestatus = 'F') AS cnt_f
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "q_distinct_agg": """
        SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n
        FROM orders GROUP BY o_orderstatus
    """,
    "q_date_functions": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               count(*) AS n,
               sum(CAST(round((o_totalprice) * 1000000.0) AS BIGINT)) / 1000000.0 AS total
        FROM orders GROUP BY 1, 2
    """,
    "q_string_functions": """
        SELECT p_partkey,
               upper(p_brand) AS brand_uc,
               substr(p_name, 1, 10) AS name10,
               CAST(length(p_name) AS INTEGER) AS name_len,
               replace(p_type, ' ', '_') AS type_us
        FROM part
    """,
    "q_wordcount": """
        SELECT word, count(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE word <> ''
        GROUP BY word
    """,
    "q_sessionize": """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ts,
                   CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, count(*) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        FROM numbered GROUP BY user_id, session_id
    """,
    "q_event_window_agg": """
        SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket_epoch,
               event_type, count(*) AS n,
               sum(CAST(round((value) * 1000000.0) AS BIGINT)) / 1000000.0 AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_asof_join": """
        WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             best_ts AS (
                 SELECT p.event_id AS purchase_id, max(c.ts) AS best_click_ts
                 FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
                 GROUP BY p.event_id
             ),
             best AS (
                 SELECT b.purchase_id, max(c.event_id) AS click_id
                 FROM best_ts b
                 JOIN p ON p.event_id = b.purchase_id
                 JOIN c ON c.user_id = p.user_id AND c.ts = b.best_click_ts
                 GROUP BY b.purchase_id
             )
        SELECT p.event_id AS purchase_id, p.user_id, best.click_id
        FROM p LEFT JOIN best ON best.purchase_id = p.event_id
    """,
    # q02 oracle uses a genuinely correlated scalar-min subquery — a
    # different formulation than the Spark window, so parity validates
    # the rewrite, not just the arithmetic.
    "q02_min_acctbal_supplier": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        base AS (
            SELECT p_partkey, p_name, s_name, s_acctbal, n_name
            FROM ps
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE p_size = 8 AND p_type = 'LARGE' AND r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM base b
        WHERE s_acctbal = (SELECT min(s_acctbal) FROM base b2
                           WHERE b2.p_partkey = b.p_partkey)
        ORDER BY s_acctbal DESC, p_partkey ASC, s_name ASC
        LIMIT 20
    """,
    "q09_product_profit": """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               sum(CAST(round((l_extendedprice * (1.0 - l_discount)
                               - 0.6 * p_retailprice * l_quantity) * 1000000.0) AS BIGINT))
                   / 1000000.0 AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
        GROUP BY n_name, year(o_orderdate)
    """,
    "q11_important_parts": """
        WITH per_part AS (
            SELECT l_partkey,
                   sum(CAST(round(l_extendedprice * 1000000.0) AS BIGINT)) AS value_micros
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_7'
            GROUP BY l_partkey
        )
        SELECT l_partkey, value_micros / 1000000.0 AS value
        FROM per_part
        WHERE value_micros * 1000 > (SELECT sum(value_micros) FROM per_part)
    """,
    "q12_late_shipment_priority": """
        SELECT CAST(greatest(-2, least(6,
                   floor(date_diff('day', o_orderdate, l_shipdate) / 30.0))) AS INTEGER)
                   AS delay_class,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "q20_excess_share_suppliers": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(round(l_quantity * 1000000.0) AS BIGINT)) AS q_micros
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'red%'
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2
        ),
        tot AS (SELECT l_partkey, sum(q_micros) AS t_micros FROM ps GROUP BY 1)
        SELECT DISTINCT s_suppkey, s_name
        FROM ps
        JOIN tot USING (l_partkey)
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE q_micros * 5 > t_micros AND r_name = 'ASIA'
    """,
    "q21_lone_late_supplier": """
        WITH lo AS (
            SELECT l_orderkey,
                   count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
                   max(CASE WHEN late THEN l_suppkey END) AS lone_supp
            FROM (
                SELECT l_orderkey, l_suppkey,
                       l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
            )
            GROUP BY l_orderkey
        )
        SELECT s_name, count(*) AS numwait
        FROM lo JOIN supplier ON lone_supp = s_suppkey
        WHERE n_supp >= 2 AND n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 25
    """,
    "q_unpivot_measures": """
        WITH longf AS (
            SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
            UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL SELECT 'l_discount', l_discount FROM lineitem
            UNION ALL SELECT 'l_tax', l_tax FROM lineitem
        )
        SELECT measure,
               sum(CAST(round(value * 1000000.0) AS BIGINT)) / 1000000.0 AS total,
               count(*) AS n
        FROM longf GROUP BY measure
    """,
}
