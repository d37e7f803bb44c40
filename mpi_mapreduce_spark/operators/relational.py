"""Relational operators over the star schema — all Catalyst built-ins.

The reference has no joins, windows, sorts, or set ops (SURVEY.md
§2.3-2.7); the engine provides them via declarative DataFrame plans so
Catalyst does predicate pushdown, column pruning, join selection and
AQE re-planning. Every query aliases its computed columns identically
to its DuckDB oracle (driver hash-compares by sorted column name).

Float discipline: every aggregate over doubles goes through
functions.exact — each row is quantized to a lossless fixed scale
(all money columns in the test data are exact 2-decimal values, so
revenue products are exact at 4, charge at 6), summed exactly as
integers, and divided back. That makes the result bit-identical
regardless of addition order — ROUND(SUM(..)) is NOT enough, the
last-ulp wobble of a distributed float sum flips the rounded value on
boundaries. Top-k orderings always carry a unique-key tiebreak so the
selected set is deterministic.

Scale notes per query; common themes at 100 TB:
- dimension tables (region/nation/supplier/part, and customer vs the
  fact tables) are broadcast — the fact table never shuffles for them;
- fact-fact joins (lineitem x orders) shuffle both sides on the join
  key once; the downstream agg on the same key reuses that exchange;
- top-k is TakeOrderedAndProject (per-partition heap + driver merge of
  k rows), never a global sort;
- window functions shuffle once on partitionBy keys; frames evaluate
  streaming within each partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.functions import exact as ex

#: lossless quantization scales for the star-schema doubles
_REV = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _revenue():
    """extendedprice * (1 - discount) — built lazily: Column exprs need
    an active SparkContext, which module import time doesn't have."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Aggregation core
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → pushed filter → 8-agg groupBy.
    Shuffle carries only per-partition partials (6 groups)."""
    li = _t(spark, sf_dir, "lineitem")
    charge = _revenue() * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            ex.quantized_sum("l_quantity", 2).alias("sum_qty"),
            ex.quantized_sum("l_extendedprice", 2).alias("sum_base_price"),
            ex.quantized_sum(_revenue(), 4).alias("sum_disc_price"),
            ex.quantized_sum(charge, 6).alias("sum_charge"),
            ex.quantized_avg("l_quantity", 2).alias("avg_qty"),
            ex.quantized_avg("l_extendedprice", 2).alias("avg_price"),
            ex.quantized_avg("l_discount", 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with grouping_id — subtotal
    hierarchy in one pass (Spark expands grouping sets before the agg,
    still a single shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            ex.quantized_sum("l_quantity", 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "sum_qty",
            "n",
        )
    )


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all 4 grouping sets."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            ex.quantized_sum("o_totalprice", 2).alias("total_price"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "gid",
            "total_price",
            "n",
        )
    )


def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — arbitrary subtotal selection (the
    general form behind rollup/cube), still one shuffle: Spark expands
    the sets before the agg exactly like rollup."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            ex.quantized_sum("l_quantity", 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "sum_qty",
            "n",
        )
    )


#: identical ANSI text runs on Spark (temp views) AND DuckDB — the
#: engine's SQL API surface, with a correlated EXISTS (TPC-H Q4 shape;
#: Catalyst rewrites it to a left-semi join on l_orderkey).
_SQL_Q4_PRIORITY = """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
"""


def sql_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql(...) API path: same text as the oracle, byte for
    byte — proves the SQL surface, the view catalog, and correlated
    subquery planning in one query."""
    from mpi_mapreduce_spark.datamodel import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q4_PRIORITY)


#: correlated scalar subquery (each customer's max-price order) —
#: identical text on both engines; Catalyst decorrelates to an
#: aggregate + join
_SQL_MAX_ORDER = """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           ROUND(o_totalprice * 100.0) / 100.0 AS totalprice
    FROM orders o
    WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
"""


def sql_customer_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL surface."""
    from mpi_mapreduce_spark.datamodel import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_MAX_ORDER)


def percentile_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90) of order price per segment.
    percentile() sorts within each group — fine for per-group
    cardinalities; the approximate sketch path (percentile_approx /
    t-digest) is the 100 TB default when groups get huge. Both engines
    use the same 1-based linear interpolation, and the interpolation
    arithmetic runs on identical doubles, so the result is exact."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
            F.count("*").alias("n"),
        )
        .select(F.col("c_mktsegment").alias("mktsegment"), "p50", "p90", "n")
    )


def approx_percentile_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw GK-sketch percentile estimates (accuracy 10000) per segment
    — unregistered helper; pytest pins its error against the exact op
    (tests/test_relational.py::test_approx_percentiles_near_exact)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias(
                "p50_approx"
            ),
            F.percentile_approx("o_totalprice", F.lit(0.9), F.lit(10000)).alias(
                "p90_approx"
            ),
            F.count("*").alias("n"),
        )
        .select(F.col("c_mktsegment").alias("mktsegment"), "p50_approx", "p90_approx", "n")
    )


def approx_percentile_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (Greenwald-Khanna summaries) — the
    100 TB path exact percentile() can't take: the sketch is mergeable
    across partitions (map-side combine, bounded memory), the sort is
    never global.

    Raw sketch estimates are engine-specific, so a hash-compare oracle
    on them is impossible; instead the driver-compared output asserts
    the estimate lands inside the exact ±0.01 RANK band (GK at
    accuracy 10000 guarantees 1e-4 — two orders of magnitude of
    headroom), which DuckDB oracles as TRUE. The raw estimates'
    accuracy is additionally pinned in pytest."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders")
    agg = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("a50"),
            F.percentile_approx("o_totalprice", F.lit(0.9), F.lit(10000)).alias("a90"),
            F.percentile("o_totalprice", F.lit(0.49)).alias("lo50"),
            F.percentile("o_totalprice", F.lit(0.51)).alias("hi50"),
            F.percentile("o_totalprice", F.lit(0.89)).alias("lo90"),
            F.percentile("o_totalprice", F.lit(0.91)).alias("hi90"),
            F.count("*").alias("n"),
        )
    )
    return agg.select(
        F.col("c_mktsegment").alias("mktsegment"),
        "n",
        ((F.col("a50") >= F.col("lo50")) & (F.col("a50") <= F.col("hi50"))).alias(
            "p50_in_band"
        ),
        ((F.col("a90") >= F.col("lo90")) & (F.col("a90") <= F.col("hi90"))).alias(
            "p90_in_band"
        ),
    )


def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per linestatus value. Values enumerated
    explicitly so Spark skips the distinct-value discovery job."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(ex.quantized_sum("l_quantity", 2))
        .select(
            "l_returnflag",
            F.coalesce("O", F.lit(0.0)).alias("qty_open"),
            F.coalesce("F", F.lit(0.0)).alias("qty_filled"),
        )
    )


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregates (Catalyst plans expand + two-stage agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def approx_distinct_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HLL++ estimates — unregistered helper; pytest bounds its
    error against the exact counts
    (tests/test_relational.py::test_approx_distinct_within_hll_error)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("n_parts_approx"),
        F.approx_count_distinct("l_orderkey").alias("n_orders_approx"),
    )


def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB path (no expand, mergeable
    sketches). HLL register layouts are engine-specific, so the
    driver-compared output carries the independently-computed EXACT
    distincts plus booleans asserting the HLL estimate lands within
    3× the sketch's default rsd (0.05) — which DuckDB oracles as TRUE.
    Raw-estimate error is additionally pinned in pytest."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.approx_count_distinct("l_partkey").alias("hp"),
        F.approx_count_distinct("l_orderkey").alias("ho"),
    )
    return agg.select(
        "n_parts",
        "n_orders",
        (
            F.abs(F.col("hp") - F.col("n_parts")) <= 0.15 * F.col("n_parts")
        ).alias("parts_within_rsd"),
        (
            F.abs(F.col("ho") - F.col("n_orders")) <= 0.15 * F.col("n_orders")
        ).alias("orders_within_rsd"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer(broadcast) ⋈ orders ⋈ lineitem, top 10
    unshipped orders by revenue. customer broadcasts (15k rows at
    sf0.1; a real deployment bucket-joins if customer outgrows the
    broadcast threshold); orders⋈lineitem shuffles on orderkey and the
    revenue agg reuses that partitioning. Top-k via
    TakeOrderedAndProject with l_orderkey tiebreak."""
    cutoff = F.lit("1997-06-15").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(ex.quantized_sum(_revenue(), 4).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; every dimension side broadcasts, so
    the only shuffles are lineitem⋈orders on orderkey and the final
    25-group agg. The c_nationkey = s_nationkey predicate is applied
    post-join as a filter (same as TPC-H)."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(ex.quantized_sum(_revenue(), 4).alias("revenue"))
        .select(F.col("n_name").alias("nation"), "revenue")
    )


def join_broadcast_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join: part is a classic small dim —
    ships to every executor once, zero shuffle of lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            ex.quantized_sum("l_quantity", 2).alias("sum_qty"),
            ex.quantized_sum(_revenue(), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select(F.col("p_brand").alias("brand"), "sum_qty", "revenue", "n_items")
    )


def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers with ≥1 urgent order, counted per
    segment. Semi join dedups the probe side inside the join — no
    distinct pass, no row explosion for multi-order customers."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .select(F.col("c_mktsegment").alias("mktsegment"), "n_customers")
    )


def join_anti_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no orders at all, per
    nation, nation name via broadcast."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_idle"))
        .select(F.col("n_name").alias("nation"), "n_idle")
    )


def join_range_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: orders binned into price bands defined as
    rows. The band table is tiny → BroadcastNestedLoopJoin, which is
    the *right* plan: each order row tests 4 intervals in place, no
    shuffle. (A big-big range join would instead bucketize the range
    key and equi-join on bucket — see similarity.py for that shape.)"""
    orders = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("low", 0.0, 50_000.0),
            ("mid", 50_000.0, 150_000.0),
            ("high", 150_000.0, 300_000.0),
            ("lux", 300_000.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            ex.quantized_sum("o_totalprice", 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

def window_topk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 suppliers by revenue within each nation: the canonical
    row_number-over-window top-k-per-group. One shuffle on the
    partition key; rank evaluates streaming per partition. Revenue is
    rounded *before* ranking so both engines rank identical values;
    s_suppkey breaks ties deterministically."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "s_suppkey", "s_name")
        .agg(ex.quantized_sum(_revenue(), 4).alias("revenue"))
    )
    w = W.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("s_suppkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            F.col("n_name").alias("nation"),
            F.col("s_name").alias("supplier"),
            "revenue",
            "rank",
        )
    )


def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of each customer's order spend in order-date
    sequence (o_orderkey tiebreak → deterministic frame). ROWS frame,
    streaming evaluation, single shuffle on custkey."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        ex.quantized_sum_over("o_totalprice", 2, w).alias("running_spend"),
        F.row_number().over(
            W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).alias("order_seq"),
    )


def window_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics per user over the event sequence. Ordered by
    event_id (arrival sequence): deterministic in both engines and
    immune to the ns-vs-µs timestamp precision gap."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "user_id",
        "event_id",
        ex.quantize(F.col("value") - F.lag("value", 1).over(w), 2).alias("delta_prev"),
        F.lead("event_type", 1).over(w).alias("next_type"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / set ops
# ---------------------------------------------------------------------------

def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 by price: Spark plans TakeOrderedAndProject —
    per-partition heaps, driver merges 100 rows; no global sort."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            ex.quantize("o_totalprice", 2).alias("totalprice"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


def setops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except over yearly purchaser cohorts,
    returned as one summary row. Spark rewrites intersect/except to
    semi/anti joins under the hood."""

    def cohort(year: int) -> DataFrame:
        o = _t(spark, sf_dir, "orders")
        return o.where(F.year("o_orderdate") == year).select("o_custkey").distinct()

    c95, c96 = cohort(1995), cohort(1996)
    both = c95.intersect(c96).count()
    either = c95.union(c96).distinct().count()
    only95 = c95.exceptAll(c96).count()
    return spark.createDataFrame(
        [(both, either, only95)],
        "in_both long, in_either long, only_1995 long",
    )


# ---------------------------------------------------------------------------
# Scalar functions: JSON / date / string over events & orders
# ---------------------------------------------------------------------------

def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (props is a JSON string column) + grouped stats.
    get_json_object evaluates JVM-side; no UDF."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            ex.quantized_avg("value", 2).alias("avg_value"),
        )
    )


def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc histogram — month granularity over the fact table."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            )
        )
        .agg(
            F.count("*").alias("n_orders"),
            ex.quantized_sum("o_totalprice", 2).alias("total"),
        )
    )


def string_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kitchen-sink over part: concat/substr/upper/regexp —
    all codegen'd expressions."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("/", F.upper("p_brand"), F.lower("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        (F.length(F.col("p_name")) - F.length(F.regexp_replace("p_name", " ", "")))
        .cast("long")
        .alias("n_spaces"),
    )


def array_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array kitchen-sink (SURVEY.md §2.8): build per-order arrays with
    collect_list/collect_set, then element/size/containment/join ops.
    Outputs are scalars (the hash-compare stays type-stable); arrays are
    sorted before any element access so results are partitioning-
    invariant — collect_list order is NOT deterministic under a shuffle,
    array_sort makes it so."""
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("lines"),
        F.array_sort(F.collect_set("l_returnflag")).alias("flags"),
    )
    return per_order.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.element_at("lines", 1).alias("first_line"),
        F.element_at("lines", -1).alias("last_line"),
        F.size("flags").alias("n_flags"),
        F.array_contains("flags", "R").alias("has_return"),
        F.concat_ws(",", "flags").alias("flags_csv"),
    )


def _user_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event integer (x, y): x = whole seconds since the user's
    first event, y = cents — the exact-sum basis both the grouped
    regression and the grouped correlation share."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t_us"), "value"
    )
    t0 = ev.groupBy("user_id").agg(F.min("t_us").alias("t0_us"))
    return ev.join(t0, "user_id").select(
        "user_id",
        ((F.col("t_us") - F.col("t0_us")) / F.lit(1_000_000))
        .cast("long")
        .alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )


def events_user_value_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Pearson correlation of value vs time, exact-integer
    closed form: r = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)).
    The three factors are exact int64s (order-independent sums); the
    two sqrts and one division are IEEE ops on identical inputs, so r
    is bit-identical cross-engine — native corr() sums doubles and
    wobbles under partitioning. √d1·√d2 instead of √(d1·d2) keeps the
    variance product from overflowing int64 (~1e28 here)."""
    xy = _user_xy(spark, sf_dir)
    agg = xy.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (agg.n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = (agg.n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    d2 = (agg.n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        "user_id",
        "n",
        F.when(
            (F.col("n") >= 2) & (d1 > 0) & (d2 > 0),
            num / (F.sqrt(d1) * F.sqrt(d2)),
        ).alias("r"),
    )


def events_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of event value over time — grouped
    regression via closed-form sums, kept EXACT: x is seconds since
    the user's first event (integer), y is cents (integer), so Σx, Σy,
    Σxy, Σx² are exact int64 sums (order-independent) and slope's
    numerator/denominator are exact integers; the one final division
    is deterministic on both engines. The native regr_slope would sum
    doubles and wobble in the last ulp under partitioning — the same
    reason functions/exact.py exists.

    Two passes over events, both shuffling on user_id (the second
    reuses the first's partitioning); at 100 TB this is a textbook
    two-stage grouped aggregate, no window, no sort."""
    xy = _user_xy(spark, sf_dir)
    agg = xy.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = agg.n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = agg.n * F.col("sxx") - F.col("sx") * F.col("sx")
    # slope in cents/second; users with one event (den=0) -> null
    return agg.select(
        "user_id",
        "n",
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "slope_cents_per_s"
        ),
    )


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase per user: each stage's
    timestamp is the first occurrence AT OR AFTER the previous stage
    (not just any occurrence — order matters in a funnel).

    Three conditional min-aggregates chained by two joins, every one
    keyed on user_id: the first shuffle establishes the user_id
    partitioning and the rest reuse it. Timestamps surface as exact
    integer microseconds (unix_micros) so the oracle compare has no
    float or timezone surface."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t_view = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    t_click = (
        ev.where(F.col("event_type") == "click")
        .join(t_view, "user_id")
        .where(F.col("ts") >= F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    t_purchase = (
        ev.where(F.col("event_type") == "purchase")
        .join(t_click, "user_id")
        .where(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        t_view.join(t_click, "user_id", "left")
        .join(t_purchase, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("view_ts").alias("view_us"),
            F.unix_micros("click_ts").alias("click_us"),
            F.unix_micros("purchase_ts").alias("purchase_us"),
            F.col("click_ts").isNotNull().alias("reached_click"),
            F.col("purchase_ts").isNotNull().alias("reached_purchase"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H breadth (q6/q10/q14/q18/q19 shapes on the reduced star schema)
# ---------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side query — every predicate pushes
    into the parquet reader, no join, no shuffle beyond the final
    single-group partial merge. The canonical 'is pushdown working'
    probe: .explain shows PushedFilters on shipdate/discount/quantity
    and a 3-column ReadSchema."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            ex.quantized_sum(
                F.col("l_extendedprice") * F.col("l_discount"), 4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter. lineitem⋈orders shuffles on orderkey once; customer
    and nation broadcast; final top-k is TakeOrderedAndProject with a
    custkey tiebreak so the selected set is deterministic."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(ex.quantized_sum(_revenue(), 4).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            ex.quantize("c_acctbal", 2).alias("acctbal"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio. part broadcasts;
    the ratio divides two exact quantized sums (one IEEE division on
    bit-identical inputs → deterministic cross-engine)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    promo_rev = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(0.0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            ex.quantized_sum(promo_rev, 4).alias("promo_revenue"),
            ex.quantized_sum(_revenue(), 4).alias("total_revenue"),
        )
        .select(
            "promo_revenue",
            "total_revenue",
            (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
                "promo_pct"
            ),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a fact-table groupBy feeding a
    join. The qty-per-order aggregate shuffles lineitem on orderkey
    once; the surviving ~1% of orders then join orders (same key — AQE
    reuses the exchange side) and broadcast customer."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(ex.quantized_sum("l_quantity", 2).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            F.col("o_orderkey").alias("orderkey"),
            ex.quantize("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "orderkey")
        .limit(100)
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive bands over a join.
    Catalyst extracts the common l_partkey = p_partkey equi-condition
    (hash join, part broadcast) and evaluates the OR-of-ANDs as a
    post-join filter — exactly how the spec query is best planned."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#3")
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
            & (F.col("p_size") <= 5)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
            & (F.col("p_size") <= 10)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
            & (F.col("p_size") <= 15)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(band)
        .agg(
            ex.quantized_sum(_revenue(), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Registry + oracles
# ---------------------------------------------------------------------------

def orders_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt): per-priority order metrics unpivoted
    into (priority, metric, value) rows — the inverse of
    pivot_linestatus, and the shape metric stores / plotting layers
    ingest.

    `unpivot` is a zero-shuffle projection (each aggregated row
    expands to its k metric rows in place); the only shuffle is the
    upstream 5-group aggregate with map-side combine. All metrics
    share one double column: counts are exact small integers, the sum
    and avg are cents-quantized (functions/exact.py), min/max are
    comparisons — every value bit-identical across engines."""
    orders = _t(spark, sf_dir, "orders")
    wide = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").cast("double").alias("n_orders"),
        ex.quantized_sum("o_totalprice", 2).alias("sum_price"),
        ex.quantized_avg("o_totalprice", 2).alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    return wide.unpivot(
        "priority",
        ["n_orders", "sum_price", "avg_price", "min_price", "max_price"],
        "metric",
        "value",
    )




def customer_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: pairs of customer names exactly one edit
    apart, found with a deletion-neighborhood (FastSS) blocked
    self-join — the dedup primitive for records that exact-match
    misses (typos, OCR noise).

    Blocking key: the name itself plus every single-character-deleted
    variant, hashed to a long. Two strings within edit distance 1
    ALWAYS share a variant (substitution → delete the edited position
    from both; insert/delete → the longer minus the edited char IS the
    shorter), so this blocking is COMPLETE for distance ≤ 1 — unlike
    prefix blocking, which is both lossy (edits inside the prefix are
    unfound) and degenerate on key-structured names like
    ``Customer#000000001`` where every row shares the prefix and one
    block goes quadratic (measured 18 s at sf0.1; this plan: ~2 s).
    Candidates are id pairs deduped BEFORE names rejoin (narrow
    shuffle), then `levenshtein == 1` verifies exactly — hash
    collisions and shared-variant false positives are filtered, never
    emitted. At 100 TB each row fans out to len+1 ≈ 19 variant keys —
    linear replication, equi-join on 8-byte keys, per-bucket products
    bounded by true-near-pair density rather than key structure."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    variants = c.select(
        "c_custkey",
        F.explode(
            F.concat(
                F.array(F.col("c_name")),
                F.expr(
                    "transform(sequence(1, length(c_name)), i -> "
                    "concat(substring(c_name, 1, i - 1), "
                    "substring(c_name, i + 1, length(c_name))))"
                ),
            )
        ).alias("v"),
    ).select("c_custkey", F.xxhash64("v").alias("vh")).distinct()
    a = variants.select(F.col("c_custkey").alias("key_a"), "vh")
    b = variants.select(F.col("c_custkey").alias("key_b"), "vh")
    cands = (
        a.join(b, "vh")
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .distinct()
    )
    na = c.select(F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"))
    nb = c.select(F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"))
    swap = F.col("name_a") > F.col("name_b")  # canonical order by name
    return (
        cands.join(na, "key_a")
        .join(nb, "key_b")
        .where(F.levenshtein("name_a", "name_b") == 1)
        .select(
            F.when(swap, F.col("key_b")).otherwise(F.col("key_a")).alias("key_a"),
            F.when(swap, F.col("key_a")).otherwise(F.col("key_b")).alias("key_b"),
            F.when(swap, F.col("name_b")).otherwise(F.col("name_a")).alias("name_a"),
            F.when(swap, F.col("name_a")).otherwise(F.col("name_b")).alias("name_b"),
        )
    )


QUERIES = {
    "orders_metrics_unpivot": orders_metrics_unpivot,
    "customer_name_fuzzy_pairs": customer_name_fuzzy_pairs,
    "q1_pricing_summary": q1_pricing_summary,
    "rollup_pricing": rollup_pricing,
    "cube_order_stats": cube_order_stats,
    "grouping_sets_pricing": grouping_sets_pricing,
    "sql_q4_order_priority": sql_q4_order_priority,
    "sql_customer_max_order": sql_customer_max_order,
    "percentile_order_prices": percentile_order_prices,
    "approx_percentile_order_prices": approx_percentile_order_prices,
    "pivot_linestatus": pivot_linestatus,
    "distinct_counts": distinct_counts,
    "approx_distinct_counts": approx_distinct_counts,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_discounted_revenue": q19_discounted_revenue,
    "join_broadcast_part": join_broadcast_part,
    "join_semi_active_customers": join_semi_active_customers,
    "join_anti_idle_customers": join_anti_idle_customers,
    "join_range_price_band": join_range_price_band,
    "window_topk_suppliers": window_topk_suppliers,
    "window_running_customer_spend": window_running_customer_spend,
    "window_event_deltas": window_event_deltas,
    "topk_orders": topk_orders,
    "setops_customer_cohorts": setops_customer_cohorts,
    "events_json_stats": events_json_stats,
    "events_funnel_conversion": events_funnel_conversion,
    "events_user_value_trend": events_user_value_trend,
    "events_user_value_corr": events_user_value_corr,
    "orders_by_month": orders_by_month,
    "string_functions_showcase": string_functions_showcase,
    "array_functions_showcase": array_functions_showcase,
}

ORACLE = {
    "orders_metrics_unpivot": f"""
        WITH w AS (
          SELECT o_orderpriority AS priority,
                 CAST(COUNT(*) AS DOUBLE) AS n_orders,
                 {ex.sql_sum('o_totalprice', 2)} AS sum_price,
                 {ex.sql_avg('o_totalprice', 2)} AS avg_price,
                 MIN(o_totalprice) AS min_price,
                 MAX(o_totalprice) AS max_price
          FROM orders GROUP BY 1
        )
        SELECT priority, 'n_orders' AS metric, n_orders AS value FROM w
        UNION ALL
        SELECT priority, 'sum_price', sum_price FROM w
        UNION ALL
        SELECT priority, 'avg_price', avg_price FROM w
        UNION ALL
        SELECT priority, 'min_price', min_price FROM w
        UNION ALL
        SELECT priority, 'max_price', max_price FROM w
    """,
    # full distance-1 semantics (no prefix restriction): the FastSS
    # deletion-neighborhood blocking is complete for distance <= 1, so
    # the oracle is the plain quadratic definition
    "customer_name_fuzzy_pairs": """
        SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
               a.c_name AS name_a, b.c_name AS name_b
        FROM customer a JOIN customer b
          ON a.c_name < b.c_name
         AND levenshtein(a.c_name, b.c_name) = 1
    """,
    "events_user_value_corr": """
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS t_us, value FROM events
        ), t0 AS (
          SELECT user_id, min(t_us) AS t0_us FROM e GROUP BY user_id
        ), xy AS (
          SELECT e.user_id,
                 CAST((e.t_us - t0.t0_us) // 1000000 AS BIGINT) AS x,
                 CAST(ROUND(e.value * 100) AS BIGINT) AS y
          FROM e JOIN t0 USING (user_id)
        ), agg AS (
          SELECT user_id, COUNT(*) AS n,
                 SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
                 SUM(x*x) AS sxx, SUM(y*y) AS syy
          FROM xy GROUP BY user_id
        )
        SELECT user_id, n,
               CASE WHEN n >= 2
                     AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                    THEN CAST(n*sxy - sx*sy AS DOUBLE)
                         / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                            * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
               END AS r
        FROM agg
    """,
    "events_user_value_trend": """
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS t_us, value FROM events
        ), t0 AS (
          SELECT user_id, min(t_us) AS t0_us FROM e GROUP BY user_id
        ), xy AS (
          SELECT e.user_id,
                 CAST((e.t_us - t0.t0_us) // 1000000 AS BIGINT) AS x,
                 CAST(ROUND(e.value * 100) AS BIGINT) AS y
          FROM e JOIN t0 ON e.user_id = t0.user_id
        ), a AS (
          SELECT user_id, COUNT(*) AS n,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x*y) AS sxy, SUM(x*x) AS sxx
          FROM xy GROUP BY user_id
        )
        SELECT user_id, n,
               CASE WHEN n*sxx - sx*sx <> 0
                    THEN CAST(n*sxy - sx*sy AS DOUBLE)
                         / CAST(n*sxx - sx*sx AS DOUBLE)
               END AS slope_cents_per_s
        FROM a
    """,
    "events_funnel_conversion": """
        WITH v AS (
          SELECT user_id, min(ts) AS view_ts
          FROM events WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
          SELECT e.user_id, min(e.ts) AS click_ts
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.view_ts
          GROUP BY e.user_id
        ), p AS (
          SELECT e.user_id, min(e.ts) AS purchase_ts
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
          GROUP BY e.user_id
        )
        SELECT v.user_id,
               epoch_us(v.view_ts) AS view_us,
               epoch_us(c.click_ts) AS click_us,
               epoch_us(p.purchase_ts) AS purchase_us,
               c.user_id IS NOT NULL AS reached_click,
               p.user_id IS NOT NULL AS reached_purchase
        FROM v
        LEFT JOIN c ON v.user_id = c.user_id
        LEFT JOIN p ON v.user_id = p.user_id
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {ex.sql_sum('l_quantity', 2)} AS sum_qty,
               {ex.sql_sum('l_extendedprice', 2)} AS sum_base_price,
               {ex.sql_sum(_REV, 4)} AS sum_disc_price,
               {ex.sql_sum(_CHARGE, 6)} AS sum_charge,
               {ex.sql_avg('l_quantity', 2)} AS avg_qty,
               {ex.sql_avg('l_extendedprice', 2)} AS avg_price,
               {ex.sql_avg('l_discount', 2)} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "rollup_pricing": f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               {ex.sql_sum('l_quantity', 2)} AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_order_stats": f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS orderpriority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               {ex.sql_sum('o_totalprice', 2)} AS total_price,
               COUNT(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "grouping_sets_pricing": f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               {ex.sql_sum('l_quantity', 2)} AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_linestatus), ())
    """,
    "sql_q4_order_priority": _SQL_Q4_PRIORITY,
    "sql_customer_max_order": _SQL_MAX_ORDER,
    "array_functions_showcase": """
        WITH agg AS (
          SELECT l_orderkey,
                 list_sort(list(l_linenumber)) AS lines,
                 list_sort(list(DISTINCT l_returnflag)) AS flags
          FROM lineitem GROUP BY l_orderkey
        )
        SELECT l_orderkey,
               CAST(len(lines) AS INTEGER) AS n_lines,
               lines[1] AS first_line,
               lines[-1] AS last_line,
               CAST(len(flags) AS INTEGER) AS n_flags,
               list_contains(flags, 'R') AS has_return,
               array_to_string(flags, ',') AS flags_csv
        FROM agg
    """,
    "percentile_order_prices": """
        SELECT c_mktsegment AS mktsegment,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.9) AS p90,
               COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "pivot_linestatus": """
        SELECT l_returnflag,
               COALESCE(CAST(SUM(CAST(ROUND(l_quantity * 100.0) AS HUGEINT))
                             FILTER (WHERE l_linestatus = 'O') AS DOUBLE) / 100.0,
                        0.0) AS qty_open,
               COALESCE(CAST(SUM(CAST(ROUND(l_quantity * 100.0) AS HUGEINT))
                             FILTER (WHERE l_linestatus = 'F') AS DOUBLE) / 100.0,
                        0.0) AS qty_filled
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "distinct_counts": """
        SELECT COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
    """,
    # banded validation shape: the engine asserts its HLL/GK estimate
    # sits inside the documented error band of the exact value it also
    # computes; the oracle recomputes the exact side and expects TRUE
    # flags (raw sketch estimates can never hash-match across engines)
    "approx_distinct_counts": """
        SELECT COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               TRUE AS parts_within_rsd,
               TRUE AS orders_within_rsd
        FROM lineitem
    """,
    "approx_percentile_order_prices": """
        SELECT c_mktsegment AS mktsegment,
               COUNT(*) AS n,
               TRUE AS p50_in_band,
               TRUE AS p90_in_band
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority AS orderpriority,
               {ex.sql_sum(_REV, 4)} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-06-15'
          AND l_shipdate > TIMESTAMP '1997-06-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_local_supplier_volume": f"""
        SELECT n_name AS nation,
               {ex.sql_sum(_REV, 4)} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q6_forecast_revenue": f"""
        SELECT {ex.sql_sum('l_extendedprice * l_discount', 4)} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name AS nation,
               {ex.sql_quantize('c_acctbal', 2)} AS acctbal,
               {ex.sql_sum(_REV, 4)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY c_custkey, c_name, n_name, c_acctbal
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q14_promo_revenue": f"""
        WITH agg AS (
          SELECT {ex.sql_sum(
              "CASE WHEN p_type = 'PROMO' THEN " + _REV + " ELSE 0.0 END", 4
          )} AS promo_revenue,
                 {ex.sql_sum(_REV, 4)} AS total_revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-03-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
        )
        SELECT promo_revenue, total_revenue,
               100.0 * promo_revenue / total_revenue AS promo_pct
        FROM agg
    """,
    "q18_large_volume_customers": f"""
        WITH big AS (
          SELECT l_orderkey, {ex.sql_sum('l_quantity', 2)} AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING {ex.sql_sum('l_quantity', 2)} > 250
        )
        SELECT c_name, c_custkey, o_orderkey AS orderkey,
               {ex.sql_quantize('o_totalprice', 2)} AS totalprice,
               sum_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY totalprice DESC, orderkey
        LIMIT 100
    """,
    "q19_discounted_revenue": f"""
        SELECT {ex.sql_sum(_REV, 4)} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#3' AND l_quantity BETWEEN 1 AND 11
               AND p_size <= 5)
           OR (p_brand = 'Brand#12' AND l_quantity BETWEEN 10 AND 20
               AND p_size <= 10)
           OR (p_brand = 'Brand#21' AND l_quantity BETWEEN 20 AND 30
               AND p_size <= 15)
    """,
    "join_broadcast_part": f"""
        SELECT p_brand AS brand,
               {ex.sql_sum('l_quantity', 2)} AS sum_qty,
               {ex.sql_sum(_REV, 4)} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "join_semi_active_customers": """
        SELECT c_mktsegment AS mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
        GROUP BY c_mktsegment
    """,
    "join_anti_idle_customers": """
        SELECT n_name AS nation, COUNT(*) AS n_idle
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY n_name
    """,
    "join_range_price_band": f"""
        WITH bands(band, lo, hi) AS (
            VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
                   ('high', 150000.0, 300000.0), ('lux', 300000.0, 1e18)
        )
        SELECT band, COUNT(*) AS n_orders,
               {ex.sql_sum('o_totalprice', 2)} AS total
        FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
    """,
    "window_topk_suppliers": f"""
        WITH rev AS (
            SELECT n_name, s_suppkey, s_name,
                   {ex.sql_sum(_REV, 4)} AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name, s_suppkey, s_name
        ), ranked AS (
            SELECT n_name, s_name, revenue,
                   ROW_NUMBER() OVER (PARTITION BY n_name
                                      ORDER BY revenue DESC, s_suppkey ASC) AS rank
            FROM rev
        )
        SELECT n_name AS nation, s_name AS supplier, revenue,
               CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3
    """,
    "window_running_customer_spend": f"""
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               {ex.sql_sum_over(
                   'o_totalprice', 2,
                   'PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey '
                   'ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW')}
                   AS running_spend,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                   AS INTEGER) AS order_seq
        FROM orders
    """,
    "window_event_deltas": """
        SELECT user_id, event_id,
               ROUND((value - LAG(value, 1) OVER w) * 100.0) / 100.0 AS delta_prev,
               LEAD(event_type, 1) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    "topk_orders": """
        SELECT o_orderkey, ROUND(o_totalprice * 100.0) / 100.0 AS totalprice,
               o_orderpriority AS priority
        FROM orders
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "setops_customer_cohorts": """
        WITH c95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
             c96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        SELECT (SELECT COUNT(*) FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)) AS in_both,
               (SELECT COUNT(*) FROM (SELECT * FROM c95 UNION SELECT * FROM c96)) AS in_either,
               (SELECT COUNT(*) FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96)) AS only_1995
    """,
    "events_json_stats": f"""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               {ex.sql_avg('value', 2)} AS avg_value
        FROM events
        GROUP BY event_type
    """,
    "orders_by_month": f"""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               COUNT(*) AS n_orders,
               {ex.sql_sum('o_totalprice', 2)} AS total
        FROM orders
        GROUP BY 1
    """,
    "string_functions_showcase": """
        SELECT p_partkey,
               upper(p_brand) || '/' || lower(p_type) AS brand_type,
               substring(p_name, 1, 8) AS name_prefix,
               CAST(length(p_name) AS INTEGER) AS name_len,
               CAST(length(p_name) - length(replace(p_name, ' ', '')) AS BIGINT) AS n_spaces
        FROM part
    """,
}
