"""Relational operators over the star schema — all Catalyst built-ins.

The reference has no joins, windows, sorts, or set ops (SURVEY.md
§2.3-2.7); the engine provides them via declarative DataFrame plans so
Catalyst does predicate pushdown, column pruning, join selection and
AQE re-planning. Every query aliases its computed columns identically
to its DuckDB oracle (driver hash-compares by sorted column name).

Float discipline: aggregate doubles are ROUNDed in both engines so the
order-of-addition nondeterminism of distributed sums can't flip the
value hash.

Scale notes are per-query docstrings; the common themes:
- dimension tables (region/nation/supplier/part/customer) broadcast —
  no shuffle of the fact table for those joins;
- fact-fact joins (lineitem x orders) shuffle on the join key once and
  reuse that partitioning through the downstream agg where possible;
- top-k is TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mpi_mapreduce_spark.datamodel import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q1 — pricing summary (TPC-H Q1 shape): scan → filter → 8-agg groupBy.
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter pushes to the parquet scan; grouped agg runs partial →
    shuffle(2 keys x 3 flags = 6 groups) → final. At 100 TB the shuffle
    carries only per-partition partials (6 rows each)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_Q1 = """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
}

ORACLE = {
    "q1_pricing_summary": ORACLE_Q1,
}
