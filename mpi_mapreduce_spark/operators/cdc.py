"""Change-data-capture merge: upsert + delete as one declarative plan.

The reference is strictly append-compute-emit (one pass over immutable
text files, SURVEY.md §3); a usable engine also needs the MERGE INTO
shape — apply a batch of changes (updates, inserts, tombstones) to a
keyed snapshot. Vanilla Spark has no MERGE statement without a table
format, but the semantics compose from two primitives:

    survivors = target LEFT ANTI JOIN source ON keys
    merged    = survivors UNION ALL (source WHERE NOT tombstone)

Source rows win wholesale (last-writer-wins per key, the Delta/Iceberg
default); tombstoned keys vanish from both sides.

Scale notes (100 TB): the anti join and the union are one shuffle on
the merge keys — or zero shuffles if the target is maintained with
sources/io.write_bucketed on those keys (the CDC batch is typically
small enough to broadcast, making merge a map-side operation over the
bucketed snapshot). Equality is on keys only, so no wide-row compare;
the union is lazy and feeds the next compaction pass
(sources/io.compact_and_cluster) rather than materializing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.functions import exact as ex


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Apply a keyed change batch: source rows replace target rows on
    `keys`, unmatched source rows insert, and rows with
    `tombstone_col` true delete their key. Column sets must match
    (minus the tombstone flag)."""
    keys = list(keys)
    survivors = target.join(source.select(*keys), keys, "left_anti")
    live = source
    if tombstone_col is not None:
        live = source.where(~F.col(tombstone_col)).drop(tombstone_col)
    return survivors.unionByName(live)


def cdc_orders_rollforward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CDC demo on the orders snapshot: every 10th key
    gets a status/price update, every 97th is tombstoned, and a
    shifted key range inserts — then the merged state is audited per
    status. The change batch is derived arithmetic (no randomness), so
    the DuckDB oracle can replay the identical merge."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    upd = (
        orders.where((key % 10 == 0) & (key % 97 != 0))
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn(
            "o_totalprice",
            (F.round(F.col("o_totalprice") * 100).cast("long") + 100000).cast(
                "double"
            )
            / 100.0,
        )
        .withColumn("__deleted", F.lit(False))
    )
    ins = (
        orders.where(key % 1000 == 0)
        .withColumn("o_orderkey", key + 10_000_000)
        .withColumn("__deleted", F.lit(False))
    )
    tomb = orders.where(key % 97 == 0).withColumn("__deleted", F.lit(True))
    changes = upd.unionByName(ins).unionByName(tomb)
    merged = merge_upsert(orders, changes, ["o_orderkey"], "__deleted")
    return merged.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n_orders"),
        ex.quantized_sum("o_totalprice", 2).alias("total_price"),
    )


QUERIES = {"cdc_orders_rollforward": cdc_orders_rollforward}

ORACLE = {
    "cdc_orders_rollforward": f"""
        WITH upd AS (
          SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
                 CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100000
                      AS DOUBLE) / 100.0 AS o_totalprice,
                 o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 97 <> 0
        ), ins AS (
          SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 1000 = 0
        ), survivors AS (
          SELECT * FROM orders
          WHERE o_orderkey % 10 <> 0 AND o_orderkey % 97 <> 0
        ), merged AS (
          SELECT * FROM survivors
          UNION ALL SELECT * FROM upd
          UNION ALL SELECT * FROM ins
        )
        SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
               {ex.sql_sum('o_totalprice', 2)} AS total_price
        FROM merged GROUP BY 1
    """,
}
