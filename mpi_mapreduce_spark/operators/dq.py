"""Data-quality audit — the validation stage every ingest pipeline
runs before publishing a table.

The reference trusts its inputs completely (raw fread into a buffer,
reference main.cpp:36-47 — no validation anywhere); at 100 TB, "trust"
is a nightly audit job instead. One pass computes the constraint
violations; referential integrity is a single left-anti join against
the dimension (broadcast — the only non-scan work in the audit).

Output is one summary row (counts per violation class), which is the
shape a freshness/quality dashboard or a circuit-breaker consumes
("block the publish if n_orphans > 0").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table


def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit of `orders`: nulls, domain violations, range
    violations, and referential orphans vs `customer`."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orphans = orders.join(
        F.broadcast(cust),
        orders.o_custkey == cust.c_custkey,
        "left_anti",
    ).count()
    return orders.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("n_null_custkey"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias(
            "n_nonpositive_price"
        ),
        F.sum(
            (~F.col("o_orderstatus").isin("F", "O", "P")).cast("long")
        ).alias("n_bad_status"),
        F.sum(
            (F.col("o_orderdate") > F.lit("2026-01-01").cast("timestamp")).cast(
                "long"
            )
        ).alias("n_future_dates"),
    ).withColumn("n_orphan_custkey", F.lit(orphans).cast("long"))


QUERIES = {
    "dq_audit_orders": dq_audit_orders,
}

ORACLE = {
    "dq_audit_orders": """
        SELECT COUNT(*) AS n_rows,
               CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null_custkey,
               CAST(COALESCE(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nonpositive_price,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_bad_status,
               CAST(COALESCE(SUM(CASE WHEN o_orderdate > TIMESTAMP '2026-01-01' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_future_dates,
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey)) AS n_orphan_custkey
        FROM orders
    """,
}
