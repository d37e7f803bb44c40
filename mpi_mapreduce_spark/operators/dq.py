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
from mpi_mapreduce_spark.functions import exact as ex


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


PROFILE_VAL_LEN = 40  #: min/max rendered as strings, truncated


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profiler: per column, non-null/null counts,
    exact distinct cardinality, and stringified min/max — the stats
    report run before any table is promoted to training input.

    All metrics land in ONE aggregate; Spark plans the multiple
    COUNT(DISTINCT)s as a single Expand + two-phase aggregate (one
    scan, one shuffle). The single result row is then exploded into
    the long (col_name, metric...) shape. Exact distinct keeps the
    DuckDB oracle bit-exact; at 100 TB swap approx_count_distinct /
    the HLL sketch table (operators/sketches.py) — same plan minus
    the Expand."""
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.substring(F.min(c).cast("string"), 1, PROFILE_VAL_LEN).alias(
                f"__min_{c}"
            ),
            F.substring(F.max(c).cast("string"), 1, PROFILE_VAL_LEN).alias(
                f"__max_{c}"
            ),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__nn_{c}").alias("n_nonnull"),
                F.coalesce(F.col(f"__null_{c}"), F.lit(0)).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def dq_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents corpus."""
    return profile_table(load_table(spark, sf_dir, "documents"))


#: a key whose heaviest value is ≥ this multiple of the uniform share
#: gets a salting recommendation (AQE's skewed-partition factor is 5
#: per partition; 16 per KEY is well past what AQE can rebalance)
SKEW_SALT_FACTOR = 16


def skew_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Shuffle-key skew diagnostics: for each candidate key column,
    the distinct-key count, the heaviest key and its row count, the
    skew factor (max_count · n_keys / n_rows — 1.0 is uniform), and
    whether the §4 salting guidance applies.

    This is the report that decides the salting/AQE strategy BEFORE a
    100 TB backfill runs: one grouped count per key column (map-side
    combine), a one-row aggregate over the counts, and a broadcast
    join back to name the heaviest key (min key string on ties, so the
    result is deterministic). Nothing here is ever wider than one row
    per distinct key."""
    outs = []
    for c in key_cols:
        counts = df.groupBy(F.col(c).cast("string").alias("k")).agg(
            F.count("*").alias("cnt")
        )
        stats = counts.agg(
            F.count("*").alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_count"),
        )
        hot = (
            counts.join(
                F.broadcast(stats), F.col("cnt") == F.col("max_count")
            )
            .groupBy("n_keys", "n_rows", "max_count")
            .agg(F.min("k").alias("hot_key"))
        )
        outs.append(
            hot.select(
                F.lit(c).alias("key_col"),
                "n_rows",
                "n_keys",
                "max_count",
                "hot_key",
                ex.quantize(
                    F.col("max_count").cast("double")
                    * F.col("n_keys")
                    / F.col("n_rows"),
                    6,
                ).alias("skew_factor"),
                (
                    F.col("max_count") * F.col("n_keys")
                    >= F.lit(SKEW_SALT_FACTOR) * F.col("n_rows")
                ).alias("recommend_salting"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def dq_skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew report over the events table's two natural shuffle keys."""
    return skew_report(
        load_table(spark, sf_dir, "events"), ["user_id", "event_type"]
    )


QUERIES = {
    "dq_audit_orders": dq_audit_orders,
    "dq_profile_documents": dq_profile_documents,
    "dq_skew_report_events": dq_skew_report_events,
}

def _profile_oracle(table: str, cols: list[str]) -> str:
    parts = [
        f"""
        SELECT '{c}' AS col_name,
               COUNT({c}) AS n_nonnull,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               substring(CAST(MIN({c}) AS VARCHAR), 1, {PROFILE_VAL_LEN})
                 AS min_val,
               substring(CAST(MAX({c}) AS VARCHAR), 1, {PROFILE_VAL_LEN})
                 AS max_val
        FROM {table}
        """
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def _skew_oracle(table: str, cols: list[str]) -> str:
    ctes, selects = [], []
    for c in cols:
        ctes.append(
            f"""c_{c} AS (
              SELECT CAST({c} AS VARCHAR) AS k, COUNT(*) AS cnt
              FROM {table} GROUP BY 1
            ), s_{c} AS (
              SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
                     MAX(cnt) AS max_count
              FROM c_{c}
            )"""
        )
        selects.append(
            f"""SELECT '{c}' AS key_col, n_rows, n_keys, max_count,
               (SELECT MIN(k) FROM c_{c} WHERE c_{c}.cnt = s_{c}.max_count)
                 AS hot_key,
               ROUND((CAST(max_count AS DOUBLE) * n_keys / n_rows)
                     * 1000000.0) / 1000000.0 AS skew_factor,
               max_count * n_keys >= {SKEW_SALT_FACTOR} * n_rows
                 AS recommend_salting
            FROM s_{c}"""
        )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


ORACLE = {
    "dq_skew_report_events": _skew_oracle("events", ["user_id", "event_type"]),
    "dq_profile_documents": _profile_oracle(
        "documents", ["doc_id", "text", "lang", "source", "n_chars"]
    ),
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
