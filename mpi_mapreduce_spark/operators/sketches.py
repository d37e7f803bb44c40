"""Mergeable sketch rollups: HyperLogLog distinct-count tables.

The reference's only aggregate is an exact int sum (reference
tasks.c:149-161). At 100 TB, COUNT(DISTINCT) is the aggregate that
stops scaling — it shuffles every distinct value. The production
pattern is a *sketch table*: pre-aggregate each partition/day into a
fixed-size HLL sketch (Spark's Apache DataSketches binding,
`hll_sketch_agg`), store sketches as binary columns, and answer any
coarser rollup by `hll_union_agg` over the stored sketches — register-
wise max, commutative and associative, so re-aggregation never touches
the raw data again. A day's sketch is ~KBs regardless of row count;
the weekly/all-time rollup reads sketches, not events.

Sketch binaries and estimates are engine-specific, so the registered
query emits the exact distinct count (independently computed) plus a
boolean asserting the sketch estimate lands within the documented
error band — hash-comparable against a DuckDB oracle expecting TRUE.
Accuracy and the merge-equals-direct identity are additionally pinned
in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table

LG_K = 12  #: 4096 registers — ±1.6% relative standard error


def daily_user_sketches(events: DataFrame) -> DataFrame:
    """The stored sketch table: one HLL per (day, event_type)."""
    return events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sk"),
        F.count("*").alias("n_events"),
    )


def hll_user_rollup_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch-table rollup (daily HLLs → union → estimate) —
    unregistered helper; pytest pins estimate error and the
    merge-equals-direct identity."""
    daily = daily_user_sketches(load_table(spark, sf_dir, "events"))
    return daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )


def events_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type, computed the sketch-table way:
    daily sketches first, then a union rollup — the plan a 100 TB
    deployment runs nightly (sketch build) and at query time (union
    over ~365 tiny sketches instead of a year of raw events).

    Driver-compared output: exact distincts + n_days/n_events (all
    SQL-oracle-able) and a flag asserting the union-rollup estimate
    sits within 3× the lgK=12 rse (±1.6%) of exact — TRUE in the
    oracle."""
    ev = load_table(spark, sf_dir, "events")
    daily = daily_user_sketches(ev)
    rollup = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    return rollup.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "n_events",
        "n_users",
        (
            F.abs(F.col("est") - F.col("n_users")) <= 0.05 * F.col("n_users")
        ).alias("est_within_rse"),
    )


QUERIES = {"events_hll_user_rollup": events_hll_user_rollup}

ORACLE: dict[str, str] = {
    "events_hll_user_rollup": """
        SELECT event_type,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               TRUE AS est_within_rse
        FROM events
        GROUP BY event_type
    """,
}
