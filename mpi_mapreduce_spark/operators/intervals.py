"""Binned interval joins — the big-big range join the engine needs
when NEITHER side fits in a broadcast.

Spark's native options for `point BETWEEN lo AND hi` are
BroadcastNestedLoopJoin (fine for a small side — relational.py's
price bands) or a cartesian product (never). The scale pattern is
**bucketization**: quantize time into fixed bins, explode each
interval to the bins it covers, map each point to its single bin, and
equi-join on the bin — O(rows · bins-per-interval) work, an ordinary
hash shuffle on a dense integer key, no quadratic anywhere. Because a
point lies in exactly one bin, each qualifying (interval, point) pair
meets exactly once: no dedup pass is needed, only the exact
containment re-check.

Pick the bin width ≈ the typical interval length: shorter bins blow
up the interval explode; longer bins blow up the per-bin candidate
cross-section. Skewed hot bins (an interval storm) fall back to the
same salting used in operators/skew.py.

The reference has no joins at all (SURVEY.md §2.3); this is the [NS]
temporal-correlation operator of the events pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table

#: incident window: ±5 minutes around each error event
INCIDENT_HALF_WINDOW_US = 5 * 60 * 1_000_000
#: bin width = the window length — each interval covers ≤ 3 bins
BIN_WIDTH_US = 2 * INCIDENT_HALF_WINDOW_US


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    lo: str,
    hi: str,
    t: str,
    bin_width: int,
) -> DataFrame:
    """Generic binned interval-point inner join: returns
    intervals ⨝ points where ``points[t]`` ∈ [lo, hi]. All three key
    columns are integer microseconds (or any monotone integer clock).
    Result columns = intervals' ∪ points' columns."""

    def _bin(c: Column) -> Column:
        return F.floor(c / F.lit(bin_width))

    binned_iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(_bin(F.col(lo)), _bin(F.col(hi)))),
    )
    binned_pt = points.withColumn("_bin", _bin(F.col(t)))
    return (
        binned_iv.join(binned_pt, "_bin")
        .where((F.col(t) >= F.col(lo)) & (F.col(t) <= F.col(hi)))
        .drop("_bin")
    )


def events_incident_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal blast-radius of every error: how many non-error events
    (and distinct users) fall within ±5 minutes of it, regardless of
    user — a no-equi-key interval join both of whose sides scale with
    the stream."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        (F.unix_micros("ts") - INCIDENT_HALF_WINDOW_US).alias("lo_us"),
        (F.unix_micros("ts") + INCIDENT_HALF_WINDOW_US).alias("hi_us"),
    )
    others = ev.where(F.col("event_type") != "error").select(
        F.col("event_id").alias("other_id"),
        F.col("user_id").alias("other_user"),
        F.unix_micros("ts").alias("t_us"),
    )
    pairs = interval_point_join(
        errors, others, "lo_us", "hi_us", "t_us", BIN_WIDTH_US
    )
    return pairs.groupBy("error_id").agg(
        F.count("*").alias("n_nearby"),
        F.countDistinct("other_user").alias("n_users"),
    )


QUERIES = {
    "events_incident_correlation": events_incident_correlation,
}

ORACLE = {
    "events_incident_correlation": """
        WITH inc AS (
          SELECT event_id AS error_id,
                 ts - INTERVAL 5 MINUTE AS lo,
                 ts + INTERVAL 5 MINUTE AS hi
          FROM events WHERE event_type = 'error'
        ), pts AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type <> 'error'
        )
        SELECT error_id,
               COUNT(*) AS n_nearby,
               COUNT(DISTINCT user_id) AS n_users
        FROM inc JOIN pts ON pts.ts >= inc.lo AND pts.ts <= inc.hi
        GROUP BY error_id
    """,
}
