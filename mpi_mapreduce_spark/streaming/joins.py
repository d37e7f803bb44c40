"""Stream-stream time-interval join — click→purchase attribution.

The reference has nothing like this (batch-only, one dataset in
flight; SURVEY.md §2.3/§2.9); Structured Streaming's stream-stream
join is the [NS] capability that makes the events pattern complete.

Semantics: each purchase matches every click by the same user in the
preceding ATTRIBUTION_WINDOW. Written against plain DataFrames so the
same body serves batch (oracle-checked) and streaming (tested against
the batch twin via a memory sink).

Scale: a streaming inner join buffers both sides in state. Watermarks
on BOTH inputs plus the two-sided time-interval condition let the
engine evict — a click older than watermark + window can never match a
future purchase — so state is bounded by rate x window, independent of
stream length. Batch mode plans a plain shuffled equi-join on user_id
with the interval as a post-filter; at 100 TB both sides partition on
user_id and nothing is quadratic (per-user fan-out is bounded by the
window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.streaming.windows import stream_events

ATTRIBUTION_WINDOW = "30 minutes"
#: watermark for the streaming form — how late events may arrive
JOIN_WATERMARK = "10 minutes"


def click_purchase_pairs(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """(user_id, click_id, purchase_id, delta_us) for every purchase
    within ATTRIBUTION_WINDOW after a click by the same user. delta_us
    is exact integer microseconds (no float rounding to diverge from
    the oracle)."""
    c = clicks.select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    cond = (
        (c["user_id"] == p["p_user_id"])
        & (p["purchase_ts"] >= c["click_ts"])
        & (p["purchase_ts"] <= c["click_ts"] + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
    )
    return c.join(p, cond).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("delta_us"),
    )


def streaming_click_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming form: two watermarked filters over the same source
    stream, inner interval join, append-mode capable."""
    ev = stream_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").withWatermark(
        "ts", JOIN_WATERMARK
    )
    purchases = ev.where(F.col("event_type") == "purchase").withWatermark(
        "ts", JOIN_WATERMARK
    )
    return click_purchase_pairs(clicks, purchases)


# ---------------------------------------------------------------------------
# Registry (batch mode, oracle-checked)
# ---------------------------------------------------------------------------

def events_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return click_purchase_pairs(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    )


def click_purchase_attribution(
    clicks: DataFrame, purchases: DataFrame
) -> DataFrame:
    """Left-outer form of click_purchase_pairs: every click appears —
    matched clicks with their purchase(s), abandoned clicks once with
    NULL purchase — the attribution report marketing actually reads
    (conversion AND abandonment in one result).

    In streaming mode this is the harder join flavor: an unmatched
    click can only emit once the watermark proves no future purchase
    can still match (click_ts + window < watermark), so outer rows
    trail the inner ones by the watermark delay; state stays bounded
    by the same eviction rule as the inner join."""
    c = clicks.select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    cond = (
        (c["user_id"] == p["p_user_id"])
        & (p["purchase_ts"] >= c["click_ts"])
        & (
            p["purchase_ts"]
            <= c["click_ts"] + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        )
    )
    return c.join(p, cond, "left_outer").select(
        "user_id",
        "click_id",
        "purchase_id",
        (
            F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
        ).alias("delta_us"),
    )


def streaming_click_purchase_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming left-outer interval join (append mode): inner rows
    emit as they match; NULL-purchase rows emit when the click's
    match window expires past the watermark."""
    ev = stream_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").withWatermark(
        "ts", JOIN_WATERMARK
    )
    purchases = ev.where(F.col("event_type") == "purchase").withWatermark(
        "ts", JOIN_WATERMARK
    )
    return click_purchase_attribution(clicks, purchases)


def events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return click_purchase_attribution(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    )


QUERIES = {
    "events_click_purchase_join": events_click_purchase_join,
    "events_click_attribution": events_click_attribution,
}

ORACLE = {
    "events_click_purchase_join": """
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    "events_click_attribution": """
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
}
