"""Event-time windowing over the ``events`` table — Structured
Streaming operators with batch-mode twins.

The reference has no streaming at all; its closest artifact is the
EOS-sentinel termination protocol (reference main.cpp:236-243,
254-266), which is punctuation, not event time (SURVEY.md §2.9). The
engine provides real event-time processing: tumbling / sliding /
session windows, watermark late-data policy, and streaming dedup.

Design: every transformation here is written against a plain DataFrame
so the SAME function body serves both `spark.read` (batch, used by the
driver's DuckDB oracle gate) and `spark.readStream` (incremental,
exercised in tests with a memory sink). That's the point of Structured
Streaming — one declarative plan, two execution modes.

Scale: windowed aggregations shuffle on (window, key) — bounded state
per window x key; watermarks bound total state for unbounded streams.
Session windows keep per-key open-session state; the 5-minute gap +
watermark caps it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.functions import exact as ex

TUMBLE = "10 minutes"
SLIDE_WIN = "10 minutes"
SLIDE_STEP = "5 minutes"
SESSION_GAP = "5 minutes"
WATERMARK = "10 minutes"


def _fmt(ts_col) -> F.Column:
    return F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# Transformations (batch OR stream input)
# ---------------------------------------------------------------------------

def tumbling_counts(events: DataFrame) -> DataFrame:
    """10-minute tumbling windows per event_type."""
    return (
        events.groupBy(F.window("ts", TUMBLE).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), ex.quantized_sum("value", 2).alias("sum_value"))
        .select(
            _fmt("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in 2."""
    return (
        events.groupBy(F.window("ts", SLIDE_WIN, SLIDE_STEP).alias("w"))
        .agg(F.count("*").alias("n"), ex.quantized_avg("value", 2).alias("avg_value"))
        .select(_fmt("w.start").alias("window_start"), "n", "avg_value")
    )


def session_stats(events: DataFrame) -> DataFrame:
    """Per-user session windows with a 5-minute inactivity gap."""
    return (
        events.groupBy(
            F.session_window("ts", SESSION_GAP).alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), ex.quantized_sum("value", 2).alias("sum_value"))
        .select(
            "user_id",
            _fmt("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def first_event_per_user_type(events: DataFrame) -> DataFrame:
    """Streaming-dedup twin: keep each user's first event of each type.
    Batch form = row_number window; streaming form = dropDuplicates
    (tested equivalent in tests/test_streaming.py)."""
    w = W.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


# ---------------------------------------------------------------------------
# Streaming entry points (readStream → transformation)
# ---------------------------------------------------------------------------

#: events schema when the file stores raw epoch-nanos longs (parquet
#: TIMESTAMP(NANOS) read under nanosAsLong). Only ONE of the possible
#: raw layouts — stream_events probes the actual file instead of
#: assuming this; exported for tests that construct nanos fixtures.
EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (stand-in for Kafka etc.);
    one file = one micro-batch driver for tests.

    A streaming source needs a declared schema, so we probe the BATCH
    read of the same file to learn which raw ts layout it carries
    (long-of-nanos vs µs timestamp — the same dual-format handling as
    datamodel.load_table), declare exactly that, then normalize through
    the shared datamodel.normalize_event_ts helper so batch and stream
    event time cannot diverge."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(path).schema
    raw = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        # glob, not bare file path: a streaming source's basePath must
        # be a directory
        .load(f"{sf_dir}/events.parque[t]")
    )
    from mpi_mapreduce_spark.datamodel import normalize_event_ts

    return normalize_event_ts(raw)


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming variant of tumbling_counts — append-mode
    capable: state for a window is dropped once the watermark passes."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", WATERMARK)
    return tumbling_counts(ev)


# ---------------------------------------------------------------------------
# Registry (batch mode, oracle-checked)
# ---------------------------------------------------------------------------

def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(_ev(spark, sf_dir))


def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(_ev(spark, sf_dir))


def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats(_ev(spark, sf_dir))


def events_first_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return first_event_per_user_type(_ev(spark, sf_dir))


def events_resampled_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resample: hourly rollup per event_type on a
    DENSE time grid — buckets with no events appear with zero counts
    (the map2 zero-keeping lesson, SURVEY §7 'what's hard' (a), applied
    to time series: a dashboard needs the gaps, not just the hits).

    The grid is generated WITH Spark (sequence over the min/max
    bounds, exploded), not collected at the driver: grid x types is a
    tiny frame that broadcast-left-joins the aggregate. At 100 TB the
    aggregate side shuffles once on (bucket, type); the grid stays
    O(hours x types) regardless of row count."""
    ev = _ev(spark, sf_dir)
    agg = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            ex.quantized_sum("value", 2).alias("sum_value"),
        )
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    return (
        # broadcast: the distinct-types side is a bounded aggregate
        # (event-type cardinality, not data volume) — without the hint
        # a high-cardinality estimate could plan a shuffled cartesian
        grid.crossJoin(F.broadcast(types))
        .join(agg, ["bucket", "event_type"], "left")
        .select(
            _fmt("bucket").alias("bucket_start"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


TRENDING_K = 2


def trending_types(events: DataFrame) -> DataFrame:
    """Top-K trending event types per 10-minute window: rank by count
    within each window (count desc, type asc tiebreak — deterministic
    in any engine). Batch form ranks directly; the streaming form is
    the materialized-view pattern — the windowed COUNT streams
    incrementally, and the cheap rank-over-windows re-derives per
    micro-batch in foreachBatch (two chained stateful ops aren't
    expressible in one streaming plan; the re-rank input is already
    aggregated, so it's O(windows × types), not O(events))."""
    counts = events.groupBy(
        F.window("ts", TUMBLE).alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))
    rw = W.partitionBy("w").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= TRENDING_K)
        .select(
            _fmt("w.start").alias("window_start"),
            "event_type",
            "n",
            "rank",
        )
    )


def events_trending_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trending_types(_ev(spark, sf_dir))


QUERIES = {
    "events_tumbling_counts": events_tumbling_counts,
    "events_trending_types": events_trending_types,
    "events_resampled_gapfill": events_resampled_gapfill,
    "events_sliding_counts": events_sliding_counts,
    "events_session_stats": events_session_stats,
    "events_first_per_user_type": events_first_per_user_type,
}

ORACLE = {
    "events_trending_types": """
        WITH counts AS (
          SELECT strftime(time_bucket(INTERVAL '10 minutes', ts),
                          '%Y-%m-%d %H:%M:%S') AS window_start,
                 event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT window_start, event_type, n, CAST(rank AS INTEGER) AS rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                       ORDER BY n DESC, event_type) AS rank
          FROM counts
        ) WHERE rank <= 2
    """,
    "events_resampled_gapfill": f"""
        WITH b AS (
          SELECT date_trunc('hour', min(ts)) AS lo,
                 date_trunc('hour', max(ts)) AS hi
          FROM events
        ), grid AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
          FROM b
        ), types AS (
          SELECT DISTINCT event_type FROM events
        ), agg AS (
          SELECT date_trunc('hour', ts) AS bucket, event_type,
                 COUNT(*) AS n,
                 {ex.sql_sum('value', 2)} AS sum_value
          FROM events GROUP BY 1, 2
        )
        SELECT strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
               t.event_type,
               COALESCE(a.n, 0) AS n,
               COALESCE(a.sum_value, 0.0) AS sum_value
        FROM grid g
        CROSS JOIN types t
        LEFT JOIN agg a ON a.bucket = g.bucket AND a.event_type = t.event_type
    """,
    "events_tumbling_counts": f"""
        SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               COUNT(*) AS n,
               {ex.sql_sum('value', 2)} AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    # sliding windows: each event belongs to buckets b and b-5min where
    # b = floor(ts, 5 minutes)
    "events_sliding_counts": f"""
        WITH expanded AS (
          SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                         time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS ws,
                 value
          FROM events
        )
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n,
               {ex.sql_avg('value', 2)} AS avg_value
        FROM expanded
        GROUP BY 1
    """,
    # gaps-and-islands sessionization: Spark's session_window(ts, gap)
    # semantics — a session extends while successive events are < gap
    # apart; window start = first event ts
    "events_session_stats": f"""
        WITH seq AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL '5 minutes'
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ), sess AS (
          SELECT user_id, ts, value,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM seq
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               COUNT(*) AS n_events,
               {ex.sql_sum('value', 2)} AS sum_value
        FROM sess
        GROUP BY user_id, sid
    """,
    "events_first_per_user_type": """
        SELECT user_id, event_type, event_id FROM (
          SELECT user_id, event_type, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY event_id) AS rn
          FROM events
        ) WHERE rn = 1
    """,
}
