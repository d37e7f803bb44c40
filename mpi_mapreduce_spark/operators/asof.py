"""As-of (time-travel) join — the one join flavor Spark has no native
operator for (SURVEY.md §2.3: reference has no joins at all; this is
an engine extension listed there).

Semantics: for each left row, attach the latest right row of the same
key whose timestamp is <= the left row's timestamp (LEFT ASOF JOIN —
unmatched left rows keep nulls).

Implementation is the *scalable* union trick, not pd.merge_asof:

    union(left tagged 1, right tagged 0)
      -> window partitionBy(key).orderBy(ts, side, seq)
           rowsBetween(unboundedPreceding, currentRow)
      -> last(right_payload, ignorenulls=True)
      -> filter side = 1

Why this shape at 100 TB: ONE shuffle on the join key, then a
streaming window scan per partition — state is a single struct (the
most recent right payload), never a buffered range. A range-join
(l.ts BETWEEN ...) would explode to BroadcastNestedLoopJoin; a
merge_asof in applyInPandas would materialize each key group in one
Python worker. Skewed keys can be salted by time-bucketing the window
key; AQE handles moderate skew.

Ordering details that make it exact:
- right rows sort BEFORE left rows at equal ts (side 0 < 1), giving
  the inclusive <= match of a standard ASOF join;
- among equal-ts right rows, `right_seq` breaks the tie
  deterministically (the max wins, same on any engine/partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mpi_mapreduce_spark.datamodel import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_seq: str,
    right_prefix: str = "r_",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """LEFT ASOF JOIN with pandas-merge_asof-parity options.

    - direction="backward" (default): latest right row with
      right_ts <= left_ts per key (tie among equal right timestamps →
      max right_seq).
    - direction="forward": earliest right row with right_ts >= left_ts
      (tie → min right_seq). Same ONE-shuffle union+window plan, just
      scanned in descending time order.
    - tolerance_us: when set, a match farther than this many
      microseconds from the left timestamp is nulled out (both
      timestamp columns must be TIMESTAMP type). The window still does
      all the work; tolerance is a stateless post-filter, so the plan
      shape — and its 100 TB story — is unchanged.

    All non-key right columns come back prefixed (nullable).
    `right_seq` must be a unique long column on the right side; it
    tie-breaks equal timestamps deterministically."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    rcols = [c for c in right.columns if c not in (key, right_ts)]
    l_type = left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
    r_type = right.select(F.struct(*rcols).alias("s")).schema["s"].dataType

    l2 = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rseq"),
        F.struct(*lcols).alias("_lp"),
        F.lit(None).cast(r_type).alias("_rp"),
    )
    r2 = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_seq).cast("long").alias("_rseq"),
        F.lit(None).cast(l_type).alias("_lp"),
        F.struct(*rcols).alias("_rp"),
    )
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_rseq").asc()]
    else:
        # descending scan: the last right seen at-or-after the left row
        # is the SMALLEST qualifying ts; rseq desc makes the min seq
        # win ties — mirror-image determinism of the backward form
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_rseq").desc()]
    w = (
        W.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
        .withColumn(
            "_mts",
            F.last(
                F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True
            ).over(w),
        )
        .where(F.col("_side") == 1)
    )
    if tolerance_us is not None:
        in_tol = (
            F.abs(F.unix_micros("_ts") - F.unix_micros("_mts"))
            <= F.lit(tolerance_us)
        )
        u = u.withColumn(
            "_m",
            F.when(in_tol, F.col("_m")).otherwise(F.lit(None).cast(r_type)),
        )
    return u.select(
        F.col("_k").alias(key),
        F.col("_ts").alias(left_ts),
        *[F.col(f"_lp.{c}").alias(c) for c in lcols],
        *[F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in rcols],
    )


def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event joined to the user's most recent click at or
    before it (the trades-asof-quotes classic). lag_sec is computed on
    integer epoch-micros, so it's exact and engine-independent."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        "ts",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    j = asof_join(
        purchases, clicks,
        key="user_id", left_ts="ts", right_ts="ts", right_seq="click_id",
    )
    lag_us = F.unix_micros("ts") - F.unix_micros("r_click_ts")
    return j.select(
        "user_id",
        "event_id",
        F.col("r_click_id").alias("click_id"),
        F.col("r_click_value").alias("click_value"),
        (lag_us.cast("double") / F.lit(1000000.0)).alias("lag_sec"),
    )


ASOF_FWD_TOL_US = 3_600_000_000  # 1 hour


def events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each click joined to the user's
    NEXT purchase at-or-after it, but only within 1 hour — the
    conversion-attribution window. Clicks with no purchase inside the
    window keep nulls (LEFT semantics)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "ts",
        F.col("ts").alias("purchase_ts"),
    )
    j = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_seq="purchase_id",
        direction="forward",
        tolerance_us=ASOF_FWD_TOL_US,
    )
    lag_us = F.unix_micros("r_purchase_ts") - F.unix_micros("ts")
    return j.select(
        "user_id",
        "click_id",
        F.col("r_purchase_id").alias("purchase_id"),
        (lag_us.cast("double") / F.lit(1000000.0)).alias("lag_sec"),
    )


QUERIES = {
    "events_asof_purchase_click": events_asof_purchase_click,
    "events_asof_next_purchase": events_asof_next_purchase,
}

ORACLE = {
    # DuckDB has a native ASOF JOIN — the perfect independent oracle
    # for our union+window implementation.
    "events_asof_purchase_click": """
        WITH p AS (
          SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'purchase'
        ), c AS (
          SELECT user_id, event_id AS click_id, ts AS cts, value AS click_value
          FROM events WHERE event_type = 'click'
        )
        SELECT p.user_id, p.event_id, c.click_id, c.click_value,
               CAST(epoch_us(CAST(p.ts AS TIMESTAMP))
                    - epoch_us(CAST(c.cts AS TIMESTAMP)) AS DOUBLE)
                 / 1000000.0 AS lag_sec
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.cts
    """,
    # forward-with-tolerance: DuckDB's ASOF is backward-only, so the
    # oracle is the definitional LATERAL (first qualifying row in
    # (ts, id) order within the window) — a fully independent
    # implementation of the same semantics.
    "events_asof_next_purchase": """
        WITH c AS (
          SELECT user_id, event_id AS click_id, ts FROM events
          WHERE event_type = 'click'
        ), p AS (
          SELECT user_id, event_id AS purchase_id, ts AS pts FROM events
          WHERE event_type = 'purchase'
        )
        SELECT c.user_id, c.click_id, m.purchase_id,
               CAST(epoch_us(CAST(m.pts AS TIMESTAMP))
                    - epoch_us(CAST(c.ts AS TIMESTAMP)) AS DOUBLE)
                 / 1000000.0 AS lag_sec
        FROM c LEFT JOIN LATERAL (
          SELECT p.purchase_id, p.pts
          FROM p
          WHERE p.user_id = c.user_id
            AND p.pts >= c.ts
            AND epoch_us(CAST(p.pts AS TIMESTAMP))
                - epoch_us(CAST(c.ts AS TIMESTAMP)) <= 3600000000
          ORDER BY p.pts, p.purchase_id
          LIMIT 1
        ) m ON TRUE
    """,
}
