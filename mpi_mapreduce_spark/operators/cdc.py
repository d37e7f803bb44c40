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
from pyspark.sql.window import Window as W

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


def snapshot_diff(
    base: DataFrame, current: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Classify every key as added / removed / changed between two
    snapshots of the same schema — the reconciliation primitive behind
    CDC validation, replica anti-entropy, and incremental-build audits.

    One full-outer join on the keys; the row compare is null-safe
    equality over the non-key columns, evaluated in whole-stage
    codegen. 'same' keys are filtered out, so the result is O(churn),
    not O(table). At 100 TB both sides shuffle once on the key — or
    zero times if both snapshots are bucketed on it (sources/io.
    write_bucketed); wide rows can pre-hash to one comparison column
    (trade exactness of WHICH column changed for narrower shuffles)."""
    keys = list(keys)
    val_cols = [c for c in base.columns if c not in keys]
    # string-qualified refs (not df[col]) — base and current may share
    # lineage (e.g. a merge output diffed against its own input), and
    # attribute-id resolution is ambiguous on such self-joins
    b, c = base.alias("__b"), current.alias("__c")
    bcol = lambda n: F.col(f"__b.{n}")  # noqa: E731
    ccol = lambda n: F.col(f"__c.{n}")  # noqa: E731
    cond = [bcol(k).eqNullSafe(ccol(k)) for k in keys]
    # keys-only snapshots can still be diffed (added/removed only)
    changed = F.lit(False)
    for v in val_cols:
        changed = changed | ~bcol(v).eqNullSafe(ccol(v))
    cls = (
        F.when(bcol(keys[0]).isNull(), F.lit("added"))
        .when(ccol(keys[0]).isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    out_keys = [F.coalesce(bcol(k), ccol(k)).alias(k) for k in keys]
    return (
        b.join(c, cond, "full_outer")
        .select(*out_keys, cls.alias("change_type"))
        .where(F.col("change_type") != "same")
    )


def _orders_changes(orders: DataFrame) -> DataFrame:
    """The deterministic CDC batch both cdc queries share: every 10th
    key gets a status/price update, every 97th a tombstone, and a
    shifted key range inserts — derived arithmetic only, so the DuckDB
    oracle replays the identical merge."""
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
    return upd.unionByName(ins).unionByName(tomb)


def cdc_orders_rollforward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the deterministic CDC batch to the orders snapshot, then
    audit the merged state per status."""
    orders = load_table(spark, sf_dir, "orders")
    changes = _orders_changes(orders)
    merged = merge_upsert(orders, changes, ["o_orderkey"], "__deleted")
    return merged.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n_orders"),
        ex.quantized_sum("o_totalprice", 2).alias("total_price"),
    )


def cdc_orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile the pre- and post-CDC orders snapshots: every churned
    key comes back classified added/removed/changed — the audit that
    proves a merge applied exactly its batch and nothing else."""
    orders = load_table(spark, sf_dir, "orders")
    merged = merge_upsert(
        orders, _orders_changes(orders), ["o_orderkey"], "__deleted"
    )
    return snapshot_diff(orders, merged, ["o_orderkey"])


def scd2_from_changes(
    changes: DataFrame,
    key: str,
    ts: str,
    seq: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change feed:
    one validity interval per change — ``valid_from`` is the change's
    timestamp, ``valid_to`` the NEXT change's (null = still current).
    `seq` breaks equal-timestamp ties deterministically.

    One window per key (a single shuffle on the dimension key; the
    lead() is a streaming frame, no buffering) — the standard
    warehouse shape for as-of dimension lookups, which then join via
    operators/asof or a range join on [valid_from, valid_to)."""
    w = F.lead(ts).over(W.partitionBy(key).orderBy(ts, seq))
    return (
        changes.select(key, ts, seq, *attrs)
        .withColumn("valid_to_ts", w)
        .select(
            key,
            F.col(ts).alias("valid_from_ts"),
            "valid_to_ts",
            *attrs,
            F.col("valid_to_ts").isNull().alias("is_current"),
        )
    )


def cdc_user_value_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each (sampled) user's event stream: every event
    opens a version valid until the user's next event. 5% key sample
    keeps the driver-compared result small; the build itself is
    corpus-wide shaped (one window shuffle on user_id)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id") % 20 == 0
    )
    hist = scd2_from_changes(
        ev, key="user_id", ts="ts", seq="event_id",
        attrs=["event_type", "value"],
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return hist.select(
        "user_id",
        F.date_format("valid_from_ts", fmt).alias("valid_from"),
        F.date_format("valid_to_ts", fmt).alias("valid_to"),
        "event_type",
        "value",
        "is_current",
    )


QUERIES = {
    "cdc_orders_rollforward": cdc_orders_rollforward,
    "cdc_user_value_scd2": cdc_user_value_scd2,
    "cdc_orders_snapshot_diff": cdc_orders_snapshot_diff,
}

#: shared oracle CTE replaying merge_upsert(_orders_changes) exactly
_MERGED_CTE = """
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
"""

ORACLE = {
    "cdc_user_value_scd2": """
        SELECT user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
               strftime(LEAD(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id),
                        '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
               event_type, value,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) IS NULL AS is_current
        FROM events
        WHERE user_id % 20 = 0
    """,
    "cdc_orders_rollforward": f"""
        {_MERGED_CTE}
        SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
               {ex.sql_sum('o_totalprice', 2)} AS total_price
        FROM merged GROUP BY 1
    """,
    "cdc_orders_snapshot_diff": f"""
        {_MERGED_CTE}
        SELECT COALESCE(b.o_orderkey, m.o_orderkey) AS o_orderkey,
               CASE WHEN b.o_orderkey IS NULL THEN 'added'
                    WHEN m.o_orderkey IS NULL THEN 'removed'
                    ELSE 'changed' END AS change_type
        FROM orders b FULL OUTER JOIN merged m
          ON b.o_orderkey = m.o_orderkey
        WHERE b.o_orderkey IS NULL OR m.o_orderkey IS NULL
           OR b.o_custkey       IS DISTINCT FROM m.o_custkey
           OR b.o_orderstatus   IS DISTINCT FROM m.o_orderstatus
           OR b.o_totalprice    IS DISTINCT FROM m.o_totalprice
           OR b.o_orderdate     IS DISTINCT FROM m.o_orderdate
           OR b.o_orderpriority IS DISTINCT FROM m.o_orderpriority
    """,
}
