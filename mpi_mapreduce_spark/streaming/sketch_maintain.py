"""Streaming maintenance of the mergeable quantile-sketch table —
the continuous form of operators/sketches.daily_value_histograms.

Because the sketch is mergeable BY ADDITION, the stream never does a
read-modify-write: each micro-batch appends its own partial
histograms, and the read path sums partials per (day, bin). That is
the whole point of sketch tables at 100 TB — the hot path is
append-only (no contention, no transactional upkeep), and compaction
is an optional background rewrite, not a correctness requirement.

Exactly-once: the per-epoch append is covered by the same discussion
as streaming/sinks.py — re-delivered epochs double-append partials,
which the deterministic epoch-keyed file sink there resolves; here the
test drives a single clean pass and pins stream-vs-batch parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.operators.sketches import daily_value_histograms
from mpi_mapreduce_spark.streaming.windows import stream_events


def start_sketch_maintenance(
    spark: SparkSession, sf_dir: str, table_path: str, checkpoint: str
):
    """Append each micro-batch's partial (day, bin) histograms to the
    sketch table."""

    def upd(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        daily_value_histograms(batch_df).write.mode("append").parquet(
            table_path
        )

    return (
        stream_events(spark, sf_dir)
        .writeStream.foreachBatch(upd)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_sketch_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Canonical view of the appended partials: sum per (day, bin) —
    the merge is integer addition, so partial granularity is
    invisible to readers."""
    return (
        spark.read.parquet(table_path)
        .groupBy("day", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


QUERIES: dict = {}
ORACLE: dict = {}
