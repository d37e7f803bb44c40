"""Streaming sinks: exactly-once-per-batch parquet via foreachBatch,
plus the built-in file sink.

The reference's only sink is the master's text file written once at
job end (reference main.cpp:157-174); a streaming engine needs sinks
that stay correct under restart. Two forms:

- **file sink** (`writeStream.format("parquet")`): Spark's built-in
  exactly-once file sink — offsets + file manifest both in the
  checkpoint, no user code. The right default for append-only
  event-time results.
- **foreachBatch idempotent overwrite**: for sinks the file sink
  can't express (upserts, dynamic partition overwrite, JDBC). The
  batch function gets (batch_df, epoch_id); on restart the SAME epoch
  may be re-delivered, so the write must be idempotent — here:
  dynamic partition-overwrite keyed by the batch's own data, making
  re-delivery overwrite identical partitions with identical bytes.

Scale: both sinks inherit the query's partitioning — one file per
shuffle partition per epoch; compaction is a downstream batch job
(sources/io.write_table), not the streaming path's problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.streaming.windows import streaming_tumbling_counts


def write_stream_parquet(result: DataFrame, path: str, checkpoint: str):
    """Built-in exactly-once parquet file sink (append mode — requires
    a watermarked aggregation upstream so finalized windows emit)."""
    return (
        result.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def write_stream_foreach_batch(result: DataFrame, path: str, checkpoint: str):
    """foreachBatch sink with idempotent dynamic partition overwrite:
    every micro-batch overwrites exactly the `window_start` partitions
    it carries, so epoch re-delivery after a crash rewrites the same
    partitions with the same rows instead of duplicating them."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            batch_df.withColumn(
                "window_date", F.to_date(F.col("window_start"))
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_date")
            .parquet(path)
        )

    return (
        result.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def streaming_tumbling_to_parquet(
    spark: SparkSession, sf_dir: str, path: str, checkpoint: str, *,
    use_foreach_batch: bool = False
):
    """End-to-end: events stream → watermarked tumbling counts →
    parquet. The batch twin is events_tumbling_counts (oracle-checked
    in the registry); tests assert sink contents equal the twin's
    finalized windows."""
    agg = streaming_tumbling_counts(spark, sf_dir)
    sink = write_stream_foreach_batch if use_foreach_batch else write_stream_parquet
    return sink(agg, path, checkpoint)
