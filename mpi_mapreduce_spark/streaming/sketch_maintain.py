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


def start_cms_maintenance(
    spark: SparkSession, sf_dir: str, table_path: str, checkpoint: str
):
    """Streaming maintenance of the count-min TABLE (round-8 CMS
    family): each micro-batch of documents appends its own partial
    d×w cell counts; the read path sums per (j, c). Same append-only
    contract as the histogram leg above — CMS cells merge by integer
    addition, so partial granularity is invisible to readers and the
    hot path never does read-modify-write."""
    from mpi_mapreduce_spark.functions.text import tokens
    from mpi_mapreduce_spark.operators.sketches import cms_build

    def upd(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        cms_build(
            batch_df.select(F.explode(tokens(F.col("text"))).alias("term"))
        ).write.mode("append").parquet(table_path)

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        # glob, not bare file path: a streaming source's basePath must
        # be a directory (same trick as windows.stream_events)
        .load(f"{sf_dir}/documents.parque[t]")
        .writeStream.foreachBatch(upd)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_cms_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Canonical view of the appended CMS partials: sum per (j, c)."""
    return (
        spark.read.parquet(table_path)
        .groupBy("j", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )


def start_bloom_maintenance(
    spark: SparkSession, sf_dir: str, table_path: str, checkpoint: str
):
    """Streaming maintenance of the Bloom membership filter — the
    third mergeable-sketch streaming leg (histogram: sum, CMS: sum,
    Bloom: bit_or). Each micro-batch appends its own partial
    ``(word, bits)`` filter; the read path OR-merges per word.
    bit_or is additionally IDEMPOTENT, so this leg tolerates
    re-delivered epochs with no resolution step at all — a replayed
    append changes nothing in the merged view."""
    from mpi_mapreduce_spark.operators.dedup import bloom_build

    def upd(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        bloom_build(batch_df).write.mode("append").parquet(table_path)

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(f"{sf_dir}/documents.parque[t]")
        .writeStream.foreachBatch(upd)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_bloom_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Canonical view of the appended filter partials: bit_or per
    word — directly servable to operators.dedup.bloom_screen."""
    return (
        spark.read.parquet(table_path)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )


def start_gram_maintenance(
    spark: SparkSession, sf_dir: str, table_path: str, checkpoint: str
):
    """Streaming maintenance of the substring gram VOCABULARY — the
    fourth mergeable streaming leg (histogram: sum, CMS: sum, Bloom:
    bit_or, grams: set UNION). Each micro-batch appends its own
    distinct full-gram rows; because the serving probe
    (operators.dedup.incremental_span_rows with ``corpus_grams=``) is
    a duplicate-tolerant SEMI join, the RAW appended partials are
    directly servable with no merge step at all — strictly laxer than
    even Bloom's idempotence story (re-delivered epochs, cross-batch
    repeats, and unmerged partials are all invisible to the serving
    result, pytest-pinned)."""
    from mpi_mapreduce_spark.operators.dedup import (
        substring_gram_index_rows,
    )

    def upd(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        substring_gram_index_rows(batch_df).write.mode("append").parquet(
            table_path
        )

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(f"{sf_dir}/documents.parque[t]")
        .writeStream.foreachBatch(upd)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_gram_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Canonical view of the appended gram partials: distinct — only
    needed when exporting the vocabulary itself; the span-serving
    path probes the raw partials directly (semi join)."""
    return spark.read.parquet(table_path).select("s").distinct()


QUERIES: dict = {}
ORACLE: dict = {}
