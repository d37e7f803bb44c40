"""Streaming ingest dedup: every micro-batch of arriving documents is
flagged against the STATIC historical corpus before it lands — the
streaming form of operators/dedup.dedup_against_corpus, i.e. what a
continuously-fed training-data pipeline runs instead of a nightly
batch job.

Why foreachBatch and not a pure streaming plan: the exact near-dup op
shingles with a per-doc ordered window (operators/dedup.shingle_rows),
and window functions aren't expressible on an unbounded stream. Inside
foreachBatch each micro-batch is a plain bounded DataFrame, so the
SAME exact operator runs per batch against the static corpus side —
stream-static join semantics with zero code divergence from the batch
path (the whole point: one operator, two execution modes).

Scale: the corpus side is loaded once per batch from its store (at
100 TB: the persisted shingle/signature index — see
dedup.dedup_incremental_minhash — not raw text); per-batch cost is
linear in the batch. The parquet append inside foreachBatch is
idempotent-per-epoch only if re-delivered epochs rewrite the same
rows; for the exactly-once contract under restart use the
decisions' doc_id as the overwrite key (sinks.py discussion applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.operators.dedup import dedup_against_corpus


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet (one file = one
    micro-batch in tests), schema probed from the batch read like
    windows.stream_events."""
    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(f"{sf_dir}/documents.parque[t]")
    )


def start_ingest_dedup(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint: str,
    batch_mod: int = 10,
):
    """Start the stream: arriving docs with doc_id % batch_mod == 0
    play the 'new ingest' role (mirroring dedup_incremental's split),
    each micro-batch is flagged against the static corpus, and the
    keep/drop decisions append to parquet."""
    corpus = load_table(spark, sf_dir, "documents").where(
        f"doc_id % {batch_mod} != 0"
    )

    def flag_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.where(f"doc_id % {batch_mod} = 0")
        if not batch.take(1):
            return
        dedup_against_corpus(batch, corpus).write.mode("append").parquet(
            out_path
        )

    return (
        stream_documents(spark, sf_dir)
        .writeStream.foreachBatch(flag_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


QUERIES: dict = {}
ORACLE: dict = {}
