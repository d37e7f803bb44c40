"""Streaming quality gate: every micro-batch of arriving documents is
scored under a FROZEN logistic-regression quality model before it
lands — the model-deployment twin of training.quality_logreg_scores,
i.e. what a continuously-fed training-data pipeline runs in front of
its ingest sink (accept/quarantine by model score), exactly as
streaming/ingest_dedup.py runs exact dedup in front of its sink.

Train/serve split, the production shape:
- the model is fitted ONCE on the static historical corpus
  (driver-side bounded collects — the artifact is n_buckets + 1
  doubles, operators/training.logreg_model);
- each micro-batch is scored inside foreachBatch with
  operators/training.logreg_score — the SAME arithmetic as the batch
  scorer, so stream and batch decisions are identical row for row
  (pinned in tests/test_streaming.py).

Why foreachBatch: scoring needs the per-batch vocabulary hash join
(hashed_bucket_rows), a bounded-frame computation; inside foreachBatch
the micro-batch is a plain DataFrame and the batch operator runs
unchanged — one operator, two execution modes, zero code divergence.

Scale: the broadcast model is constant-size; per-batch cost is linear
in the batch (tokenize → bucket → one grouped sum). The sink is
idempotent per epoch for real: scores land partitioned by epoch_id
with dynamic partition overwrite (the streaming/sinks.py pattern), so
a re-delivered micro-batch after a crash rewrites its own epoch
partition instead of double-appending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.operators.training import logreg_model, logreg_score
from mpi_mapreduce_spark.streaming.ingest_dedup import stream_documents


def make_score_batch(weights, bias, out_path: str, batch_mod: int):
    """The foreachBatch body, exposed so tests can exercise epoch
    RE-DELIVERY directly (call it twice with the same epoch_id and
    assert no duplicate scores): each micro-batch's scores land in
    their own ``epoch_id=`` partition with dynamic partition
    overwrite, so a crash-replayed epoch rewrites its partition
    instead of appending a second copy — the streaming/sinks.py
    idempotence pattern."""

    def score_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.where(f"doc_id % {batch_mod} = 0")
        if not batch.take(1):
            return
        (
            logreg_score(batch, weights, bias)
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(out_path)
        )

    return score_batch


def start_quality_gate(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint: str,
    batch_mod: int = 10,
):
    """Start the stream: docs with doc_id % batch_mod == 0 play the
    'new ingest' role (the ingest_dedup convention); the model trains
    on everything else (the historical corpus); each micro-batch's
    scores append to parquet."""
    corpus = load_table(spark, sf_dir, "documents").where(
        f"doc_id % {batch_mod} != 0"
    )
    weights, bias = logreg_model(corpus)
    score_batch = make_score_batch(weights, bias, out_path, batch_mod)
    return (
        stream_documents(spark, sf_dir)
        .writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


QUERIES: dict = {}
ORACLE: dict = {}
