"""Streaming ingest dedup must produce exactly the batch operator's
decisions: same docs, same exact/near flags, same keep set."""

from __future__ import annotations


def test_streaming_ingest_dedup_matches_batch(spark, sf_dir, tmp_path):
    from mpi_mapreduce_spark.operators.dedup import dedup_incremental
    from mpi_mapreduce_spark.streaming.ingest_dedup import start_ingest_dedup

    out = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")
    q = start_ingest_dedup(spark, sf_dir, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        r.doc_id: (r.is_exact_dup, r.is_near_dup, r.keep)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r.doc_id: (r.is_exact_dup, r.is_near_dup, r.keep)
        for r in dedup_incremental(spark, sf_dir).collect()
    }
    assert streamed == batch
