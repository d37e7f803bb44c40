"""Streaming sinks: file-sink exactly-once contents and foreachBatch
idempotence under epoch re-delivery."""

from __future__ import annotations

from mpi_mapreduce_spark.streaming import sinks as S
from mpi_mapreduce_spark.streaming.windows import events_tumbling_counts


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _run_to_completion(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_file_sink_emits_closed_windows(spark, sf_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = S.streaming_tumbling_to_parquet(spark, sf_dir, out, ckpt)
    _run_to_completion(q)
    got = _sorted_rows(spark.read.parquet(out))
    batch = _sorted_rows(events_tumbling_counts(spark, sf_dir))
    assert got, "file sink wrote nothing — watermark never advanced?"
    # append mode emits only watermark-closed windows: subset of the
    # batch truth, and exact for every window it does emit
    assert set(got) <= set(batch)
    assert len(got) >= len(batch) - 32  # at most the tail windows open


def test_foreach_batch_sink_is_idempotent(spark, sf_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = S.streaming_tumbling_to_parquet(
        spark, sf_dir, out, ckpt, use_foreach_batch=True
    )
    _run_to_completion(q)
    first = _sorted_rows(spark.read.parquet(out))
    assert first

    # simulate epoch re-delivery: run the SAME query from a FRESH
    # checkpoint against the already-populated sink — every partition
    # is rewritten with identical rows, so contents must not change
    q2 = S.streaming_tumbling_to_parquet(
        spark, sf_dir, out, str(tmp_path / "ckpt2"), use_foreach_batch=True
    )
    _run_to_completion(q2)
    again = _sorted_rows(spark.read.parquet(out))
    assert again == first


def test_file_sink_exactly_once_across_restart(spark, sf_dir, tmp_path):
    """Checkpoint-restart: run the windowed aggregation over an early
    tranche of files, stop the query, add a later tranche, restart
    from the SAME checkpoint. The sink must contain each closed window
    exactly once (no reprocessing of tranche 1) and match the batch
    truth for every window it emits."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from mpi_mapreduce_spark.datamodel import load_table
    from mpi_mapreduce_spark.streaming.windows import (
        EVENTS_RAW_SCHEMA,
        WATERMARK,
        tumbling_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    lo, mid, hi = ev.selectExpr(
        "min(ts)", "percentile(unix_micros(ts), 0.5)", "max(ts)"
    ).collect()[0]
    raw = ev.select(
        "event_id",
        (F.unix_micros("ts") * 1000).alias("ts"),  # raw nanos layout
        "user_id",
        "event_type",
        "value",
        "props",
    )
    stage = tmp_path / "stage"
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    early = raw.where(F.col("ts") / 1000 <= mid)
    late = raw.where(F.col("ts") / 1000 > mid)
    early.coalesce(1).write.parquet(str(stage / "t0"))
    late.coalesce(1).write.parquet(str(stage / "t1"))

    def move_tranche(name: str, mtime: int) -> None:
        src = next((stage / name).glob("*.parquet"))
        dst = stream_dir / f"{name}.parquet"
        os.rename(src, dst)
        os.utime(dst, (mtime, mtime))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_query():
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s = (
            spark.readStream.schema(EVENTS_RAW_SCHEMA)
            .format("parquet")
            .load(str(stream_dir) + "/*.parquet")
        )
        s = s.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        ).withWatermark("ts", WATERMARK)
        return (
            tumbling_counts(s)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    now = int(_time.time())
    move_tranche("t0", now - 100)
    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    after_run1 = spark.read.parquet(out).count()
    assert after_run1 > 0, "run 1 emitted nothing"

    move_tranche("t1", now - 50)
    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    # exactly once: no (window_start, event_type) appears twice
    dups = got.groupBy("window_start", "event_type").count().where("count > 1")
    assert dups.count() == 0
    batch = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in tumbling_counts(ev).collect()
    }
    rows = got.collect()
    assert len(rows) > after_run1, "restart processed no new windows"
    for r in rows:
        assert batch[(r.window_start, r.event_type)] == (r.n, r.sum_value)
