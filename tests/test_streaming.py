"""Structured Streaming: the same transformations that pass the batch
oracle must produce identical results when executed incrementally
(micro-batches + watermark + memory sink), and streaming dedup must
match its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.streaming import windows as SW


def _run_stream(df, name: str):
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    batch = SW.tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = SW.tumbling_counts(SW.stream_events(spark, sf_dir))
    _run_stream(stream, "tumbling_out")
    got = spark.sql("SELECT * FROM tumbling_out")
    assert _sorted_rows(got) == _sorted_rows(batch)


def test_streaming_watermark_append_mode(spark, sf_dir):
    """Watermarked append-mode query: windows are emitted once closed;
    over a finite input every window except the tail closes."""
    agg = SW.streaming_tumbling_counts(spark, sf_dir)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = spark.sql("SELECT * FROM wm_out")
    batch = SW.tumbling_counts(load_table(spark, sf_dir, "events"))
    # append-mode output must be a subset of the batch truth, missing
    # only windows still open at the watermark when input ended
    b = {tuple(r): True for r in batch.collect()}
    rows = emitted.collect()
    assert rows, "append mode emitted nothing — watermark never advanced?"
    for r in rows:
        assert tuple(r) in b


def test_streaming_dedup_matches_batch_twin(spark, sf_dir):
    ev = SW.stream_events(spark, sf_dir)
    stream = (
        ev.select("user_id", "event_type", "event_id")
        .dropDuplicates(["user_id", "event_type"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT user_id, event_type FROM dedup_out")
    batch = SW.first_event_per_user_type(load_table(spark, sf_dir, "events"))
    # streaming dropDuplicates keeps the first *arrival* (file order);
    # the batch twin keeps min event_id — the (user, type) key sets
    # must agree even if the chosen representative differs
    assert _sorted_rows(got) == _sorted_rows(batch.select("user_id", "event_type"))


def test_session_window_semantics_tiny(spark):
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:04:00"),   # < 5 min gap → same session
        (1, "2024-01-01 00:08:30"),   # 4.5 min gap → still chained
        (1, "2024-01-01 00:20:00"),   # > 5 min gap → new session
        (2, "2024-01-01 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), F.lit(1.0).alias("value")
    )
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in SW.session_stats(ev).collect()
    }
    assert got == {
        (1, "2024-01-01 00:00:00"): 3,
        (1, "2024-01-01 00:20:00"): 1,
        (2, "2024-01-01 00:00:00"): 1,
    }


def test_streaming_dedup_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark: state for a key is dropped once
    the watermark passes it — bounded state, same key set as batch
    distinct over this finite input."""
    ev = SW.stream_events(spark, sf_dir).withWatermark("ts", "30 minutes")
    stream = ev.select("user_id", "event_type", "ts").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT DISTINCT user_id, event_type FROM wm_dedup_out")
    batch = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    assert _sorted_rows(got) == _sorted_rows(batch)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream inner join with two-sided watermarks + interval
    condition (append mode) must emit exactly the batch twin's pairs."""
    from mpi_mapreduce_spark.streaming import joins as SJ

    stream = SJ.streaming_click_purchase_pairs(spark, sf_dir)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM ss_join_out")
    batch = SJ.events_click_purchase_join(spark, sf_dir)
    assert _sorted_rows(got) == _sorted_rows(batch)
    assert got.count() > 0


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    """Stream-static broadcast join (stateless, append-capable with no
    watermark) must emit exactly the batch enrichment rows."""
    from mpi_mapreduce_spark.datamodel import load_table
    from mpi_mapreduce_spark.streaming import enrich as SE

    stream = SE.streaming_enriched_events(spark, sf_dir)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM enrich_out")
    batch = SE.enrich_events(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )
    assert _sorted_rows(got) == _sorted_rows(batch)
    assert got.count() > 0


def test_stream_stream_left_outer_join_subset_of_batch(spark, sf_dir):
    """Left-outer stream-stream join: matched rows must equal the
    batch twin's matched set; NULL-purchase (abandoned) rows may only
    be a subset — clicks whose window was still open when input ended
    are withheld by the watermark."""
    from mpi_mapreduce_spark.streaming import joins as SJ

    stream = SJ.streaming_click_purchase_attribution(spark, sf_dir)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_louter_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM ss_louter_out").collect()
    batch = SJ.events_click_attribution(spark, sf_dir).collect()
    b_matched = {tuple(r) for r in batch if r.purchase_id is not None}
    b_abandoned = {tuple(r) for r in batch if r.purchase_id is None}
    g_matched = {tuple(r) for r in got if r.purchase_id is not None}
    g_abandoned = {tuple(r) for r in got if r.purchase_id is None}
    assert g_matched == b_matched
    assert g_abandoned <= b_abandoned
    assert g_abandoned, "no outer rows emitted — watermark never expired any click"


def test_trending_types_stream_snapshot_matches_batch(spark, sf_dir, tmp_path):
    """Materialized-view pattern: the windowed count streams
    incrementally; rank re-derives per micro-batch in foreachBatch
    over the (tiny) aggregated snapshot. Final snapshot must equal the
    batch trending query exactly."""
    from pyspark.sql import functions as F

    from mpi_mapreduce_spark.datamodel import load_table
    from mpi_mapreduce_spark.streaming.windows import (
        stream_events,
        trending_types,
    )

    out = str(tmp_path / "trending")

    counts = (
        stream_events(spark, sf_dir)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )

    def rerank(batch_df, epoch_id):
        from pyspark.sql.window import Window as W

        rw = W.partitionBy("w").orderBy(F.desc("n"), F.asc("event_type"))
        (
            batch_df.withColumn("rank", F.row_number().over(rw))
            .where(F.col("rank") <= 2)
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n",
                "rank",
            )
            .write.mode("overwrite")
            .parquet(out)
        )

    q = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(rerank)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    snapshot = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    batch = sorted(
        tuple(r)
        for r in trending_types(load_table(spark, sf_dir, "events")).collect()
    )
    assert snapshot == batch


def test_streaming_quality_gate_matches_batch(spark, sf_dir, tmp_path):
    """The streaming quality gate's scores must equal scoring the same
    docs with the same frozen model batch-side — row for row."""
    from mpi_mapreduce_spark.datamodel import load_table
    from mpi_mapreduce_spark.operators.training import (
        logreg_model,
        logreg_score,
    )
    from mpi_mapreduce_spark.streaming.quality_gate import start_quality_gate

    out = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt_qg")
    q = start_quality_gate(spark, sf_dir, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        r.doc_id: (r.logit, r.prob, r.keep)
        for r in spark.read.parquet(out).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where("doc_id % 10 != 0")
    batch_docs = docs.where("doc_id % 10 = 0")
    w, b = logreg_model(corpus)
    batch = {
        r.doc_id: (r.logit, r.prob, r.keep)
        for r in logreg_score(batch_docs, w, b).collect()
    }
    assert streamed == batch
    assert streamed  # non-empty


def test_quality_gate_epoch_redelivery_is_idempotent(spark, sf_dir, tmp_path):
    """A crash-replayed micro-batch (same epoch_id delivered twice)
    must not double-append scores: the sink overwrites its own
    epoch_id partition (dynamic partition overwrite), so re-delivery
    rewrites identical rows in place while other epochs' partitions
    are untouched."""
    from mpi_mapreduce_spark.datamodel import load_table
    from mpi_mapreduce_spark.operators.training import logreg_model
    from mpi_mapreduce_spark.streaming.quality_gate import make_score_batch

    docs = load_table(spark, sf_dir, "documents")
    w, b = logreg_model(docs.where("doc_id % 10 != 0"))
    out = str(tmp_path / "scores_replay")
    fn = make_score_batch(w, b, out, batch_mod=10)

    batch = docs.where("doc_id % 10 = 0")
    n = batch.count()
    fn(docs, 0)
    fn(docs, 0)  # crash replay of the SAME epoch
    assert spark.read.parquet(out).count() == n

    fn(docs, 1)  # a different epoch lands alongside, not instead
    got = spark.read.parquet(out)
    assert got.count() == 2 * n
    assert got.select("epoch_id").distinct().count() == 2
