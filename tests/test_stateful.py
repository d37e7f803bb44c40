"""applyInPandasWithState: the streamed per-user totals must equal the
batch twin exactly (same quantization discipline), and the as-of join
gets a semantics spot-check on a tiny hand-built frame."""

from __future__ import annotations

import pandas as pd

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.operators.asof import asof_join
from mpi_mapreduce_spark.streaming import stateful as ST
from mpi_mapreduce_spark.streaming.windows import stream_events


def test_stateful_totals_match_batch(spark, sf_dir):
    stream = ST.user_totals_stream(stream_events(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # single parquet file -> single micro-batch -> one update per user
    got = sorted(map(tuple, spark.sql("SELECT * FROM totals_out").collect()))
    want = sorted(
        map(tuple, ST.user_totals_batch(load_table(spark, sf_dir, "events")).collect())
    )
    assert got == want


def test_asof_join_tiny_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 205, "p2"), (2, 50, "p3")],
        "k long, t long, lbl string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 20), (1, 300, 30), (2, 60, 40)],
        "k long, t long, seq long",
    )
    out = asof_join(left, right, key="k", left_ts="t", right_ts="t", right_seq="seq")
    got = {(r.k, r.lbl): r.r_seq for r in out.collect()}
    assert got == {
        (1, "p1"): 10,   # equal ts matches (inclusive <=)
        (1, "p2"): 20,   # latest at-or-before 205
        (2, "p3"): None,  # no right row at-or-before 50 -> LEFT semantics
    }


def test_stateful_v2_totals_match_batch(spark, sf_dir):
    """transformWithStateInPandas (stateful v2, RocksDB-backed) must
    produce the same totals as v1 and the batch twin. Skipped where
    google.protobuf (the v2 state protocol) isn't installed."""
    import pytest

    if not ST.stateful_v2_available():
        pytest.skip("google.protobuf not available — stateful v2 gated")
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = ST.user_totals_stream_v2(stream_events(spark, sf_dir))
        q = (
            stream.writeStream.outputMode("update")
            .format("memory")
            .queryName("totals_v2_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(map(tuple, spark.sql("SELECT * FROM totals_v2_out").collect()))
        want = sorted(
            map(
                tuple,
                ST.user_totals_batch(load_table(spark, sf_dir, "events")).collect(),
            )
        )
        assert got == want
    finally:
        if prior is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
