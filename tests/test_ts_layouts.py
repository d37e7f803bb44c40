"""Regression guard for the driver schema contract on event time.

Round-1 post-mortem: the driver's events parquet carries ``ts`` as
µs-precision TIMESTAMP_NTZ, while the engine's loader only handled the
TIMESTAMP(NANOS)-as-long layout — every event-time query analysis-
failed, and the streaming source (which hardcoded the nanos layout)
silently produced 1970-era timestamps. This test writes the SAME rows
in both physical layouts and asserts batch load, an event-time
aggregate, and the streaming source all agree, so neither path can
regress on either layout again.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
ROWS = [
    (i, BASE + dt.timedelta(minutes=7 * i, microseconds=i), i % 3,
     ["view", "click", "purchase"][i % 3], float(i), "{}")
    for i in range(40)
]


def _write_events(dir_path: str, unit: str) -> str:
    """Write the fixture rows with ts as parquet timestamp[unit]
    (us → TIMESTAMP_NTZ in Spark 4; ns → nanos-as-long under the
    legacy conf)."""
    os.makedirs(dir_path, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(
        table, os.path.join(dir_path, "events.parquet"), version="2.6"
    )
    return dir_path


@pytest.fixture(scope="module")
def layout_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ts_layouts")
    return {
        "us_ntz": _write_events(str(root / "us"), "us"),
        "nanos_long": _write_events(str(root / "ns"), "ns"),
    }


def test_load_table_normalizes_both_layouts(spark, layout_dirs):
    from pyspark.sql import types as T

    from mpi_mapreduce_spark.datamodel import load_table

    collected = {}
    for name, d in layout_dirs.items():
        df = load_table(spark, d, "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
            f"{name}: ts must normalize to TIMESTAMP, got "
            f"{df.schema['ts'].dataType}"
        )
        collected[name] = sorted(
            (r.event_id, r.ts) for r in df.select("event_id", "ts").collect()
        )
    assert collected["us_ntz"] == collected["nanos_long"]
    # values are the actual 2024 instants, not 1970 artifacts
    assert collected["us_ntz"][0][1].year == 2024


def test_event_time_query_runs_on_both_layouts(spark, layout_dirs):
    """unix_micros over the normalized column — the exact expression
    that analysis-failed on TIMESTAMP_NTZ in round 1."""
    from pyspark.sql import functions as F

    from mpi_mapreduce_spark.datamodel import load_table

    results = {}
    for name, d in layout_dirs.items():
        df = load_table(spark, d, "events")
        results[name] = sorted(
            (r.user_id, r.lo, r.hi)
            for r in df.groupBy("user_id")
            .agg(
                F.min(F.unix_micros("ts")).alias("lo"),
                F.max(F.unix_micros("ts")).alias("hi"),
            )
            .collect()
        )
    assert results["us_ntz"] == results["nanos_long"]


def test_stream_source_matches_batch_on_both_layouts(spark, layout_dirs):
    """stream_events must yield the same event times as load_table for
    each layout (round 1: the stream path silently landed in 1970 on
    µs files)."""
    from mpi_mapreduce_spark.datamodel import load_table
    from mpi_mapreduce_spark.streaming.windows import stream_events, tumbling_counts

    for name, d in layout_dirs.items():
        batch = sorted(
            tuple(r) for r in tumbling_counts(load_table(spark, d, "events")).collect()
        )
        q = (
            tumbling_counts(stream_events(spark, d))
            .writeStream.format("memory")
            .queryName(f"ts_layout_{name}")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        streamed = sorted(
            tuple(r)
            for r in spark.sql(f"SELECT * FROM ts_layout_{name}").collect()
        )
        assert streamed == batch, f"{name}: stream/batch event time diverged"
