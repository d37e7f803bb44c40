"""Property tests for functions.exact: quantized aggregates must be
bit-identical under any partitioning/addition order, and must equal a
serial Python computation of the same quantized math."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mpi_mapreduce_spark.functions import exact as ex


def _serial_quantized_sum(values, scale):
    m = 10**scale
    total = 0
    for v in values:
        x = v * m
        # round half away from zero, like Spark/DuckDB ROUND
        q = int(x + 0.5) if x >= 0 else -int(-x + 0.5)
        total += q
    return total / m


def test_quantized_sum_partitioning_invariant(spark):
    rng = random.Random(7)
    vals = [round(rng.uniform(-1000, 1000), 2) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    results = set()
    for parts in (1, 7, 32):
        got = (
            df.repartition(parts)
            .agg(ex.quantized_sum("v", 2).alias("s"))
            .collect()[0]["s"]
        )
        results.add(got)
    assert len(results) == 1, f"partitioning changed the sum: {results}"
    assert results.pop() == _serial_quantized_sum(vals, 2)
    # contrast: the naive double sum is NOT partitioning-invariant in
    # general — that's the whole reason exact.py exists (can't assert
    # inequality, it's luck-dependent; asserted above is the fix)


def test_quantized_sum_wide_matches_long(spark):
    vals = [1.25, -2.5, 3.0049, 1e9, -1e9]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    a = df.agg(ex.quantized_sum("v", 4).alias("s")).collect()[0]["s"]
    b = df.agg(ex.quantized_sum("v", 4, wide=True).alias("s")).collect()[0]["s"]
    assert a == b


def test_quantize_matches_duckdb_round(spark):
    """Per-row quantize must equal DuckDB's ROUND(x*m)/m on the same
    doubles — ties away from zero."""
    import duckdb

    vals = [2.675, -2.675, 0.005, -0.005, 1.0 / 3.0, 58.62125]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r.q for r in df.select(ex.quantize("v", 4).alias("q")).collect()]
    want = [
        duckdb.connect()
        .execute(
            # cast: duckdb parses bare literals as DECIMAL, but the
            # real oracle queries run on parquet DOUBLE columns
            f"SELECT ROUND(CAST({v!r} AS DOUBLE) * 10000.0) / 10000.0"
        )
        .fetchone()[0]
        for v in vals
    ]
    assert got == want
