"""Salted aggregation must be exactly equivalent to the direct
groupBy, including on pathologically skewed input."""

from __future__ import annotations

from pyspark.sql import functions as F

from mpi_mapreduce_spark.operators import skew as SK


def test_salted_agg_equals_direct_on_skewed_data(spark):
    # 10k rows of one hot key + a long tail
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).alias("v")
    )
    tail = spark.range(500).select(
        F.concat(F.lit("t"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    df = hot.unionByName(tail)
    got = SK.salted_agg(
        df,
        key="k",
        aggs={
            "n": (F.count("*"), F.sum),
            "s": (F.sum("v"), F.sum),
            "mx": (F.max("v"), F.max),
        },
    )
    direct = df.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))


def test_salted_agg_spreads_hot_key(spark):
    hot = spark.range(5_000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    salt = (
        F.spark_partition_id() * 31 + F.monotonically_increasing_id()
    ) % SK.DEFAULT_SALT
    n_subkeys = (
        hot.withColumn("_salt", salt).select("k", "_salt").distinct().count()
    )
    assert n_subkeys > 1, "salt must split the hot key across reducers"
