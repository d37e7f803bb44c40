"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32
threads, one JVM); the same configs are what we would set on a real
cluster — AQE for runtime re-planning/skew handling, shuffle
partitions sized to the parallelism at hand, Arrow for the (rare)
Python-UDF paths, UTC session time so results compare cleanly against
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB scale these numbers are set per-cluster (shuffle partitions
# ~2-3x total executor cores, maxPartitionBytes 128-256m); locally we
# match the thread count so tiny test data isn't over-parallelized.
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "mpi_mapreduce_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ANSI off: engine semantics are permissive (overflow wraps,
        # bad casts null) to match classic Spark behavior; every query
        # here is written to stay in-range anyway.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Surface parquet TIMESTAMP(NANOS) columns as epoch-nanos longs
        # instead of PARQUET_TYPE_ILLEGAL; datamodel.normalize_event_ts
        # rebuilds them. Pinned here (not as a load_table side effect)
        # so the setting is explicit session state. No-op for µs files.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
