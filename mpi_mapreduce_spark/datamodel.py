"""Data model: the engine's tables and loaders.

The reference's entire data model is one ``(char key[8], int val)``
pair (reference tasks.h:12-15); the engine's data model is the Spark
DataFrame, which strictly generalizes it. The canonical key-value
result schema used by every MapReduce-parity query is
``(key string, val long)`` — unbounded keys and 64-bit values on
purpose: the 7-char key cap and int32 values in the reference are
fixed-size-MPI-message artifacts, not semantics (SURVEY.md §1.2).

Tables (driver-generated parquet, FIXTURES.md §B):
    region nation customer supplier part orders lineitem events
    documents embeddings
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# The canonical result schema for MapReduce-parity queries.
KV_SCHEMA = "key string, val long"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one engine table. Parquet scan → columnar, vectorized,
    predicate-pushdown-capable; Catalyst prunes columns per query.

    ``events.ts`` may be written as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). With
    ``nanosAsLong`` set, such a column surfaces as a long of
    epoch-nanos; we rebuild the timestamp with integer µs division —
    exact (no double round-trip: 2024 epoch-nanos ≈ 1.7e18 > 2^53) and
    lossless for this data's µs-precision values. When the file carries
    an ordinary µs-precision timestamp the column arrives as a
    timestamp already and is passed through untouched.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL API path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
