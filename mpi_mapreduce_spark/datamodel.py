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


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to plain TIMESTAMP, whatever raw
    layout the parquet carried. One helper shared by the batch loader
    and the streaming source so the two paths can't diverge.

    Layouts seen in the wild (and in the driver fixtures):

    * ``long`` — parquet TIMESTAMP(NANOS) surfaced as epoch-nanos via
      ``nanosAsLong`` (Spark's vectorized reader otherwise rejects
      nanos). Rebuilt with integer µs division — exact (no double
      round-trip: 2024 epoch-nanos ≈ 1.7e18 > 2^53) and lossless for
      µs-precision values.
    * ``TIMESTAMP_NTZ`` — parquet timestamp[us] with
      isAdjustedToUTC=false (Spark 4 ``inferTimestampNTZ``). Cast to
      TIMESTAMP; with the session TZ pinned UTC (session.py) the cast
      is value-identity, and downstream ``unix_micros``/watermarks —
      which require TIMESTAMP — analyze cleanly.
    * ``TIMESTAMP`` — already what we want; untouched.

    Normalizing both branches to ONE type keeps the schema stable for
    every downstream query regardless of which file layout was read.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    t = df.schema[col].dataType
    if isinstance(t, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(t, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one engine table. Parquet scan → columnar, vectorized,
    predicate-pushdown-capable; Catalyst prunes columns per query.

    ``events.ts`` is normalized to TIMESTAMP via
    :func:`normalize_event_ts` (dual-layout handling documented there).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # nanosAsLong must be on BEFORE the read so a TIMESTAMP(NANOS)
        # file surfaces as long instead of PARQUET_TYPE_ILLEGAL. It is
        # also pinned at session build (session.py); re-set here so
        # sessions not built by get_spark (e.g. the driver's) work too.
        # No-op for µs-timestamp files.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL API path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
