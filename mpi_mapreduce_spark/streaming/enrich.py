"""Stream-static enrichment join — the third join mode Structured
Streaming supports (after batch and stream-stream): an unbounded
stream joined to a bounded dimension.

The reference has a single dataset in flight and no joins at all
(SURVEY.md §2.3); enrichment is the [NS] pattern every event pipeline
needs — attach dimension attributes (here: customer segment) to each
event as it arrives.

Scale: the static side is a classic broadcast dimension — each
micro-batch hash-joins against the broadcast copy with NO shuffle of
the stream and no state store at all (unlike stream-stream joins,
stream-static inner joins are stateless: a static row can't be late).
If the dimension outgrows broadcast, pre-bucket it on the join key
and let the stream shuffle once per micro-batch — still stateless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.functions import exact as ex
from mpi_mapreduce_spark.streaming.windows import stream_events


def enrich_events(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Attach the customer's market segment to each event (inner join —
    events without a customer row are dropped, same as the oracle).
    Works identically on a batch or streaming `events` input."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    return events.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "event_type", "value", "c_mktsegment"
    )


def streaming_enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming form: readStream events ⋈ static customer dim."""
    return enrich_events(
        stream_events(spark, sf_dir), load_table(spark, sf_dir, "customer")
    )


# ---------------------------------------------------------------------------
# Registry (batch mode, oracle-checked)
# ---------------------------------------------------------------------------

def events_enriched_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrichment join rolled up to (segment, event_type) — the shape a
    dashboard reads. Broadcast join, then one 15-group shuffle."""
    enriched = enrich_events(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )
    return enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").alias("n_events"),
        ex.quantized_sum("value", 2).alias("sum_value"),
    )


QUERIES = {
    "events_enriched_by_segment": events_enriched_by_segment,
}

ORACLE = {
    "events_enriched_by_segment": f"""
        SELECT c_mktsegment, event_type,
               COUNT(*) AS n_events,
               {ex.sql_sum('value', 2)} AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment, event_type
    """,
}
