"""Custom stateful streaming operator — applyInPandasWithState.

The reference's only "state" is the reducer's key->values buffer
(reference main.cpp:251, 270-277), which exists for exactly one batch
job. This module is the streaming generalization: per-key state that
lives ACROSS micro-batches, with explicit state schema and timeout
policy — the escape hatch for streaming semantics that windowed aggs
can't express.

Operator: per-user running totals (event count + exact sum). State is
(count, scaled-sum) where the sum is kept as an integer of cents —
the same quantization discipline as functions.exact, so the streamed
result is bit-identical to the batch twin regardless of batch
boundaries or arrival order.

Scale: state is shuffled by user_id and lives in the state store
(RocksDB-backed on a real cluster); per-key state here is two longs —
constant size, no growth with stream length. NoTimeout because totals
are cumulative; a TTL'd variant would use ProcessingTimeTimeout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.functions import exact as ex

OUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s long"
_SCALE = 100  # cents — lossless for the 2-decimal `value` column


def user_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user totals via applyInPandasWithState.

    The state function is a closure on purpose: module-level functions
    cloudpickle by reference and fail to import on workers launched
    from outside the repo (driver smoke-run).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_totals(key, pdf_iter, state):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            # per-row quantize then integer-sum == functions.exact
            # discipline (values are exact 2-decimals, so *100 never
            # lands on a .5 tie — numpy's half-even never fires)
            s += int(pdf["value"].mul(_SCALE).round().sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s / _SCALE]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_totals,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stateful_v2_available() -> bool:
    """transformWithStateInPandas speaks a protobuf state protocol to
    the JVM; this container ships no google.protobuf, so the v2 path
    is gated (works on any standard cluster image, which bundles it)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_totals_stream_v2(events: DataFrame) -> DataFrame:
    """Same operator on the transformWithStateInPandas API (Spark 4's
    stateful-v2): typed state handles (ValueState here; List/MapState
    for bigger shapes), timers, and TTL come from the handle instead
    of one opaque tuple — and the runtime REQUIRES the RocksDB state
    store provider, i.e. the state backend a real cluster runs (set
    spark.sql.streaming.stateStore.providerClass accordingly).

    Both APIs stay implemented side by side: applyInPandasWithState is
    the stable v1 every 3.4+ cluster has; this is the forward path.
    Gated by stateful_v2_available() in this container (protobuf)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class UserTotalsProcessor(StatefulProcessor):
        # closure-scoped class: cloudpickle serializes it by value, so
        # foreign-cwd drivers never need this package importable
        def init(self, handle):
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, s = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                s += int(pdf["value"].mul(_SCALE).round().sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s / _SCALE]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin — identical math through functions.exact."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        ex.quantized_sum("value", 2).alias("sum_value"),
    )


def events_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_totals_batch(load_table(spark, sf_dir, "events"))


QUERIES = {
    "events_user_totals": events_user_totals,
}

ORACLE = {
    "events_user_totals": f"""
        SELECT user_id,
               COUNT(*) AS n_events,
               {ex.sql_sum('value', 2)} AS sum_value
        FROM events
        GROUP BY user_id
    """,
}
