"""Column profiler: exact metrics on a hand-built frame."""

from __future__ import annotations

from mpi_mapreduce_spark.operators.dq import profile_table


def test_profile_counts_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "bb"), (None, "a"), (3, "zz")],
        "k bigint, s string",
    )
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert set(prof) == {"k", "s"}
    k, s = prof["k"], prof["s"]
    assert (k.n_nonnull, k.n_null, k.n_distinct) == (4, 1, 3)
    assert (k.min_val, k.max_val) == ("1", "3")
    assert (s.n_nonnull, s.n_null, s.n_distinct) == (4, 1, 3)
    assert (s.min_val, s.max_val) == ("a", "zz")


def test_transition_counts_mass_balance(spark, sf_dir):
    """Σ transitions == total events − one unlagged first event per
    user; and every from/to label is a real event type."""
    from pyspark.sql import functions as F

    from mpi_mapreduce_spark.datamodel import load_table
    from mpi_mapreduce_spark.operators.analytics import (
        events_transition_matrix,
    )

    ev = load_table(spark, sf_dir, "events")
    rows = events_transition_matrix(spark, sf_dir).collect()
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users
    types = {r.event_type for r in ev.select("event_type").distinct().collect()}
    assert {r.from_type for r in rows} <= types
    assert {r.to_type for r in rows} <= types
