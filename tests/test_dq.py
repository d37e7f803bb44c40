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


def test_skew_report_flags_planted_hot_key(spark):
    from mpi_mapreduce_spark.operators.dq import skew_report

    # 9 keys with 1 row each + one key with 991 rows: skew factor
    # 991*10/1000 = 9.91 (no salting at 16x); crank to 99.1% one key
    rows = [(i, "cold") for i in range(9)]
    rows += [(100 + i, "hot") for i in range(991)]
    df = spark.createDataFrame(rows, "event_id long, k string")
    out = {r.key_col: r for r in skew_report(df, ["k", "event_id"]).collect()}
    k = out["k"]
    assert (k.n_rows, k.n_keys, k.max_count) == (1000, 2, 991)
    assert k.hot_key == "hot"
    assert abs(k.skew_factor - 991 * 2 / 1000) < 1e-9
    assert not k.recommend_salting  # 1.982x is AQE territory
    # event_id is near-unique: factor ~1, no recommendation
    e = out["event_id"]
    assert e.max_count == 1 and not e.recommend_salting
    # a genuinely degenerate key (all rows one value) does get flagged
    one = spark.createDataFrame(
        [(i, "same") for i in range(64)], "event_id long, k string"
    )
    flagged = {r.key_col: r for r in skew_report(one, ["k"]).collect()}["k"]
    assert not flagged.recommend_salting  # n_keys=1 -> factor 1: uniform
    two = spark.createDataFrame(
        [(i, "same") for i in range(640)] + [(1000 + i, f"k{i}") for i in range(31)],
        "event_id long, k string",
    )
    f2 = {r.key_col: r for r in skew_report(two, ["k"]).collect()}["k"]
    assert f2.recommend_salting  # 640*32/671 = 30.5x uniform
