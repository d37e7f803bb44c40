"""HLL sketch table: accuracy bound and merge-equals-direct identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.operators.sketches import (
    LG_K,
    daily_user_sketches,
    events_hll_user_rollup,
    hll_user_rollup_estimates,
)


def test_hll_rollup_within_error_bound(spark, sf_dir):
    """lgK=12 → ±1.6% RSE; assert a generous 5% against exact."""
    est = {
        r.event_type: r.est_users
        for r in hll_user_rollup_estimates(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(1, 0.05 * n)


def test_hll_union_of_dailies_equals_direct_sketch(spark, sf_dir):
    """Register-wise max is associative: the rollup of daily sketches
    must estimate exactly what one direct sketch over the raw rows
    estimates — the property that makes sketch tables re-aggregable."""
    ev = load_table(spark, sf_dir, "events")
    merged = {
        r.event_type: r.est
        for r in daily_user_sketches(ev)
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
        .collect()
    }
    direct = {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(LG_K))
            ).alias("est")
        )
        .collect()
    }
    assert merged == direct


def test_sketch_table_round_trips_through_parquet(spark, sf_dir, tmp_path):
    """The stored-sketch workflow: persist daily sketches as a parquet
    table, read back, union-rollup — estimates identical to the
    in-memory path (binary column survives storage bit-exact)."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "sketches")
    daily_user_sketches(ev).write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    from_disk = {
        r.event_type: r.est
        for r in stored.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    in_mem = {
        r.event_type: r.est
        for r in daily_user_sketches(ev)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    assert from_disk == in_mem
