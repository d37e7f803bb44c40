"""merge_upsert semantics on a toy keyed snapshot: update wins,
insert appears, tombstone vanishes, untouched rows survive."""

from __future__ import annotations

from mpi_mapreduce_spark.operators.cdc import merge_upsert


def test_merge_upsert_update_insert_delete(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    source = spark.createDataFrame(
        [
            (2, "b2", 25.0, False),  # update
            (4, "d", 40.0, False),  # insert
            (3, "c", 0.0, True),  # tombstone
        ],
        ["k", "s", "v", "dead"],
    )
    got = {
        r.k: (r.s, r.v)
        for r in merge_upsert(target, source, ["k"], "dead").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b2", 25.0), 4: ("d", 40.0)}


def test_merge_upsert_without_tombstones(spark):
    target = spark.createDataFrame([(1, 1.0)], ["k", "v"])
    source = spark.createDataFrame([(1, 2.0), (2, 3.0)], ["k", "v"])
    got = {r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {1: 2.0, 2: 3.0}


def test_cdc_rollforward_status_x_present(spark, sf_dir):
    from mpi_mapreduce_spark.operators.cdc import cdc_orders_rollforward

    rows = {r.status: r.n_orders for r in cdc_orders_rollforward(spark, sf_dir).collect()}
    assert rows.get("X", 0) > 0, "updated rows must carry the new status"
