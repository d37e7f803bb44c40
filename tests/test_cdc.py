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


def test_snapshot_diff_classifies_churn_exactly(spark, sf_dir):
    """The diff of (orders, merge(orders, batch)) recovers exactly the
    batch's own modular key rules."""
    from mpi_mapreduce_spark.operators.cdc import cdc_orders_snapshot_diff

    rows = cdc_orders_snapshot_diff(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.change_type, set()).add(r.o_orderkey)
    assert set(by_type) == {"added", "removed", "changed"}
    for k in by_type["removed"]:
        assert k % 97 == 0
    for k in by_type["changed"]:
        assert k % 10 == 0 and k % 97 != 0
    for k in by_type["added"]:
        assert k >= 10_000_000 and (k - 10_000_000) % 1000 == 0
    # no key in two classes
    assert not (by_type["added"] & by_type["removed"] & by_type["changed"])


def test_snapshot_diff_identical_snapshots_empty(spark, sf_dir):
    from mpi_mapreduce_spark.datamodel import load_table
    from mpi_mapreduce_spark.operators.cdc import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    assert snapshot_diff(orders, orders, ["o_orderkey"]).count() == 0


def test_snapshot_diff_keys_only_table(spark):
    """A snapshot with no value columns still diffs (added/removed)."""
    from mpi_mapreduce_spark.operators.cdc import snapshot_diff

    a = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    b = spark.createDataFrame([(2,), (3,), (4,)], ["k"])
    rows = {(r.k, r.change_type) for r in snapshot_diff(a, b, ["k"]).collect()}
    assert rows == {(1, "removed"), (4, "added")}


def test_scd2_intervals_tile_per_key(spark, sf_dir):
    """SCD2 property checks: per user exactly one current (open)
    version; closed versions chain — each valid_to equals the next
    version's valid_from; intervals never overlap or gap."""
    from mpi_mapreduce_spark.operators.cdc import cdc_user_value_scd2

    rows = cdc_user_value_scd2(spark, sf_dir).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, versions in by_user.items():
        currents = [r for r in versions if r.is_current]
        assert len(currents) == 1, uid
        assert currents[0].valid_to is None
        closed = sorted(
            (r for r in versions if not r.is_current),
            key=lambda r: r.valid_from,
        )
        chain = closed + currents
        for a, b in zip(chain, chain[1:]):
            assert a.valid_to == b.valid_from, uid
