"""PageRank: hand-graph sanity, mass conservation, float cross-check."""

from __future__ import annotations

import pytest

from mpi_mapreduce_spark.operators.graph import (
    N_ITER,
    SCALE,
    graph_nation_pagerank,
    pagerank,
)


def _toy(spark):
    nodes = spark.createDataFrame([(i,) for i in range(4)], ["id"])
    # 1,2,3 all point at 0; 0 points back at 1 only
    edges = spark.createDataFrame(
        [(1, 0, 5), (2, 0, 1), (3, 0, 1), (0, 1, 1)],
        ["src", "dst", "w"],
    )
    return nodes, edges


def test_pagerank_hub_dominates(spark):
    nodes, edges = _toy(spark)
    pr = {r.id: r.pr for r in pagerank(nodes, edges).collect()}
    assert set(pr) == {0, 1, 2, 3}
    # the node every edge points at outranks everything
    assert pr[0] > pr[1] > pr[2]
    # 2 and 3 have identical in/out structure -> identical rank
    assert pr[2] == pr[3]


def test_pagerank_mass_conserved_up_to_flooring(spark):
    nodes, edges = _toy(spark)
    total = sum(r.pr for r in pagerank(nodes, edges).collect())
    # each node floors at most a few units per round; never exceeds 1.0
    assert SCALE - 1000 * N_ITER <= total <= SCALE


def test_nation_pagerank_matches_float_reference(spark, sf_dir):
    """Integer-exact ranks track a numpy double-precision PageRank to
    well under the damping factor's own resolution."""
    np = pytest.importorskip("numpy")
    from mpi_mapreduce_spark.datamodel import load_table
    from mpi_mapreduce_spark.operators.graph import trade_edges

    edges = trade_edges(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    ).collect()
    n_ids = [
        r.n_nationkey
        for r in load_table(spark, sf_dir, "nation").collect()
    ]
    idx = {k: i for i, k in enumerate(sorted(n_ids))}
    n = len(idx)
    w = np.zeros((n, n))
    for e in edges:
        w[idx[e.src], idx[e.dst]] = e.w
    out = w.sum(axis=1, keepdims=True)
    p = np.divide(w, out, out=np.zeros_like(w), where=out > 0)
    pr = np.full(n, 1.0 / n)
    for _ in range(N_ITER):
        pr = 0.15 / n + 0.85 * (pr @ p)

    got = {
        r.nation: r.pr / SCALE
        for r in graph_nation_pagerank(spark, sf_dir).collect()
    }
    assert len(got) == n
    name_of = {
        idx[r.n_nationkey]: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    for i in range(n):
        assert got[name_of[i]] == pytest.approx(pr[i], abs=1e-6)


def test_anomalies_match_pandas_rolling(spark, sf_dir):
    """Per-user recount of the z² inequality over a pandas rolling
    window reproduces the flagged event set exactly."""
    pd = pytest.importorskip("pandas")
    from mpi_mapreduce_spark.datamodel import load_table
    from mpi_mapreduce_spark.operators.analytics import (
        ANOMALY_K,
        ANOMALY_WIN,
        events_value_anomalies,
    )

    flagged = {
        r.event_id
        for r in events_value_anomalies(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
    )
    ev["x"] = (ev["value"] * 100).round().astype("int64")
    expect = set()
    for _, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        x = g["x"].to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(ANOMALY_WIN - 1, len(x)):
            win = x[i - ANOMALY_WIN + 1 : i + 1]
            n, s, ss = len(win), int(win.sum()), int((win * win).sum())
            if (n * int(x[i]) - s) ** 2 > ANOMALY_K**2 * (n * ss - s * s):
                expect.add(int(ids[i]))
    assert flagged == expect and len(flagged) > 0
