"""Semantics the oracle can't see for the analytics operators: PII
masking on spans the synthetic corpus lacks (emails/phones), frame
behavior of the rolling window, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from mpi_mapreduce_spark.operators import analytics as A


def test_redact_masks_emails_phones_and_blocklist(spark):
    df = spark.createDataFrame(
        [
            ("write to bob@example.com today", 1),
            ("call 555-1234 or 555 6789 now", 2),
            ("the customer saw the value", 3),
            ("nothing sensitive here", 4),
        ],
        ["text", "id"],
    )
    out = {
        r.id: r.masked
        for r in df.select("id", A.redact_text(F.col("text")).alias("masked")).collect()
    }
    assert out[1] == "write to [MASKED] today"
    assert out[2] == "call [MASKED] or [MASKED] now"
    assert out[3] == "the [MASKED] saw the [MASKED]"
    assert out[4] == "nothing sensitive here"


def test_pii_redaction_counts_blocklist_hits(spark, sf_dir):
    rows = A.text_pii_redaction(spark, sf_dir).collect()
    assert sum(r.n_blocked for r in rows) > 0, "blocklist should fire on corpus"
    # synthetic corpus has no email/phone shapes — masked_len only
    # shrinks-or-grows via blocklist masking
    assert all(r.n_email == 0 and r.n_phone == 0 for r in rows)


def test_rolling_window_is_trailing_hour(spark, sf_dir):
    """Spot-check one user: every event's roll_n equals the manual
    count of that user's events in (t-3600, t]."""
    from mpi_mapreduce_spark.datamodel import load_table

    ev = load_table(spark, sf_dir, "events")
    uid = ev.limit(1).collect()[0].user_id
    times = sorted(
        r.t
        for r in ev.where(F.col("user_id") == uid)
        .select(F.unix_timestamp("ts").alias("t"))
        .collect()
    )
    got = {
        (r.event_id, r.roll_n)
        for r in A.events_rolling_user_stats(spark, sf_dir)
        .where(F.col("user_id") == uid)
        .collect()
    }
    by_event = dict(
        (r.event_id, r.t)
        for r in ev.where(F.col("user_id") == uid)
        .select("event_id", F.unix_timestamp("ts").alias("t"))
        .collect()
    )
    for event_id, roll_n in got:
        t = by_event[event_id]
        manual = sum(1 for x in times if t - 3600 <= x <= t)
        assert roll_n == manual


def test_deciles_are_balanced_and_monotone(spark, sf_dir):
    rows = A.customer_spend_deciles(spark, sf_dir).collect()
    by_decile = {}
    for r in rows:
        by_decile.setdefault(r.decile, []).append(r.spend)
    assert set(by_decile) == set(range(1, 11))
    # ntile balance: bucket sizes differ by at most 1
    sizes = [len(v) for _, v in sorted(by_decile.items())]
    assert max(sizes) - min(sizes) <= 1
    # monotone: max of decile d <= min of decile d+1
    for d in range(1, 10):
        assert max(by_decile[d]) <= min(by_decile[d + 1])


def test_histogram_covers_all_orders(spark, sf_dir):
    from mpi_mapreduce_spark.datamodel import load_table

    rows = A.order_price_histogram(spark, sf_dir).collect()
    assert sum(r.n_orders for r in rows) == load_table(
        spark, sf_dir, "orders"
    ).count()
    for r in rows:
        assert r.bin * 50_000 <= r.min_price <= r.max_price < (r.bin + 1) * 50_000


def test_retention_cohorts_offset_zero_covers_every_user(spark, sf_dir):
    """Every user appears in their own cohort's offset-0 cell, and no
    activity precedes the cohort week."""
    rows = A.events_retention_cohorts(spark, sf_dir).collect()
    assert rows and all(r.week_offset >= 0 for r in rows)
    zero = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    ev = A._t(spark, sf_dir, "events")
    total_users = ev.select("user_id").distinct().count()
    assert sum(zero.values()) == total_users
    # retention can never exceed the cohort's size
    for r in rows:
        assert r.n_users <= zero[r.cohort_week]


def test_market_basket_pairs_canonical_and_support_exact(spark, sf_dir):
    rows = A.orders_market_basket(spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    assert all(r.part_a < r.part_b for r in rows)
    counts = [r.n_orders for r in rows]
    assert counts == sorted(counts, reverse=True)
    # spot-check the top pair's support by direct recount
    top = rows[0]
    li = A._t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.where(F.col("l_partkey") == top.part_a).select("l_orderkey")
    b = li.where(F.col("l_partkey") == top.part_b).select("l_orderkey")
    assert a.intersect(b).count() == top.n_orders


def test_sessionize_gap_invariants(spark, sf_dir):
    """Within a session the max inter-event gap is <= 30 min; between
    consecutive sessions of one user the gap is > 30 min; event counts
    conserve."""
    sess = A.events_sessionize(spark, sf_dir).collect()
    ev = A._t(spark, sf_dir, "events")
    assert sum(r.n_events for r in sess) == ev.count()
    by_user: dict[int, list] = {}
    for r in sess:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.session_seq)
        assert [r.session_seq for r in rs] == list(range(1, len(rs) + 1)), user
        for a, b in zip(rs, rs[1:]):
            assert b.start_us - a.end_us > A.SESSION_GAP_US, user
        for r in rs:
            assert r.duration_us == r.end_us - r.start_us >= 0


def test_ohlc_open_close_ordering(spark, sf_dir):
    """Open must be the value at the bucket's earliest (ts, event_id)
    and close at its latest; high >= max(open, close) >= min(open,
    close) >= low. Recounted from raw rows in python."""
    import mpi_mapreduce_spark.operators.analytics as A
    from mpi_mapreduce_spark.datamodel import load_table
    from pyspark.sql import functions as F

    bars = {
        (r.bucket_start, r.event_type): r
        for r in A.events_ohlc_bars(spark, sf_dir).collect()
    }
    raw = (
        load_table(spark, sf_dir, "events")
        .select(
            F.date_format(
                F.window("ts", "10 minutes").getField("start"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("b"),
            "event_type", "ts", "event_id", "value",
        )
        .collect()
    )
    groups: dict = {}
    for r in raw:
        groups.setdefault((r.b, r.event_type), []).append(r)
    assert bars.keys() == groups.keys()
    for k, rows in groups.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        bar = bars[k]
        assert bar.open == rows[0].value and bar.close == rows[-1].value
        assert bar.high == max(r.value for r in rows)
        assert bar.low == min(r.value for r in rows)
        assert bar.n == len(rows)


def test_two_phase_rank_matches_global_row_number(spark):
    """two_phase_rank must equal an unpartitioned row_number over the
    same (value, key) order — including tie groups — and carry the
    exact total count on every row."""
    from pyspark.sql.window import Window as W

    data = [(i, (i * 37) % 13) for i in range(101)]  # ties in v
    df = spark.createDataFrame(data, ["k", "v"])
    got = {
        r.k: (r._r, r._n)
        for r in A.two_phase_rank(df, "v", "k").select("k", "_r", "_n").collect()
    }
    w = W.orderBy("v", "k")
    want = {
        r.k: r.rn
        for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
    }
    assert len(got) == 101
    for k, (r, n) in got.items():
        assert n == 101
        assert r == want[k], k


def test_sql_ntile_formula_matches_ntile(spark):
    """The integer-arithmetic NTILE reconstruction must agree with
    Spark's ntile() for sizes around the uneven-bucket edges."""
    from pyspark.sql.window import Window as W

    for n in (1, 4, 5, 37, 100):
        for k in (5, 10):
            df = spark.range(1, n + 1).select(
                F.col("id").alias("_r"), F.lit(n).alias("_n")
            )
            got = {
                r._r: r.b
                for r in df.select(
                    "_r", F.expr(A._sql_ntile("_r", "_n", k)).alias("b")
                ).collect()
            }
            want = {
                r._r: r.b
                for r in df.select(
                    "_r",
                    F.ntile(k).over(W.orderBy("_r")).alias("b"),
                ).collect()
            }
            assert got == want, (n, k)


def test_rank_queries_have_no_unpartitioned_window(spark, sf_dir):
    """The scale contract of the two-phase rewrite: every Window node
    in the physical plan carries a partition spec (a Window line
    prints as `Window [fns], [partSpec], [orderSpec]` — two `], [`
    separators; the unpartitioned form has one)."""
    for fn in (A.customer_spend_deciles, A.customer_rfm_segments):
        plan = (
            fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        lines = [ln for ln in plan.splitlines() if "Window [" in ln]
        assert lines, fn.__name__
        for ln in lines:
            assert ln.count("], [") == 2, (fn.__name__, ln)


def test_ewma_matches_pandas_recurrence(spark):
    """Truncated EWMA equals a hand recurrence over the trailing
    window, including the init-at-oldest-frame-value convention."""
    from mpi_mapreduce_spark.operators import analytics as A
    from mpi_mapreduce_spark.datamodel import load_table  # noqa: F401
    import numpy as np

    rows = [
        (i, 7, f"2024-01-01 00:{i:02d}:00", float(v))
        for i, v in enumerate([10, 20, 30, 40, 50])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    )
    from pyspark.sql import functions as F

    df = df.withColumn("ts", F.to_timestamp("ts"))

    import mpi_mapreduce_spark.operators.analytics as mod

    orig = mod._t
    mod._t = lambda s, d, n: df
    try:
        out = {r.event_id: r.ewma for r in A.events_user_value_ewma(spark, "x").collect()}
    finally:
        mod._t = orig
    a = A.EWMA_ALPHA
    vals = [10.0, 20.0, 30.0, 40.0, 50.0]
    for t in range(5):
        frame = vals[max(0, t - A.EWMA_WINDOW + 1) : t + 1]
        acc = frame[0]
        for x in frame[1:]:
            acc = a * x + (1.0 - a) * acc
        assert abs(out[t] - round(acc * 1e6) / 1e6) < 1e-9


def test_seasonal_profile_ratio_and_coverage(spark, sf_dir):
    from mpi_mapreduce_spark.operators.analytics import (
        events_seasonal_profile,
    )

    rows = events_seasonal_profile(spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        assert 0 <= r.hour <= 23
        assert r.n_events > 0
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        # the count-weighted mean of hourly means equals the type mean
        # up to quantization slack
        total = sum(r.n_events for r in rs)
        mixed = sum(r.avg_value * r.n_events for r in rs) / total
        assert abs(mixed - rs[0].type_avg) < 1e-4
        # ratio column is consistent with its inputs
        for r in rs:
            assert abs(r.ratio - r.avg_value / r.type_avg) <= 5e-7


def test_abc_classes_partition_and_order(spark, sf_dir):
    from mpi_mapreduce_spark.operators.analytics import parts_abc_revenue

    rows = parts_abc_revenue(spark, sf_dir).collect()
    assert rows
    total = sum(r.revenue for r in rows)
    by_class = {"A": 0.0, "B": 0.0, "C": 0.0}
    for r in rows:
        assert r.abc_class in by_class
        assert 0.0 < r.cum_share <= 1.0 + 1e-9
        by_class[r.abc_class] += r.revenue
    # class A covers ~80% of revenue (within one part's granularity)
    assert by_class["A"] <= 0.8 * total + max(r.revenue for r in rows)
    assert by_class["A"] + by_class["B"] >= 0.9 * total
    # cum_share is monotone in revenue-desc order
    srt = sorted(rows, key=lambda r: (-r.revenue, r.partkey))
    shares = [r.cum_share for r in srt]
    assert shares == sorted(shares)
