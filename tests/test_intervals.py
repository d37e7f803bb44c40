"""Binned interval join: equivalence with the naive theta join on
boundary-heavy synthetic data (the oracle pins real-data values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mpi_mapreduce_spark.operators.intervals import interval_point_join


def test_binned_join_equals_theta_join_on_boundaries(spark):
    # intervals: touching boundaries, sub-bin, multi-bin span, point-width
    iv = spark.createDataFrame(
        [(1, 0, 100), (2, 100, 100), (3, 95, 405), (4, 1000, 1002)],
        "iv_id long, lo long, hi long",
    )
    pts = spark.createDataFrame(
        [(10, 0), (11, 100), (12, 101), (13, 400), (14, 405), (15, 1001), (16, 999)],
        "pt_id long, t long",
    )
    for bin_width in (7, 100, 1000):
        got = sorted(
            (r.iv_id, r.pt_id)
            for r in interval_point_join(iv, pts, "lo", "hi", "t", bin_width)
            .select("iv_id", "pt_id")
            .collect()
        )
        naive = sorted(
            (r.iv_id, r.pt_id)
            for r in iv.join(
                pts, (F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi"))
            )
            .select("iv_id", "pt_id")
            .collect()
        )
        assert got == naive, f"bin_width={bin_width}"
        # inclusive boundaries really included
        assert (1, 10) in got and (1, 11) in got and (2, 11) in got


def test_binned_join_randomized_equivalence(spark):
    """Seeded random fuzz: any interval set, any bin width — identical
    pairs to the naive theta join."""
    import random

    rng = random.Random(1234)
    iv_rows = []
    for i in range(100):
        lo = rng.randint(-500, 2000)
        iv_rows.append((i, lo, lo + rng.randint(0, 300)))
    pt_rows = [(i, rng.randint(-600, 2400)) for i in range(300)]
    iv = spark.createDataFrame(iv_rows, "iv_id long, lo long, hi long")
    pts = spark.createDataFrame(pt_rows, "pt_id long, t long")
    naive = sorted(
        (r.iv_id, r.pt_id)
        for r in iv.join(
            pts, (F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi"))
        ).select("iv_id", "pt_id").collect()
    )
    for bin_width in (13, 64, 301):
        got = sorted(
            (r.iv_id, r.pt_id)
            for r in interval_point_join(iv, pts, "lo", "hi", "t", bin_width)
            .select("iv_id", "pt_id")
            .collect()
        )
        assert got == naive, f"bin_width={bin_width}"
