"""Local rehearsal of the driver's DuckDB-oracle correctness gate.

Mirrors the driver contract: run the Spark query and the oracle SQL on
the same parquet tables, compare row count + sorted column names +
column dtype kinds + order-insensitive values BIT-EXACTLY (the driver
sorts columns by name then value-hashes, so only == fidelity rehearses
it faithfully; the engine's quantize/exact-aggregation discipline is
what makes == achievable).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mpi_mapreduce_spark.datamodel import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def _cells_equal(a, b) -> bool:
    """BIT-EXACT compare — the driver value-hashes, so any float that
    merely lands within a tolerance still flips the hash. The engine's
    quantize/exact-aggregation discipline exists precisely so == is
    achievable; rehearsing with a tolerance would hide real driver
    failures (caught once in round 2: an oracle-side HUGEINT→float64
    coercion that passed at 1e-9 and would have hash-mismatched)."""
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)


def _kind(dtype) -> str:
    # int-vs-float column type divergence (e.g. DuckDB HUGEINT →
    # pandas float64) changes hashed value reprs even when values
    # match numerically — flag it as a schema mismatch.
    return "f" if dtype.kind == "f" else ("i" if dtype.kind in "iu" else "o")


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} (spark) != {len(oracle_df)} (oracle)"
    )
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    for col in s_cols:
        sk = _kind(spark_df[col].dtype)
        ok = _kind(oracle_df[col].dtype)
        assert sk == ok, (
            f"{name}: column {col!r} dtype kind {sk} (spark) != {ok} "
            f"(oracle) — cast the oracle output (e.g. HUGEINT sums to "
            f"BIGINT) so the driver hashes identical reprs"
        )
    s, o = _canon(spark_df), _canon(oracle_df)
    for col in s.columns:
        sv, ov = list(s[col]), list(o[col])
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, ov))
            if not _cells_equal(a, b)
        ]
        assert not bad, (
            f"{name}: column {col!r} mismatches (first 5 of {len(bad)}): {bad[:5]}"
        )


def check_query(spark, name: str, sf_dir: str) -> dict:
    """Run one query vs its oracle; returns wall-clock per side so
    callers can build the oracle-cost manifest (a 915 s DuckDB
    recursive-CTE oracle at sf0.1 stalled a round-4 sweep — the
    manifest + budget test in tests/test_oracle_costs.py make that
    failure mode visible before it stalls anything)."""
    import time

    from mpi_mapreduce_spark.plans.registry import ORACLE, QUERIES

    t0 = time.perf_counter()
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    spark_sec = time.perf_counter() - t0
    if name not in ORACLE:
        assert len(sdf) >= 0  # rows-only check, mirrors the driver
        return {"spark_sec": round(spark_sec, 3), "oracle_sec": None}
    t0 = time.perf_counter()
    odf = run_oracle(ORACLE[name], sf_dir)
    oracle_sec = time.perf_counter() - t0
    assert_frames_match(sdf, odf, name)
    return {
        "spark_sec": round(spark_sec, 3),
        "oracle_sec": round(oracle_sec, 3),
    }
