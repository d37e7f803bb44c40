"""Order-independent float aggregation.

Problem: a distributed SUM/AVG over doubles is nondeterministic in its
last ulp (addition order varies by partitioning), and the driver's
correctness gate hash-compares our results against a DuckDB oracle
exactly. ROUND(SUM(x), k) does NOT fix this: when the true sum sits on
a rounding boundary, the last-ulp wobble flips the rounded value
(observed: events sliding-window AVG, 58.6212 vs 58.6213).

Fix: quantize each *row* to a fixed decimal scale, aggregate exactly
over integers, and divide back at the end:

    sum(x)  ->  SUM(CAST(ROUND(x * 10^s) AS DECIMAL(38,0))) / 10^s

Why each piece is cross-engine deterministic (Spark vs DuckDB):
- ``x * 10^s`` is one IEEE-754 multiply -> bit-identical doubles.
- scale-0 ROUND of a double agrees between engines: both round ties
  away from zero, and for scale 0 there is no second multiply that
  could move a value across a boundary (Spark's shortest-repr
  BigDecimal path and DuckDB's std::round agree for every double,
  because half-integer boundaries are exactly representable).
  Scale-k ROUND (k>0) does NOT have this property — never use it on a
  value both engines must agree on.
- integer (decimal) addition is exact and order-independent — the
  shuffle/partial-agg order no longer matters.
- the final division is one IEEE op on identical inputs.

Scale at 100 TB: DECIMAL(38,0) sums never overflow in practice
(38 digits vs int64's 18), and Spark's partial aggregation still
applies — the shuffle carries one decimal per group per partition.

Reference parity: the reference's only aggregate is an int32 sum
(reference tasks.c:149-161), which is trivially exact; these helpers
extend that exactness guarantee to doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def quantize(col, scale: int) -> Column:
    """Per-row: round a double to `scale` decimals, cross-engine-safe
    (scale-0 round after an explicit multiply)."""
    m = float(10**scale)
    return F.round(_c(col) * F.lit(m)) / F.lit(m)


def quantized_sum(col, scale: int, wide: bool = False) -> Column:
    """Exact, order-independent sum of a double quantized to `scale`
    decimals. Result is a double equal to an integer multiple of
    10^-scale (bit-identical in any engine).

    Default accumulates in int64 — codegen'd, measured 2x faster than
    decimal(38,0) here. Range bound: |Σx| · 10^scale must stay under
    2^63 ≈ 9.2e18 PER GROUP (e.g. scale 4 → ±9.2e14 of group total —
    ample for per-key aggregates even at 100 TB; a 6-group global sum
    over ~1e9 rows of ~1e5-magnitude values at scale 6 would not be:
    pass wide=True there to accumulate in decimal(38,0) instead)."""
    m = float(10**scale)
    q = F.round(_c(col) * F.lit(m))
    acc = q.cast("decimal(38,0)") if wide else q.cast("long")
    return F.sum(acc).cast("double") / F.lit(m)


def quantized_avg(col, scale: int, wide: bool = False) -> Column:
    """Deterministic mean: exact quantized sum divided by the non-null
    count. Full-precision double output (identical in any engine)."""
    return quantized_sum(col, scale, wide) / F.count(_c(col))


def quantized_sum_over(col, scale: int, window, wide: bool = False) -> Column:
    """Windowed variant of quantized_sum (e.g. running totals) —
    engines may sum window frames in different orders (segment trees
    vs streaming), so the same exactness trick applies."""
    m = float(10**scale)
    q = F.round(_c(col) * F.lit(m))
    acc = q.cast("decimal(38,0)") if wide else q.cast("long")
    return F.sum(acc).over(window).cast("double") / F.lit(m)


# --- DuckDB oracle-side builders (same math, SQL text) ---------------------

def sql_quantize(expr: str, scale: int) -> str:
    m = 10**scale
    return f"ROUND(({expr}) * {m}.0) / {m}.0"


def sql_sum(expr: str, scale: int) -> str:
    m = 10**scale
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {m}.0) AS HUGEINT)) AS DOUBLE)"
        f" / {m}.0"
    )


def sql_avg(expr: str, scale: int) -> str:
    return f"({sql_sum(expr, scale)}) / COUNT({expr})"


def sql_sum_over(expr: str, scale: int, over: str) -> str:
    m = 10**scale
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {m}.0) AS HUGEINT)) OVER ({over})"
        f" AS DOUBLE) / {m}.0"
    )
