"""Vector column functions over ``array<float>`` embeddings.

Dot products and norms are native ``zip_with`` / ``aggregate``
expressions — JVM-evaluated, no Python per row. Elements are cast to
double *before* any arithmetic so results are reproducible against the
DuckDB oracle (float32 accumulation would diverge in the last ulps).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i — sequential left fold in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def normalize(a: Column) -> Column:
    """a / ||a|| — pre-normalizing once turns cosine into a plain dot
    product, the trick every ANN stage here relies on."""
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a)
