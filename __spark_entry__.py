"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; ``queries()`` / ``oracle_sql()``
feed the per-round DuckDB correctness gate. Implementations live in
``mpi_mapreduce_spark`` (see SURVEY.md §2 / §7).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the pricing-summary aggregate (scan → pushed filter →
    partial/final hash agg): exercises every stage boundary of the
    reference's lifecycle (SURVEY.md §3) on the Spark runtime.
    """
    from mpi_mapreduce_spark.plans.registry import QUERIES

    return QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mpi_mapreduce_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (rows-only checks where absent)."""
    from mpi_mapreduce_spark.plans.registry import ORACLE

    return dict(ORACLE)
