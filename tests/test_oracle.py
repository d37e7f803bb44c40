"""Every registered query hash-matches its DuckDB oracle (the same
check the driver runs at sf0.01; here at the test scale factor)."""

from __future__ import annotations

import pytest

from mpi_mapreduce_spark.plans.registry import QUERIES
from tests.oracle_harness import check_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    check_query(spark, name, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(QUERIES) >= set(e.oracle_sql())
