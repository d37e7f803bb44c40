"""mpi_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference MapReduce framework (kohyida1997/MPI_MapReduce, surveyed in
SURVEY.md), re-expressed Spark-first: the DataFrame/SQL API declares the
logical plan; Catalyst + Tungsten pick the physical strategy. The
reference's pluggable (map, reduce) extension point (tasks.h:22-26)
generalizes here to a registry of named queries plus a generic
``map_reduce`` combinator; everything else (shuffle, partitioning,
aggregation, spill) is Spark built-ins.
"""

__version__ = "0.1.0"

from mpi_mapreduce_spark.session import get_spark  # noqa: F401
from mpi_mapreduce_spark.datamodel import load_table, register_views  # noqa: F401
