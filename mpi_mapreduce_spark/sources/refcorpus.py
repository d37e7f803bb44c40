"""`refcorpus` — a Spark Python DataSource for the reference's input
layout: a directory of numbered whole-file text records
`<dir>/0.txt … <dir>/{n-1}.txt` (reference main.cpp:28-34, read whole
into one buffer at main.cpp:36-47).

Usage::

    register_ref_corpus_source(spark)
    df = (spark.read.format("refcorpus")
          .option("path", "/data/corpus").load())   # doc_id, text

This replaces the reference's hand-rolled master loop (read file i,
pick worker (i % M)+1, MPI_Send — main.cpp:141-155) with a declarative
source: `partitions()` plans **one input partition per file**, exactly
the reference's map-task granularity, and Spark's scheduler assigns
them dynamically (with locality, retries, and speculative execution —
strictly better than the static round-robin of main.cpp:103-106).

Text is decoded latin-1 so byte counts equal char counts (`strlen`
semantics, tasks.c:14) — golden-output parity needs that for the two
Gutenberg files.

Scale: a Python data source streams Arrow batches from Python workers,
so it is the compat/ingest path, not the hot path — bulk corpora
belong in parquet (sources/io.py). Per-file partitions are right for
the reference's file sizes; for millions of tiny files, pack many
files per partition (InputPartition carrying a file range) to bound
scheduler overhead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def make_ref_corpus_source():
    """Build the DataSource class. Defined inside a factory on purpose:
    cloudpickle serializes function-local classes by VALUE, so Spark's
    Python workers never need this package on their sys.path (a
    module-level class pickles by reference and fails on any driver
    that didn't install the repo — same rule as the engine's pandas
    UDF closures)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class RefCorpusReader(DataSourceReader):
        def __init__(self, options):
            self.dir = options["path"]
            n = options.get("numfiles")
            self.num_files = int(n) if n is not None else None

        def partitions(self):
            import os

            n = self.num_files
            if n is None:  # autodetect: consecutive {i}.txt from 0
                n = 0
                while os.path.exists(os.path.join(self.dir, f"{n}.txt")):
                    n += 1
            return [InputPartition(i) for i in range(n)]

        def read(self, partition):
            import os

            i = partition.value
            with open(os.path.join(self.dir, f"{i}.txt"), "rb") as f:
                yield i, f.read().decode("latin-1")

    class RefCorpusDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "refcorpus"

        def schema(self) -> str:
            return "doc_id long, text string"

        def reader(self, schema):
            return RefCorpusReader(self.options)

    return RefCorpusDataSource


def register_ref_corpus_source(spark: SparkSession) -> None:
    spark.dataSource.register(make_ref_corpus_source())
