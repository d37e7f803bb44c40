"""The reference's complete job, as one callable + CLI.

The reference runs
``mpirun -np N ./a03 <input_dir> <num_files> <M> <R> <out> <task>``
(arg parsing at reference main.cpp:68-74; canonical invocation
Makefile:14). A user switching engines runs the same job here as

    run_reference_job(spark, input_dir, num_files, task, out)
    # or: python -m mpi_mapreduce_spark.refjob <dir> <n> <out> <task>

mapping the reference's knobs onto Spark's runtime:

- ``input_dir``/``num_files`` → the `refcorpus` Python DataSource
  (one input partition per file — the reference's map-task unit,
  main.cpp:141-155).
- ``map_reduce_task_num`` 1|2|3 → the reference-parity operators
  (tasks.c:13-45, 53-88, 98-133), all native columnar plans.
- ``num_map_workers``/``num_reduce_workers`` → dropped on purpose:
  Spark sizes stages from partitions and cluster resources
  (main.cpp:76-81's world-size normalization is scheduler work, not
  job semantics). ``num_reduce_workers`` survives only as the
  optional djb2-compat partition count.
- output → ``key<space>val`` text, byte-compatible with the golden
  files (main.cpp:169-172 format; key-sorted like the goldens).

``compat=True`` additionally applies the reference's wire-format
artifacts (7-char key truncation + int32 values, tasks.h:12-15) via
ref_compat — off by default because they are bugs at scale, not
semantics (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mpi_mapreduce_spark.operators.mapreduce import (
    map1_charclass,
    map2_letterfreq,
    map3_synthetic,
    ref_compat,
)
from mpi_mapreduce_spark.sources.io import write_kv_text
from mpi_mapreduce_spark.sources.refcorpus import register_ref_corpus_source

TASKS = {1: map1_charclass, 2: map2_letterfreq, 3: map3_synthetic}


def run_reference_job(
    spark: SparkSession,
    input_dir: str,
    num_files: int,
    task: int,
    output_path: str | None = None,
    compat: bool = False,
) -> DataFrame:
    """Run reference task 1/2/3 over ``<input_dir>/{0..num_files-1}.txt``
    and optionally write the ``key val`` text result. Returns the
    (key, val) DataFrame either way."""
    if task not in TASKS:
        raise ValueError(f"task must be 1, 2 or 3, got {task!r}")
    register_ref_corpus_source(spark)
    corpus = (
        spark.read.format("refcorpus")
        .option("path", input_dir)
        .option("numfiles", str(num_files))
        .load()
    )
    kv = TASKS[task](corpus)
    if compat:
        kv = ref_compat(kv)
    if output_path is not None:
        write_kv_text(kv, output_path)
    return kv


def main() -> None:
    import sys

    if len(sys.argv) != 5:
        print(
            "usage: python -m mpi_mapreduce_spark.refjob "
            "<input_dir> <num_files> <output_path> <task 1|2|3>",
            file=sys.stderr,
        )
        raise SystemExit(2)
    input_dir, num_files, output_path, task = sys.argv[1:]
    from mpi_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="mpi_mapreduce_spark-refjob")
    run_reference_job(
        spark, input_dir, int(num_files), int(task), output_path
    )
    spark.stop()


if __name__ == "__main__":
    main()
