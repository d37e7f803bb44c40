"""Full reference-job lifecycle: refcorpus connector → task operator →
key-val text sink, compared against the reference's golden output
files (the exact jobs of reference Makefile:14 / check_zip.sh:103)."""

from __future__ import annotations

import os

import pytest

from mpi_mapreduce_spark.refjob import run_reference_job

REF_INPUTS = "/root/reference/sample_input_files"
REF_OUTPUTS = "/root/reference/sample_output_files"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_INPUTS), reason="reference corpus not available"
)

#: golden files and the job shape that produced them (verified in
#: SURVEY §5): (task, num_files, golden file)
GOLDEN_JOBS = [
    (1, 1, "1.output"),
    (2, 5, "2.output"),
    (3, 6, "3.output"),
]


def _golden_lines(name: str) -> list[str]:
    with open(os.path.join(REF_OUTPUTS, name)) as f:
        return sorted(line.rstrip("\n") for line in f if line.strip())


@needs_reference
@pytest.mark.parametrize("task,num_files,golden", GOLDEN_JOBS)
def test_reference_job_end_to_end(spark, tmp_path, task, num_files, golden):
    out = str(tmp_path / f"task{task}.out")
    run_reference_job(spark, REF_INPUTS, num_files, task, out)
    part = next(
        p
        for p in (tmp_path / f"task{task}.out").iterdir()
        if p.name.startswith("part-")
    )
    got = sorted(
        line for line in part.read_text().splitlines() if line.strip()
    )
    assert got == _golden_lines(golden)


@needs_reference
def test_reference_job_compat_mode_truncates_keys(spark):
    kv = run_reference_job(spark, REF_INPUTS, 1, 1, compat=True)
    assert dict(kv.dtypes) == {"key": "string", "val": "int"}
    assert all(len(r.key) <= 7 for r in kv.collect())
