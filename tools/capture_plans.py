#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/<tag>/.

    python tools/capture_plans.py before [--names a,b,c] [--dir plans/r13]

Writes plans/r13/<query>_<tag>.txt for each headline query (the
optimization-round evidence files; guide §1/§7.2).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=["before", "after"])
    ap.add_argument("--names", help="comma-separated subset")
    ap.add_argument("--dir", default=os.path.join(REPO_ROOT, "plans", "r13"))
    args = ap.parse_args()

    from bench import HEADLINE

    from mpi_mapreduce_spark.plans.audit import formatted_plan
    from mpi_mapreduce_spark.plans.registry import QUERIES
    from mpi_mapreduce_spark.session import get_spark

    os.makedirs(args.dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    names = [n for n in (args.names.split(",") if args.names else HEADLINE)
             if n in QUERIES]
    if any(n.startswith("substring_serving_") for n in names):
        from mpi_mapreduce_spark.operators.dedup import _serving_bench_state

        _serving_bench_state(spark, SF_DIR)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        path = os.path.join(args.dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
