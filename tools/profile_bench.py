#!/usr/bin/env python
"""Per-query bench profiler (guide §1: measure first).

Mimics bench.py's methodology (same session config, warmup, min-of-3,
System.gc between reps, leaked-block sweep) but splits each timed rep
into CONSTRUCTION (plan build, registry callable) vs EXECUTION
(count()) wall, and records how many Spark jobs/stages/tasks the
execution submitted — the fixed-overhead decomposition that tells you
whether a 1 s query is slow because of data or because of job count.

    python tools/profile_bench.py [--names a,b,c] [--reps 3]

Prints one TSV line per query, worst-total first, plus a jobs/tasks
summary. Diagnostic only — bench.py stays the graded surface.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", help="comma-separated subset")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import HEADLINE

    from mpi_mapreduce_spark.plans.registry import QUERIES
    from mpi_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="profile-bench")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    names = [n for n in (args.names.split(",") if args.names else HEADLINE)
             if n in QUERIES]

    def free_leaked_blocks() -> None:
        jrdds = sc._jsc.getPersistentRDDs()
        for jrdd in list(jrdds.values()):
            if jrdd.rdd().isLocallyCheckpointed():
                jrdd.unpersist(True)

    if any(n.startswith("substring_serving_") for n in names):
        from mpi_mapreduce_spark.operators.dedup import _serving_bench_state

        _serving_bench_state(spark, SF_DIR)
        free_leaked_blocks()

    for name in names:
        QUERIES[name](spark, SF_DIR).count()
        free_leaked_blocks()

    rows = []
    for name in names:
        best = None
        for _ in range(args.reps):
            spark._jvm.System.gc()
            jobs0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            # job ids are global+monotone in local mode; count new ones
            all_jobs = sorted(tracker.getJobIdsForGroup(None) or [])
            new_jobs = all_jobs[jobs0:]
            n_stages = n_tasks = 0
            for j in new_jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numCompletedTasks > 0:
                        n_stages += 1
                        n_tasks += si.numCompletedTasks
            rec = (t2 - t0, t1 - t0, t2 - t1, len(new_jobs), n_stages, n_tasks)
            if best is None or rec[0] < best[0]:
                best = rec
            free_leaked_blocks()
        rows.append((name, *best))

    rows.sort(key=lambda r: -r[1])
    print("query\ttotal_s\tconstruct_s\texec_s\tjobs\tstages\ttasks")
    for name, tot, cons, ex, j, st, tk in rows:
        print(f"{name}\t{tot:.3f}\t{cons:.3f}\t{ex:.3f}\t{j}\t{st}\t{tk}")
    tot = sum(r[1] for r in rows)
    cons = sum(r[2] for r in rows)
    print(f"# TOTAL {tot:.2f}s  construction {cons:.2f}s "
          f"({100*cons/tot:.0f}%)  jobs {sum(r[4] for r in rows)}",
          file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
