#!/usr/bin/env python
"""One-command rehearsal of the external driver's grading surface.

Runs, from OUTSIDE the repo semantics (no repo cwd assumptions):
  1. the `entry(spark)` smoke check,
  2. every `queries()` entry vs its `oracle_sql()` DuckDB twin at the
     given scale factor (the correctness gate),
and prints a one-line verdict. Use before any round-ending commit:

    python /root/repo/tools/rehearse.py [sf_dir] [--names n1,n2,...]

Exit code 0 iff everything passes. See .claude/skills/verify/SKILL.md
for the full verification recipe (this script is its step 1).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time

REPO = "/root/repo"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--names", help="comma-separated subset of queries")
    ap.add_argument(
        "--exclude",
        help="comma-separated queries to skip (the sf0.1 sweep drops "
        "the pairwise/recursive-oracle family whose DuckDB side is "
        "quadratic — their ENGINE cost is benchmarked separately)",
    )
    ap.add_argument(
        "-v",
        "--verbose",
        action="store_true",
        help="print per-query timing (find slow oracles at big sf)",
    )
    ap.add_argument(
        "--manifest",
        help="write per-query spark/oracle wall-clock JSON here "
        "(the oracle-cost manifest; tests/test_oracle_costs.py "
        "asserts a budget over the committed copy)",
    )
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    entry_rows = len(mod.entry(spark).collect())
    print(f"entry: {entry_rows} rows")
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from tests.oracle_harness import check_query

    qs = mod.queries()
    names = args.names.split(",") if args.names else list(qs)
    if args.exclude:
        dropped = set(args.exclude.split(","))
        unknown = dropped - set(qs)
        if unknown:
            raise SystemExit(f"--exclude names not registered: {unknown}")
        names = [n for n in names if n not in dropped]
        print(f"excluded {len(dropped)} (pairwise/recursive oracles)")
    fails = 0
    manifest: dict[str, dict] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            manifest[name] = check_query(spark, name, args.sf_dir)
            if args.verbose:
                o = manifest[name]["oracle_sec"]
                print(
                    f"ok   {name} {time.perf_counter() - t0:.1f}s"
                    f" (oracle {'—' if o is None else f'{o:.1f}s'})",
                    flush=True,
                )
        except Exception as e:  # noqa: BLE001 — report-and-continue
            fails += 1
            print(f"FAIL {name}: {type(e).__name__} {str(e)[:200]}")
    if args.manifest:
        with open(args.manifest, "w") as f:
            json.dump({"sf_dir": args.sf_dir, "queries": manifest}, f, indent=1)
        print(f"manifest: {len(manifest)} entries -> {args.manifest}")
    print(
        f"rehearsal: {len(names) - fails}/{len(names)} pass "
        f"({len(qs)} registered) at {args.sf_dir}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
