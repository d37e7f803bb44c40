"""Budget guard over the committed oracle-cost manifest.

Round 4 found a 915 s DuckDB oracle (training_split_cluster_safe's
recursive CTE at sf0.1) *by hand* after it stalled a sweep. The
manifest (written by ``tools/rehearse.py --manifest`` during the
round's full sf0.01 rehearsal) records per-query Spark and oracle
wall-clock; this test asserts (a) the manifest covers every registered
query — so adding a query without re-running the sweep fails loudly —
and (b) no sf0.01 oracle exceeds the budget, so an oracle-side cost
bomb is caught at the cheap scale before it can stall a bigger one.
"""

from __future__ import annotations

import json
import os

#: generous vs the observed distribution (slowest sf0.01 oracle is the
#: pipeline_canonical_containment recursive CTE); an oracle over this
#: is a cost bomb to rewrite, not a budget to raise
ORACLE_BUDGET_SEC = 120.0

MANIFEST = os.path.join(
    os.path.dirname(__file__), "..", "tools", "oracle_costs_sf0.01.json"
)


def test_manifest_covers_registry_and_no_oracle_exceeds_budget():
    from mpi_mapreduce_spark.plans.registry import ORACLE, QUERIES

    with open(MANIFEST) as f:
        manifest = json.load(f)
    entries = manifest["queries"]

    missing = set(QUERIES) - set(entries)
    assert not missing, (
        f"queries missing from the oracle-cost manifest (regenerate with "
        f"`python tools/rehearse.py /root/testdata/sf0.01 --manifest "
        f"tools/oracle_costs_sf0.01.json`): {sorted(missing)}"
    )

    # every oracle-bearing query must carry an oracle timing…
    untimed = [
        n
        for n in ORACLE
        if n in entries and entries[n].get("oracle_sec") is None
    ]
    assert not untimed, f"oracle queries with no recorded timing: {untimed}"

    # …and none may exceed the budget at sf0.01
    over = {
        n: v["oracle_sec"]
        for n, v in entries.items()
        if v.get("oracle_sec") is not None
        and v["oracle_sec"] > ORACLE_BUDGET_SEC
    }
    assert not over, f"oracle cost bombs at sf0.01: {over}"
