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

#: sf0.1 = the BENCH scale; slowest included oracle observed is
#: customer_name_fuzzy_pairs' edit-distance pair CTE at 117 s, so the
#: budget leaves ~2.5× headroom before a sweep-stalling regression
#: trips it
ORACLE_BUDGET_SF01_SEC = 300.0

MANIFEST_SF01 = os.path.join(
    os.path.dirname(__file__), "..", "tools", "oracle_costs_sf0.1.json"
)

#: the sf0.1 exclusion convention (SCALING.md), burned down in r13
#: (VERDICT r12 item 5) from 17 entries to ZERO: the ngram-Jaccard /
#: containment oracles now draw candidate pairs from an inverted
#: shingle index instead of all same-band pairs — a LOSSLESS pruning
#: (threshold > 0 implies a shared shingle) that keeps attestation
#: strength while dropping the DuckDB cost from band-quadratic to
#: candidate mass; every former exclusion was then probed under the
#: 300 s budget at sf0.1 and re-included (slowest:
#: pipeline_canonical_containment at 129.7 s on an idle box — the
#: canonical corpus's uncapped shingle-df candidate mass — then the
#: CC recursion family at ~2.5 min each). Pinned EXACTLY (now: empty)
#: so a new query silently skipping the sf0.1 sweep — or an old one
#: dropping out of it — fails here, not in a stalled sweep.
EXCLUDED_SF01: set[str] = set()


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


def test_sf01_manifest_budget_and_pinned_exclusions():
    """Round-6 extension: the bench-scale (sf0.1) manifest is budget-
    asserted too, and its exclusion set — the pairwise/recursive oracle
    family documented in SCALING.md — is pinned exactly, so a future
    oracle regression at the scale the bench runs at fails loudly here
    instead of stalling a sweep."""
    from mpi_mapreduce_spark.plans.registry import QUERIES

    with open(MANIFEST_SF01) as f:
        manifest = json.load(f)
    entries = manifest["queries"]

    excluded = set(QUERIES) - set(entries)
    assert excluded == EXCLUDED_SF01, (
        f"sf0.1 sweep exclusions drifted from the documented "
        f"pairwise/recursive family: unexpected "
        f"{sorted(excluded - EXCLUDED_SF01)}, no-longer-excluded "
        f"{sorted(EXCLUDED_SF01 - excluded)} (regenerate with "
        f"`python tools/rehearse.py /root/testdata/sf0.1 --manifest "
        f"tools/oracle_costs_sf0.1.json` or update EXCLUDED_SF01 with "
        f"the reason)"
    )

    over = {
        n: v["oracle_sec"]
        for n, v in entries.items()
        if v.get("oracle_sec") is not None
        and v["oracle_sec"] > ORACLE_BUDGET_SF01_SEC
    }
    assert not over, f"oracle cost bombs at sf0.1: {over}"
