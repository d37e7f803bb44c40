"""Named-query registry — the engine's job-submission surface.

Generalizes the reference's ``map_reduce_task_num`` CLI dispatch
(reference main.cpp:74, main.cpp:84-95): a task number picking one of
three hardcoded map UDFs becomes a string-keyed registry of query
callables, each ``(spark, sf_dir) -> DataFrame``. ``ORACLE`` holds the
DuckDB-equivalent SQL per query for the correctness gate; queries
whose semantics SQL can't express (LSH buckets, streaming state) have
no oracle entry and get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def _install(module) -> None:
    overlap = set(module.QUERIES) & set(QUERIES)
    if overlap:
        raise ValueError(f"duplicate query names: {overlap}")
    QUERIES.update(module.QUERIES)
    ORACLE.update(getattr(module, "ORACLE", {}))
    missing = set(getattr(module, "ORACLE", {})) - set(module.QUERIES)
    if missing:
        raise ValueError(f"oracle without query: {missing}")


def _build() -> None:
    from mpi_mapreduce_spark.operators import (
        analytics,
        cdc,
        dedup,
        mapreduce,
        multimodal,
        relational,
        similarity,
        textops,
        tpch_full,
        training,
    )
    from mpi_mapreduce_spark.streaming import enrich, joins, stateful, windows

    from mpi_mapreduce_spark.operators import (
        asof,
        dq,
        graph,
        intervals,
        sketches,
        skew,
    )

    # Install order IS the driver's correctness-check order, and the
    # driver caps each round's oracle run at the first DRIVER_CAP
    # registered queries. The module order below no longer decides the
    # window — _ROUND_PRIORITY is the EXPLICIT, exhaustive list of the
    # first DRIVER_CAP names, asserted after promotion (round 2's
    # comment-counted module window drifted when module sizes changed;
    # an asserted name list can't).
    for mod in (
        dedup,
        similarity,
        textops,
        training,
        multimodal,
        windows,
        stateful,
        joins,
        enrich,
        graph,
        sketches,
        asof,
        intervals,
        skew,
        dq,
        cdc,
        analytics,
        tpch_full,
        mapreduce,
        relational,
    ):
        _install(mod)
    _promote(_ROUND_PRIORITY)
    head = list(QUERIES)[: len(_ROUND_PRIORITY)]
    if head != _ROUND_PRIORITY:
        raise AssertionError(
            f"driver window mismatch: {set(_ROUND_PRIORITY) ^ set(head)}"
        )


#: the external driver checks only this many queries per round
DRIVER_CAP = 50

#: Round-3 window (the driver checks the first DRIVER_CAP registered
#: queries — this list IS that window, asserted in _build):
#: - the 37 queries with no driver CORRECTNESS row in rounds 1-2
#:   (windows/streaming singles, graph, sketches, skew, dq, cdc,
#:   analytics, asof-next, tpch q20-q22, multimodal tail — incl. the
#:   two NEW real-decode queries), in prior registration order;
#: - approx_distinct_counts / approx_percentile_order_prices, whose
#:   banded oracles landed after their round-1 no_oracle rows;
#: - ann_lsh_topk / ann_ivf_topk, upgraded this round from rows-only
#:   to banded (exact top-k + invariant flags);
#: - re-checks of every query whose implementation changed this round
#:   (quantize/guard fixes, two-phase rank, lazy pair chunking);
#: - six cross-module sanity re-checks to round out the cap.
_ROUND_PRIORITY = [
    # -- never driver-checked (37) --
    "multimodal_resize",
    "multimodal_frame_energy",
    "multimodal_wav_decode",
    "multimodal_bmp_decode",
    "events_tumbling_counts",
    "events_trending_types",
    "events_resampled_gapfill",
    "events_sliding_counts",
    "events_session_stats",
    "events_first_per_user_type",
    "events_user_totals",
    "events_enriched_by_segment",
    "graph_nation_pagerank",
    "events_hll_user_rollup",
    "events_asof_next_purchase",
    "events_salted_type_stats",
    "dq_audit_orders",
    "dq_profile_documents",
    "cdc_orders_rollforward",
    "cdc_user_value_scd2",
    "cdc_orders_snapshot_diff",
    "customer_pseudonymize",
    "customer_rfm_segments",
    "events_interarrival_stats",
    "orders_cohort_ltv",
    "events_transition_matrix",
    "events_value_anomalies",
    "events_rolling_user_stats",
    "events_retention_cohorts",
    "orders_market_basket",
    "customer_spend_deciles",
    "order_price_histogram",
    "text_pii_redaction",
    "events_ohlc_bars",
    "q20_excess_shippers",
    "q21_suppliers_kept_waiting",
    "q22_idle_customer_balances",
    # -- banded oracles the driver has not seen yet (6) --
    "approx_distinct_counts",
    "approx_percentile_order_prices",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_lsh_validate",
    "dedup_minhash_lsh_validate",
    # -- changed this round: re-attest (6) --
    "embedding_label_outliers",
    "training_weighted_sample",
    "training_weighted_sample_per_lang",
    "dedup_embedding",
    "dedup_exact",
    "dedup_incremental",
    # -- new this round (1) --
    "training_domain_quota",
]
# Queries ADDED after this window was frozen (the round-3 session's
# 14 new operators: repeated-ngram/containment/canonical dedup,
# boilerplate strip, BPE train+encode, int8 quantize + screened top-k,
# epoch shard, shard manifest, quantile sketch, skew report, EWMA,
# audio decimation) register after position 50 on purpose: displacing
# re-attests of changed implementations would leave stale green rows.
# All pass the full rehearsal (tools/rehearse.py) and are first in
# line for the round-4 window.


def _promote(names: list[str]) -> None:
    """Reorder QUERIES so `names` come first (their relative order
    preserved), everything else keeping registration order."""
    missing = [n for n in names if n not in QUERIES]
    if missing:
        raise ValueError(f"priority names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in names}
    for k, v in QUERIES.items():
        if k not in ordered:
            ordered[k] = v
    QUERIES.clear()
    QUERIES.update(ordered)


_build()
