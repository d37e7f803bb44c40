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
        retrieval,
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
        retrieval,
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

#: Round-6 window (the driver checks the first DRIVER_CAP registered
#: queries — this list IS that window, asserted in _build). This is
#: the staleness-zeroing round: the 40 queries whose newest green
#: driver row predates round 3 ALL fit in one window alongside the
#: round's re-attests, so after this round every one of the 178
#: registered queries is driver-attested within the last three rounds
#: — the first time the whole registry is that fresh.
#: - re-attests of the 6 queries whose implementation changed this
#:   round: the minhash validate frame now builds ONE persisted
#:   shingle index and threads it through minhash_jaccard_pairs'
#:   new srows= parameter (touches dedup_minhash_lsh +
#:   pipeline_canonical_minhash, rows-only by the LSH contract, and
#:   both hash-attested validate twins); ann_lsh gained the
#:   probe_bits multiprobe-width knob (registered default 1-bit —
#:   identical probe set, re-attested on principle); the PQ re-rank
#:   shortlist default moved 50 → 100 per the round-6 sweep (recall
#:   0.955 → 0.984 at no measurable wall cost — SCALING.md), changing
#:   ann_pq_rerank_topk's result set and its CTE-mirror oracle;
#: - rotation (40): array_functions_showcase (the round-5 rotation's
#:   one deferral, still r1-latest) plus all 39 queries whose newest
#:   green row is round 2 — the events_* analytics/streaming twins,
#:   the text_* family, the training samplers, knn_bruteforce,
#:   embedding_label_centroids, multimodal features/frame-sample, and
#:   the dedup r2 stragglers;
#: - fillers (4): oldest remaining tier (round 3), picked for family
#:   spread — exact dedup, iterative graph, CDC, sketch rollup —
#:   starting the next freshness cycle early.
_ROUND_PRIORITY = [
    # -- changed this round: re-attest (6) --
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_validate",
    "pipeline_canonical_minhash",
    "pipeline_canonical_minhash_validate",
    "ann_lsh_topk",
    "ann_pq_rerank_topk",
    # -- rotation: newest green row is round 1 (1) --
    "array_functions_showcase",
    # -- rotation: newest green row is round 2 (39) --
    "dedup_exact_stats",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "dedup_incremental_minhash",
    "knn_bruteforce",
    "embedding_label_centroids",
    "text_token_stats",
    "text_heavy_hitters",
    "text_tfidf_top_terms",
    "text_bigram_counts",
    "text_bpe_token_stats",
    "text_repetition_score",
    "text_lang_id",
    "text_lang_confusion",
    "text_quality_score",
    "text_fingerprint",
    "text_bigram_lm_score",
    "text_distribution_drift",
    "training_mixture_resample",
    "training_chunk_documents",
    "training_winsorize_values",
    "training_split_assign",
    "training_sample_documents",
    "training_sample_stratified",
    "training_outlier_iqr",
    "pipeline_curate_corpus",
    "training_pack_sequences",
    "training_contamination_check",
    "training_take_k_per_lang",
    "multimodal_features",
    "multimodal_frame_sample",
    "events_click_purchase_join",
    "events_click_attribution",
    "events_asof_purchase_click",
    "events_incident_correlation",
    "events_sessionize",
    "events_funnel_conversion",
    "events_user_value_trend",
    "events_user_value_corr",
    # -- fillers: oldest remaining tier (round 3), family spread (4) --
    "dedup_exact",
    "graph_nation_pagerank",
    "cdc_orders_rollforward",
    "events_hll_user_rollup",
]
# With this window every registered query's newest green driver row
# will be round 4+ except the 42 remaining round-3 rows (first in line
# for round 7); the rows-only LSH paths stay green-by-twin per their
# contract.


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
