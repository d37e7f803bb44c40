"""Named-query registry — the engine's job-submission surface.

Generalizes the reference's ``map_reduce_task_num`` CLI dispatch
(reference main.cpp:74, main.cpp:84-95): a task number picking one of
three hardcoded map UDFs becomes a string-keyed registry of query
callables, each ``(spark, sf_dir) -> DataFrame``. ``ORACLE`` holds the
DuckDB-equivalent SQL per query for the correctness gate; queries
whose semantics SQL can't express (LSH buckets, streaming state) have
no oracle entry and get rows-only checks.

Construction contract (ADVICE r7): MOST entries are lazy — calling
``QUERIES[name](spark, sf_dir)`` only builds a plan — but the
``*_validate`` twins (and any query documented as cache-lifecycle-
managed) EAGERLY materialize their heavy shared stages via
localCheckpoint at construction time, freezing a data snapshot into
the returned frame. Tooling that constructs-without-executing (plan
audits, explain diffs, schema inspection) pays those jobs on
construction and re-pays them per re-construction; plans/audit.py
documents the same caveat on the audit side.
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
    if len(_ROUND_PRIORITY) != DRIVER_CAP:
        # a short list silently hands the spare driver slots to
        # whatever happens to follow in registration order; a long one
        # silently drops its own tail past the cap
        raise AssertionError(
            f"window is {len(_ROUND_PRIORITY)} entries, cap {DRIVER_CAP}"
        )
    head = list(QUERIES)[: len(_ROUND_PRIORITY)]
    if head != _ROUND_PRIORITY:
        raise AssertionError(
            f"driver window mismatch: {set(_ROUND_PRIORITY) ^ set(head)}"
        )


#: the external driver checks only this many queries per round
DRIVER_CAP = 50

#: Round-8 window (the driver checks the first DRIVER_CAP registered
#: queries — this list IS that window, asserted in _build). Keeps the
#: ≤3-round freshness invariant: the 37 queries whose newest green
#: driver row is round 4 (MapReduce parity, the TPC-H q1/q3 block,
#: BM25/DSIR/BPE, the substring family, PQ/k-means/int8 artifacts)
#: ALL rotate in alongside the round's new and changed queries, so
#: after round 8 no query's newest green row predates round 5.
#: - late additions, first as promised by the r7 window note (2):
#:   dedup_incremental_embedding + its validate twin.
#: - NEW this round (4): embedding_bucket_index (the stored LSH index
#:   artifact, full sign-hyperplane oracle), ann_ivf_centroids (the
#:   IVF quantizer artifact, full quantized-Lloyd training mirror),
#:   ann_ivf_assign_batch (incremental cell assignment against the
#:   stored quantizer), ann_ivf_cells (the inverted FILE — the celled
#:   corpus ann_ivf's probe join scans).
#: - re-attest of changed code (1): ann_ivf_topk — ivf_centroids
#:   switched to the md5-sampled quantized training and _cell_expr to
#:   the quantized argmax, so its plan and cell geometry changed.
#: - rotation (37): the entire round-4 tier.
#: - fillers (6): round-5 tier, changed-code adjacency + spread —
#:   ann_pq_topk (similarity family, same file as the IVF rework),
#:   dedup_ngram_jaccard + dedup_canonical_corpus +
#:   pipeline_canonical_containment (the three heaviest dedup plans),
#:   customer_name_fuzzy_pairs (watch-list: sf0.1 oracle near the
#:   budget floor), window_topk_suppliers. (q2_min_cost_supplier was
#:   the seventh filler until the late-added ann_ivf_cells claimed
#:   its slot — new queries outrank discretionary fillers; q2's
#:   newest green row is round 5, inside the freshness invariant.)
_ROUND_PRIORITY = [
    # -- r7 late additions: attest first (2) --
    "dedup_incremental_embedding",
    "dedup_incremental_embedding_validate",
    # -- new this round (4) --
    "embedding_bucket_index",
    "ann_ivf_centroids",
    "ann_ivf_assign_batch",
    "ann_ivf_cells",
    # -- changed this round: re-attest (1) --
    "ann_ivf_topk",
    # -- rotation: newest green row is round 4 (37) --
    "map1_charclass",
    "map2_letterfreq",
    "map3_synthetic",
    "wordcount",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "text_bm25_topk",
    "training_dsir_resample",
    "training_quality_logreg",
    "training_epoch_shard",
    "training_shard_manifest",
    "training_split_cluster_safe",
    "text_boilerplate_strip",
    "text_bpe_encode",
    "text_bpe_fertility_by_lang",
    "text_bpe_train_merges",
    "text_unigram_entropy",
    "dedup_embedding",
    "dedup_embedding_auto",
    "dedup_semantic",
    "dedup_repeated_ngrams",
    "dedup_substring_spans",
    "dedup_substring_stats",
    "dedup_substring_strip",
    "ann_int8_topk",
    "embedding_covariance",
    "embedding_hard_negatives",
    "embedding_int8_quantize",
    "embedding_kmeans",
    "embedding_pq_codes",
    "events_quantile_sketch",
    "events_seasonal_profile",
    "events_user_value_ewma",
    "dq_skew_report_events",
    "multimodal_audio_decimate",
    "multimodal_pixel_histogram",
    "parts_abc_revenue",
    # -- fillers: round-5 tier, adjacency + spread (6) --
    "ann_pq_topk",
    "dedup_ngram_jaccard",
    "dedup_canonical_corpus",
    "pipeline_canonical_containment",
    "customer_name_fuzzy_pairs",
    "window_topk_suppliers",
]
# With this window every registered query's newest green driver row
# will be round 5+ (r5:39 / r6:45 / r7:50 / r8:50 less overlaps —
# recompute from CORRECTNESS_r01..r08 as always); the rows-only LSH
# paths stay green-by-twin per their contract. The ten r8 late
# additions (ann_lsh_bucket_table, dedup_bloom_filter_table,
# dedup_incremental_bloom, text_cms_sketch, text_cms_heavy_hitters,
# dedup_novelty_score, ann_mmr_topk, dedup_incremental_screened,
# dedup_novelty_bloom, dedup_incremental_substring — all registered
# after the window froze) follow
# the established late-addition handling: builder-attested this round
# (hash-green vs their DuckDB oracles at sf0.001/0.01/0.1 via
# tools/rehearse.py + the oracle harness), FIRST IN LINE for the
# round-9 window.


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
