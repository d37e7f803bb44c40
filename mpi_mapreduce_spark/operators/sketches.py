"""Mergeable sketch rollups: HyperLogLog distinct-count tables.

The reference's only aggregate is an exact int sum (reference
tasks.c:149-161). At 100 TB, COUNT(DISTINCT) is the aggregate that
stops scaling — it shuffles every distinct value. The production
pattern is a *sketch table*: pre-aggregate each partition/day into a
fixed-size HLL sketch (Spark's Apache DataSketches binding,
`hll_sketch_agg`), store sketches as binary columns, and answer any
coarser rollup by `hll_union_agg` over the stored sketches — register-
wise max, commutative and associative, so re-aggregation never touches
the raw data again. A day's sketch is ~KBs regardless of row count;
the weekly/all-time rollup reads sketches, not events.

Sketch binaries and estimates are engine-specific, so the registered
query emits the exact distinct count (independently computed) plus a
boolean asserting the sketch estimate lands within the documented
error band — hash-comparable against a DuckDB oracle expecting TRUE.
Accuracy and the merge-equals-direct identity are additionally pinned
in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table

LG_K = 12  #: 4096 registers — ±1.6% relative standard error


def daily_user_sketches(events: DataFrame) -> DataFrame:
    """The stored sketch table: one HLL per (day, event_type)."""
    return events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sk"),
        F.count("*").alias("n_events"),
    )


def hll_user_rollup_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch-table rollup (daily HLLs → union → estimate) —
    unregistered helper; pytest pins estimate error and the
    merge-equals-direct identity."""
    daily = daily_user_sketches(load_table(spark, sf_dir, "events"))
    return daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )


def events_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type, computed the sketch-table way:
    daily sketches first, then a union rollup — the plan a 100 TB
    deployment runs nightly (sketch build) and at query time (union
    over ~365 tiny sketches instead of a year of raw events).

    Driver-compared output: exact distincts + n_days/n_events (all
    SQL-oracle-able) and a flag asserting the union-rollup estimate
    sits within 3× the lgK=12 rse (±1.6%) of exact — TRUE in the
    oracle."""
    ev = load_table(spark, sf_dir, "events")
    daily = daily_user_sketches(ev)
    rollup = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    return rollup.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "n_events",
        "n_users",
        (
            F.abs(F.col("est") - F.col("n_users")) <= 0.05 * F.col("n_users")
        ).alias("est_within_rse"),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (fixed-bin histogram table)
# ---------------------------------------------------------------------------

QSK_BIN_W = 10.0  #: bin width → guaranteed quantile error ≤ one bin
QSK_QS = (50, 90, 99)  #: reported percentiles


def daily_value_histograms(events: DataFrame) -> DataFrame:
    """The stored quantile-sketch table: one fixed-bin histogram row
    per (day, bin) over ``value``. Mergeable by integer ADDITION
    (coarser rollups sum counts per bin — commutative/associative like
    the HLL union), with a hard error bound: any quantile read off the
    merged histogram is within one bin width of exact."""
    return events.select(
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") / F.lit(QSK_BIN_W)).cast("long").alias("bin"),
    ).groupBy("day", "bin").agg(F.count("*").alias("cnt"))


def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles of ``value`` answered the sketch-table way: daily
    histograms → summed bins → bin-upper-edge estimates, plus the
    exact order statistic and the pinned one-bin error band.

    Per percentile q: target rank = ceil(q·n/100); the estimate is
    the upper edge of the first bin whose cumulative count reaches the
    target, and the exact value is the target-th smallest element.
    The exact side is computed TWO-PHASE (the repo's exact-rank
    pattern): the merged histogram locates the bin holding the target
    rank, only THAT bin's rows are ranked (a partition-bounded sort of
    n/bins rows), never the whole table. The cumulative window runs
    over the ~60 merged bin rows — bounded by value-range/width, not
    by data size. ``within_band`` (0 < est − exact ≤ W) is TRUE by
    the floor/cumulative construction; the oracle recomputes both
    sides exactly, so this query carries a FULL oracle — the sketch
    estimate itself is deterministic, unlike the HLL binary."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") / F.lit(QSK_BIN_W)).cast("long").alias("bin"),
        "value",
    )
    sketch = ev.groupBy("day", "bin").agg(F.count("*").alias("cnt"))
    merged = sketch.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    from pyspark.sql.window import Window as W

    wcum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = merged.withColumn("cum", F.sum("cnt").over(wcum))
    tot = merged.agg(F.sum("cnt").alias("n"))
    qs = spark.createDataFrame([(q,) for q in QSK_QS], "q int")
    tgt = qs.crossJoin(F.broadcast(tot)).select(
        "q",
        F.ceil((F.col("q") * F.col("n")).cast("double") / F.lit(100.0))
        .cast("long")
        .alias("target"),
    )
    binq = (
        tgt.join(F.broadcast(cum), F.col("cum") >= F.col("target"))
        .groupBy("q", "target")
        .agg(F.min("bin").alias("bin_q"))
    )
    cum_before = cum.select(
        F.col("bin").alias("bin_q"),
        (F.col("cum") - F.col("cnt")).alias("cum_before"),
    )
    b2 = binq.join(cum_before, "bin_q")
    ev_b = ev.join(F.broadcast(b2), ev.bin == b2.bin_q).select(
        "q", "target", "bin_q", "cum_before", "value"
    )
    wv = W.partitionBy("q").orderBy("value")
    exact = (
        ev_b.withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == F.col("target") - F.col("cum_before"))
        .select("q", "bin_q", F.col("value").alias("exact_raw"))
    )
    est_raw = (F.col("bin_q") + 1) * F.lit(QSK_BIN_W)
    from mpi_mapreduce_spark.functions import exact as ex

    return exact.select(
        "q",
        ex.quantize(est_raw, 6).alias("est"),
        ex.quantize(F.col("exact_raw"), 6).alias("exact_q"),
        (
            (est_raw - F.col("exact_raw") > 0)
            & (est_raw - F.col("exact_raw") <= F.lit(QSK_BIN_W) + F.lit(1e-9))
        ).alias("within_band"),
    )


ORACLE_QUANTILE_SKETCH = f"""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR(value / {QSK_BIN_W}) AS BIGINT) AS bin, value
      FROM events
    ), sk AS (
      SELECT day, bin, COUNT(*) AS cnt FROM ev GROUP BY day, bin
    ), merged AS (
      SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt FROM sk GROUP BY bin
    ), cum AS (
      SELECT bin, cnt, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum
      FROM merged
    ), tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM merged
    ), qs AS (
      SELECT unnest([{", ".join(str(q) for q in QSK_QS)}]) AS q
    ), tgt AS (
      SELECT CAST(q AS INTEGER) AS q,
             CAST(CEIL(CAST(q * n AS DOUBLE) / 100.0) AS BIGINT) AS target
      FROM qs, tot
    ), binq AS (
      SELECT q, target, MIN(bin) AS bin_q
      FROM tgt JOIN cum ON cum.cum >= tgt.target
      GROUP BY q, target
    ), ranked AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rn FROM ev
    )
    SELECT b.q,
           ROUND(((b.bin_q + 1) * {QSK_BIN_W}) * 1000000.0) / 1000000.0
             AS est,
           ROUND(r.value * 1000000.0) / 1000000.0 AS exact_q,
           (b.bin_q + 1) * {QSK_BIN_W} - r.value > 0
             AND (b.bin_q + 1) * {QSK_BIN_W} - r.value <= {QSK_BIN_W} + 1e-9
             AS within_band
    FROM binq b JOIN ranked r ON r.rn = b.target
"""


# ---------------------------------------------------------------------------
# Count-min sketch (mergeable frequency table) — round-8 late addition
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  #: d rows — failure prob per lookup ≤ e^-d ≈ 1.8%
CMS_WIDTH = 1024  #: w columns — expected overcount ≤ e·N/w per row
CMS_TOPK = 20  #: heavy-hitter rows the registered query reports


def _cms_bucket(term, j: int, width: int = CMS_WIDTH):
    """Row-j column of ``term`` — the cross-engine md5 convention
    (similarity.py's md5-ordered sample, dedup.py's Bloom positions):
    row index j is prefixed into the key so the d rows are independent
    hash functions, then the leading 60 bits of the md5 mod w."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), term)), 1, 15), 16, 10
        ).cast("long")
        % width
    )


def cms_build(
    toks: DataFrame,
    col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the count-min TABLE ``(j, c, cnt)`` over a token column —
    the stored artifact (Cormode & Muthukrishnan 2005). Each token contributes one count to one cell
    per row; the groupBy's partial aggregation collapses every map
    partition to ≤ d·w rows (4096 here) before the shuffle, so the
    shuffle volume is bounded by (partitions × d·w) regardless of
    token count — the same bound as the HLL and histogram sketch
    tables. Counts are plain sums, so per-shard sketches merge by
    ADDITION (pytest-pinned), and the estimate for any term is
    min_j cnt[j, h_j(term)] — never an undercount."""
    probes = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(F.col(col), j, width).alias("c"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p")
    )
    return probes.groupBy(
        F.col("p.j").alias("j"), F.col("p.c").alias("c")
    ).agg(F.count("*").alias("cnt"))


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Sum-merge a union of per-shard CMS tables: the mergeable-sketch
    identity (HLL union / histogram sum / Bloom bit_or analog for
    frequencies). merge(build(A) ∪ build(B)) ≡ build(A ∪ B)."""
    return sketches.groupBy("j", "c").agg(F.sum("cnt").alias("cnt"))


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mpi_mapreduce_spark.functions.text import tokens

    return load_table(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("term")
    )


def text_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered ARTIFACT query: the d×w count-min table over the
    document tokens — the fixed-size frequency summary a 100 TB
    deployment stores per shard/day and sum-merges for any coarser
    scope, instead of re-shuffling a billion-type vocabulary. Fully
    hash-attested: the row-prefixed md5 bucketing is mirrored
    literally in DuckDB."""
    return cms_build(_doc_tokens(spark, sf_dir))


def text_cms_heavy_hitters(
    spark: SparkSession, sf_dir: str, cms: DataFrame | None = None
) -> DataFrame:
    """Registered read-side query: the exact top-CMS_TOPK terms (by
    true count, term as the deterministic tiebreak) with their CMS
    estimates — the sketch's accuracy contract attested in the
    hash-compared output itself: ``est_cnt`` (min over the d probed
    cells) alongside ``exact_cnt``, plus ``is_overestimate``
    (est ≥ exact, TRUE by construction — the min-of-overcounts can
    never undercount). The exact side exists at this scale to attest
    the sketch; a 100 TB serving path reads ONLY the stored table:
    d lookups per term, no scan."""
    toks = _doc_tokens(spark, sf_dir)
    from pyspark.sql.window import Window as W

    exact = toks.groupBy("term").agg(F.count("*").alias("exact_cnt"))
    topk = (
        exact.withColumn(
            "rk",
            F.row_number().over(
                W.orderBy(F.col("exact_cnt").desc(), F.col("term"))
            ),
        )
        .where(F.col("rk") <= CMS_TOPK)
        .drop("rk")
    )
    # stored-serving contract (same as the ANN-LSH / IVF / Bloom
    # stored paths): pass the persisted text_cms_sketch artifact (or
    # the summed nightly/streaming view) and the read side never
    # rebuilds the table — stored-vs-recomputed equality pytest-pinned
    sketch = cms_build(toks) if cms is None else cms
    probes = topk.select(
        "term",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(F.col("term"), j).alias("c"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("term", "exact_cnt", F.col("p.j").alias("j"), F.col("p.c").alias("c"))
    return (
        probes.join(F.broadcast(sketch), ["j", "c"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .withColumn(
            "is_overestimate", F.col("est_cnt") >= F.col("exact_cnt")
        )
    )


_CMS_CTE = f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS term
      FROM documents
    ), probes AS (
      SELECT CAST(j AS INTEGER) AS j,
             ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || term), 1, 15))
               ::BIGINT % {CMS_WIDTH} AS c
      FROM toks CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS j)
    ), cms AS (
      SELECT j, c, COUNT(*) AS cnt FROM probes GROUP BY j, c
    )
"""

ORACLE_CMS_SKETCH = _CMS_CTE + """
    SELECT j, c, cnt FROM cms
"""

ORACLE_CMS_HEAVY_HITTERS = _CMS_CTE + f"""
    , exact AS (
      SELECT term, COUNT(*) AS exact_cnt FROM toks GROUP BY term
    ), topk AS (
      SELECT term, exact_cnt
      FROM (SELECT term, exact_cnt,
                   ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, term) AS rk
            FROM exact)
      WHERE rk <= {CMS_TOPK}
    ), tprobes AS (
      SELECT term, exact_cnt, CAST(j AS INTEGER) AS j,
             ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || term), 1, 15))
               ::BIGINT % {CMS_WIDTH} AS c
      FROM topk CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS j)
    )
    SELECT p.term, p.exact_cnt, MIN(s.cnt) AS est_cnt,
           MIN(s.cnt) >= p.exact_cnt AS is_overestimate
    FROM tprobes p JOIN cms s ON p.j = s.j AND p.c = s.c
    GROUP BY p.term, p.exact_cnt
"""


def nightly_cms_update(
    spark: SparkSession, src_dir: str, ledger_dir: str, table_dir: str
):
    """The CMS leg of the nightly maintenance family (text signatures,
    embedding buckets, IVF cells, Bloom filter, and this frequency
    table — one callable per maintained index): the ingest LEDGER
    picks up tonight's new document files, the batch's partial d×w
    cell counts are appended under ``batch=<bkey>``, and the ledger
    commits LAST (sources/io.py protocol). Crash-replay safety is the
    keyed overwrite: a replayed night rewrites its own partition
    rather than double-appending, so the summed read (cms_merge over
    all partitions) stays exact. Returns (tonight's partial sketch —
    or None when nothing is new, list of ingested files)."""
    from mpi_mapreduce_spark.operators.dedup import _batch_key
    from mpi_mapreduce_spark.sources.io import (
        ingest_incremental,
        reconcile_batch_partitions,
        record_ingested,
    )

    batch, files = ingest_incremental(spark, src_dir, ledger_dir)
    if batch is None:
        return None, []
    bkey = _batch_key(files)
    reconcile_batch_partitions(spark, ledger_dir, [table_dir], {bkey})
    partial = _nightly_cms_core(spark, batch, bkey, table_dir)
    record_ingested(spark, ledger_dir, files, batch_key=bkey)
    return partial, files


def _nightly_cms_core(spark, batch, bkey: str, table_dir: str):
    """The ledger-free body of :func:`nightly_cms_update` — append
    tonight's partial d×w cell counts under ``batch=<bkey>``."""
    import os

    from pyspark.sql import functions as F

    from mpi_mapreduce_spark.functions.text import tokens

    partial = cms_build(
        batch.select(F.explode(tokens(F.col("text"))).alias("term"))
    ).localCheckpoint()
    partial.write.mode("overwrite").parquet(
        os.path.join(table_dir, f"batch={bkey}")
    )
    return partial


def read_nightly_cms(spark: SparkSession, table_dir: str) -> DataFrame:
    """Serving view of the nightly partials: sum per (j, c)."""
    return cms_merge(
        spark.read.parquet(table_dir).select("j", "c", "cnt")
    )


QUERIES = {
    "events_hll_user_rollup": events_hll_user_rollup,
    "events_quantile_sketch": events_quantile_sketch,
    "text_cms_sketch": text_cms_sketch,
    "text_cms_heavy_hitters": text_cms_heavy_hitters,
}

ORACLE: dict[str, str] = {
    "text_cms_sketch": ORACLE_CMS_SKETCH,
    "text_cms_heavy_hitters": ORACLE_CMS_HEAVY_HITTERS,
    "events_quantile_sketch": ORACLE_QUANTILE_SKETCH,
    "events_hll_user_rollup": """
        SELECT event_type,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               TRUE AS est_within_rse
        FROM events
        GROUP BY event_type
    """,
}
