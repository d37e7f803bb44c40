"""Analytic breadth: range-frame windows, distribution ranking,
histogram binning, and PII redaction.

The reference has no windows or scalar-function surface beyond strlen/
case-fold/modulo (SURVEY.md §2.5, §2.8); these operators round out the
engine's analytic coverage with plan shapes not yet exercised
elsewhere: a RANGE frame over event time (vs the ROWS frames in
relational.py), ntile/percent_rank/cume_dist ranking, exact
integer-arithmetic binning, and regexp-based text masking (the
training-pipeline scrub step — all JVM-side `regexp_*`, no UDF).

Determinism notes: rolling sums quantize per-row and sum as longs
(functions/exact.py); the RANGE frame is keyed on epoch *seconds* (a
long — immune to the ns-vs-µs timestamp precision gap) and is
peer-inclusive, so ties contribute the same frame in any engine.
ntile needs a total order: ties on the ranking value are broken by the
unique key. Regex patterns stick to the syntax subset Java regex and
RE2 share (character classes, \\b, {m,n} quantifiers).

Scale notes (100 TB): each window query is one shuffle on its
partition keys with streaming frame evaluation; the histogram is a
pure map-side integer bucket then a tiny-key aggregate; redaction is
embarrassingly parallel row arithmetic in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.functions import exact as ex


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: bucket fan-out for the two-phase global rank (matches the session's
#: shuffle parallelism; any value works — it only shapes balance)
RANK_BUCKETS = 32


def two_phase_rank(
    df: DataFrame,
    ord_col: str,
    key_col: str,
    out: str = "_r",
    n_col: str = "_n",
    buckets: int = RANK_BUCKETS,
) -> DataFrame:
    """Exact global row_number over ``(ord_col ASC, key_col ASC)``
    WITHOUT an unpartitioned window — the scale-safe form of global
    distribution ranking (ntile / percent_rank / cume_dist are all
    pure functions of this rank and the total count, computed by the
    callers with integer arithmetic).

    Two phases, one declarative DAG (no driver collect):

    1. A 1-row aggregate computes ``buckets-1`` approx-percentile
       boundaries of ``ord_col`` plus the exact total count; it is
       broadcast-cross-joined back, and each row gets a map-side
       bucket id = #boundaries strictly below its value. Ties share a
       bucket by construction, and bucketing is order-monotone, so
       boundary quality affects only balance — never the final rank
       (approx_percentile's merge-order wobble is harmless here).
    2. ``row_number`` per bucket (a PARTITIONED window — each bucket
       sorts in parallel), plus a per-bucket count aggregate whose
       cumulative offsets come from a tiny triangular self-join
       (≤ buckets² pairs) broadcast back on the bucket id. Global
       rank = bucket offset + local row_number.

    Adds ``out`` (the 1-based global rank, long) and ``n_col`` (the
    total count, long, same on every row). At 100 TB: the only
    full-data exchange is the bucketed window shuffle — same volume a
    partitioned sort needs anyway, with no single-partition straggler;
    everything else is a map-side broadcast or a ≤``buckets``-row
    frame."""
    tmp_bs, tmp_bkt, tmp_lr, tmp_off = "_bs", "_bkt", "_lr", "_off"
    df = df.drop(out, n_col, tmp_bs, tmp_bkt, tmp_lr, tmp_off)
    percs = [i / buckets for i in range(1, buckets)]
    stats = df.agg(
        F.percentile_approx(ord_col, percs, 10000).alias(tmp_bs),
        F.count("*").cast("long").alias(n_col),
    )
    b = df.crossJoin(F.broadcast(stats)).withColumn(
        tmp_bkt,
        F.size(F.filter(tmp_bs, lambda x: x < F.col(ord_col))).cast("int"),
    )
    w = W.partitionBy(tmp_bkt).orderBy(ord_col, key_col)
    loc = b.withColumn(tmp_lr, F.row_number().over(w).cast("long"))
    counts = b.groupBy(tmp_bkt).agg(F.count("*").alias("_c"))
    lo = counts.select(
        F.col(tmp_bkt).alias("_lo_bkt"), F.col("_c").alias("_lo_c")
    )
    offs = (
        counts.join(lo, F.col("_lo_bkt") < F.col(tmp_bkt), "left")
        .groupBy(tmp_bkt)
        .agg(F.coalesce(F.sum("_lo_c"), F.lit(0)).cast("long").alias(tmp_off))
    )
    return (
        loc.join(F.broadcast(offs), tmp_bkt)
        .withColumn(out, F.col(tmp_off) + F.col(tmp_lr))
        .drop(tmp_bs, tmp_bkt, tmp_lr, tmp_off, "_c")
    )


def _sql_ntile(r: str, n: str, k: int) -> str:
    """NTILE(k) as integer arithmetic on a unique 1-based global rank
    column ``r`` and total-count column ``n``: the first n%k buckets
    take ceil(n/k) rows, the rest floor(n/k) — exactly the SQL NTILE
    contract, reproduced with DIV/% so both engines agree bit-for-bit
    (no window needed once the rank exists)."""
    q = f"({n} DIV {k})"
    rem = f"({n} % {k})"
    hi = f"({rem} * ({q} + 1))"
    return (
        f"CASE WHEN {n} < {k} THEN {r} "
        f"WHEN {r} <= {hi} THEN ({r} + {q}) DIV ({q} + 1) "
        f"ELSE {rem} + ({r} - {hi} + {q} - 1) DIV {q} END"
    )


def events_rolling_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour per-user stats via a RANGE frame (peer-inclusive,
    ordered on epoch seconds): every event sees the exact count/sum of
    its user's trailing hour. One shuffle on user_id; the frame
    evaluates streaming within each partition."""
    ev = _t(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts").alias("epoch_s")
    cents = F.round(F.col("value") * 100).cast("long")
    base = ev.select("event_id", "user_id", epoch_s, cents.alias("cents"))
    w = (
        W.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, W.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("roll_n"),
        (F.sum("cents").over(w).cast("double") / 100.0).alias("roll_sum"),
    )


def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranking over per-customer spend: ntile deciles,
    percent_rank and cume_dist from ONE exact global rank. The order
    key carries a unique custkey tiebreak — without it ntile bucket
    boundaries split ties engine-arbitrarily.

    Scale: uses :func:`two_phase_rank` (broadcast approx-percentile
    boundaries + map-side bucket assignment + partitioned per-bucket
    row_number), so there is no unpartitioned window / single-
    partition global sort anywhere in the plan; ntile, percent_rank
    and cume_dist are then pure integer/single-division arithmetic on
    (rank, n) — bit-identical to the oracle's window functions because
    the order is total."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        ex.quantized_sum("o_totalprice", 2).alias("spend")
    )
    ranked = two_phase_rank(spend, "spend", "o_custkey")
    return ranked.select(
        F.col("o_custkey").alias("custkey"),
        "spend",
        F.expr(_sql_ntile("_r", "_n", 10)).cast("long").alias("decile"),
        F.expr(
            "CASE WHEN _n = 1 THEN 0.0"
            " ELSE CAST(_r - 1 AS DOUBLE) / (_n - 1) END"
        ).alias("pct_rank"),
        F.expr("CAST(_r AS DOUBLE) / _n").alias("cume"),
    )


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals in pure integer
    arithmetic: cents // bin_width_cents — no float rounding at bucket
    boundaries in either engine. Map-side bucketing, then an aggregate
    over a handful of bins."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.select(cents.alias("c"))
        .select(F.expr("c div 5000000").alias("bin"), "c")
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_orders"),
            (F.min("c").cast("double") / 100.0).alias("min_price"),
            (F.max("c").cast("double") / 100.0).alias("max_price"),
        )
    )


#: pattern subset valid in both Java regex (Spark) and RE2 (DuckDB)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b[0-9]{3}[- ][0-9]{4}\b"
BLOCKLIST = r"\b(customer|value)\b"


def redact_text(col, mask: str = "[MASKED]"):
    """Column expression masking emails, phone-shaped numbers and
    blocklisted terms — composable into any pipeline stage."""
    out = F.regexp_replace(col, PII_EMAIL, mask)
    out = F.regexp_replace(out, PII_PHONE, mask)
    return F.regexp_replace(out, BLOCKLIST, mask)


def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub step of a training-data pipeline: mask PII-shaped spans
    and blocklisted terms, report per-document hit counts and the
    masked length. All regexp_* expressions — whole-stage codegen, no
    Python in the row path."""
    docs = _t(spark, sf_dir, "documents")
    masked = redact_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE)).cast("long").alias("n_phone"),
        F.regexp_count(F.col("text"), F.lit(BLOCKLIST)).cast("long").alias("n_blocked"),
        F.length(masked).cast("long").alias("masked_len"),
        F.substring(masked, 1, 40).alias("masked_prefix"),
    )


#: session gap — a pause longer than this starts a new session (µs)
SESSION_GAP_US = 1_800_000_000


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-gap sessionization — the batch-side twin of
    `session_window`: a per-user event stream splits into sessions
    wherever the inter-event pause exceeds 30 minutes, then each
    session rolls up to (count, start, end, duration).

    The classic two-window plan: lag() marks boundaries, a running sum
    of boundary flags numbers the sessions, one groupBy rolls them up.
    All three steps share ONE hash partitioning on user_id — Spark
    plans a single Exchange, then two in-partition sorts and a partial
    agg. Time is integer epoch-µs end-to-end (no float, no timezone),
    and both windows order on (t_us, event_id) so simultaneous events
    land deterministically. At 100 TB state per task is one partition's
    users — no per-user materialization beyond the sort."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us")
    )
    w = W.partitionBy("user_id").orderBy("t_us", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            (F.col("t_us") - F.lag("t_us", 1).over(w) > SESSION_GAP_US)
            | F.lag("t_us", 1).over(w).isNull(),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_sess")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("t_us").alias("start_us"),
        F.max("t_us").alias("end_us"),
        (F.max("t_us") - F.min("t_us")).alias("duration_us"),
    )


#: cohort epoch — week indexes count from the corpus start date
COHORT_EPOCH = "2024-01-01"


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — the canonical product-analytics
    rollup: users are cohorted by their first active week, and each
    (cohort, weeks-since-cohort) cell counts how many came back.

    Week indexes are integer day-arithmetic from a fixed epoch (no
    date_trunc — Monday-vs-Sunday week conventions differ across
    engines; day offsets don't). Plan: one groupBy(user) for first
    weeks, an equi-join back on user_id (Catalyst reuses the
    aggregation's hash partitioning, so no second shuffle of the fact
    rows), then a distinct-count over the tiny (cohort, offset) key
    space. At 100 TB the only O(data) shuffle is the per-user min."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit(COHORT_EPOCH).cast("date"))
            / 7
        ).alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 co-purchased part pairs (frequent-itemset support
    counts) — association mining's first stage.

    The pair generator is a self-equi-join of the DISTINCT
    (order, part) rows on the order key: both sides hash-partition on
    l_orderkey, so pair expansion happens co-located, bounded by
    C(items_per_order, 2) — TPC-H-shaped orders hold ≤ ~13 lines, so
    ≤ 78 pairs/order regardless of corpus size. The a<b predicate
    halves the pairs and canonicalizes them; support counts get
    map-side combine; the top-100 is TakeOrderedAndProject with an
    (n DESC, pair ASC) boundary tiebreak in both engines."""
    items = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(100)
    )


ANOMALY_WIN = 20  #: trailing rows per window (current row inclusive)
ANOMALY_K = 3  #: flag beyond k rolling standard deviations


def events_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score outliers: events whose value sits more than
    ANOMALY_K standard deviations from the mean of the user's trailing
    ANOMALY_WIN events — the monitoring/alerting primitive, and a data
    cleaning pass (spike removal) for training pipelines.

    Determinism without floats: the z-test z² > k² rearranges to
    (n·x − s)² > k²·(n·ss − s²) where s=Σx, ss=Σx², all over cents-
    quantized int64s — no division, no sqrt, no doubles until the
    pass-through output column. Overflow bound: cents ≤ ~5e4, n=20 →
    each term ≤ ~4e12, far under 2^63. One shuffle on user_id; both
    rolling sums evaluate streaming in the same window frame."""
    ev = _t(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    base = ev.select("event_id", "user_id", "ts", "value", x.alias("x"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ANOMALY_WIN - 1), 0)
    )
    n = F.count("*").over(w)
    s = F.sum("x").over(w)
    ss = F.sum(F.col("x") * F.col("x")).over(w)
    dev = n * F.col("x") - s
    var_n = n * ss - s * s
    return (
        base.withColumn("n", n)
        .withColumn("dev2", dev * dev)
        .withColumn("varn", var_n)
        .where(
            (F.col("n") == ANOMALY_WIN)
            & (F.col("dev2") > ANOMALY_K * ANOMALY_K * F.col("varn"))
        )
        .select("event_id", "user_id", "value")
    )


def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resample bars: per (10-minute bucket, event_type) the
    opening / high / low / closing `value` plus count and exact sum —
    the hypertable downsampling shape every time-series dashboard
    reads instead of raw points.

    Open/close in ONE aggregation pass (no window sort): min/max over
    struct(ts, event_id, value) — struct comparison is lexicographic
    in both engines, event_id breaks equal-timestamp ties
    deterministically, and `.value` of the min/max struct IS the
    first/last value. At 100 TB this is a single shuffle on (bucket,
    type) with map-side partial min/max/sum — the same cost as any
    grouped agg; a windowed first/last would add a per-group sort.
    The oracle implements the same semantics independently via
    ROW_NUMBER windows."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_format(
        F.window("ts", "10 minutes").getField("start"),
        "yyyy-MM-dd HH:mm:ss",
    )
    o = F.struct("ts", "event_id", "value")
    return (
        ev.groupBy(bucket.alias("bucket_start"), "event_type")
        .agg(
            F.min(o).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(o).getField("value").alias("close"),
            F.count("*").alias("n"),
            ex.quantized_sum("value", 2).alias("sum_value"),
        )
    )


ORACLE_OHLC = f"""
    WITH e AS (
      SELECT strftime(time_bucket(INTERVAL '10 minutes', ts),
                      '%Y-%m-%d %H:%M:%S') AS bucket_start,
             event_type, ts, event_id, value
      FROM events
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY bucket_start, event_type
                                ORDER BY ts, event_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY bucket_start, event_type
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM e
    )
    SELECT bucket_start, event_type,
           MAX(CASE WHEN rf = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rl = 1 THEN value END) AS close,
           COUNT(*) AS n,
           {ex.sql_sum('value', 2)} AS sum_value
    FROM ranked
    GROUP BY bucket_start, event_type
"""


def parts_abc_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by lineitem revenue:
    class A = parts covering the first 80% of cumulative revenue,
    B = next 15%, C = the tail — the classic inventory-analytics
    screen, here as a GLOBAL cumulative distribution computed the
    scale-safe way.

    The global prefix sum uses the two_phase_rank bucket trick with a
    SUM instead of a row_number: approx-percentile boundaries bucket
    the rows map-side (order-monotone, tie-safe), each bucket
    prefix-sums its integer-cent revenue in a PARTITIONED window, and
    the ≤buckets²-pair triangular self-join supplies each bucket's
    revenue offset — no unpartitioned window anywhere. All revenue
    arithmetic is integer cents (exact, order-independent); the class
    boundaries compare cum·100 ≤ total·80/95 in int64 (headroom to
    ~10¹⁷ cents — ample at 100 TB, and the comparison never touches
    floats)."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    rev = (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(cents).alias("cents"))
        .withColumn("negc", -F.col("cents"))
    )
    percs = [i / RANK_BUCKETS for i in range(1, RANK_BUCKETS)]
    stats = rev.agg(
        F.percentile_approx("negc", percs, 10000).alias("_bs"),
        F.sum("cents").alias("_total"),
    )
    b = rev.crossJoin(F.broadcast(stats)).withColumn(
        "_bkt",
        F.size(F.filter("_bs", lambda x: x < F.col("negc"))).cast("int"),
    )
    w = (
        W.partitionBy("_bkt")
        .orderBy("negc", "partkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    loc = b.withColumn("_cum_loc", F.sum("cents").over(w))
    btot = b.groupBy("_bkt").agg(F.sum("cents").alias("_bc"))
    lo = btot.select(
        F.col("_bkt").alias("_lo_bkt"), F.col("_bc").alias("_lo_bc")
    )
    offs = (
        btot.join(lo, F.col("_lo_bkt") < F.col("_bkt"), "left")
        .groupBy("_bkt")
        .agg(F.coalesce(F.sum("_lo_bc"), F.lit(0)).cast("long").alias("_off"))
    )
    cum = F.col("_off") + F.col("_cum_loc")
    return (
        loc.join(F.broadcast(offs), "_bkt")
        .select(
            "partkey",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("revenue"),
            ex.quantize(cum.cast("double") / F.col("_total"), 6).alias(
                "cum_share"
            ),
            F.when(cum * 100 <= F.col("_total") * 80, "A")
            .when(cum * 100 <= F.col("_total") * 95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


ORACLE_ABC = """
    WITH rev AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100)
                      AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey
    ), tot AS (
      SELECT SUM(cents) AS t FROM rev
    ), c AS (
      SELECT partkey, cents,
             SUM(cents) OVER (ORDER BY -cents ASC, partkey ASC
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM rev
    )
    SELECT partkey,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           ROUND((CAST(cum AS DOUBLE) / t) * 1000000.0) / 1000000.0
             AS cum_share,
           CASE WHEN cum * 100 <= t * 80 THEN 'A'
                WHEN cum * 100 <= t * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c CROSS JOIN tot
"""


def events_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-seasonality profile: per (event_type, hour-of-day) the
    event count, exact mean value, and the ratio of that hour's mean
    to the type's overall mean — the day-shape baseline capacity
    planning and seasonal anomaly detection divide by.

    Two grouped aggregates (map-side combine; 24·|types| result rows)
    and a broadcast join of the per-type totals back onto the hourly
    frame. The hourly mean and the type mean are both
    order-independent quantized sums, and the ratio is one IEEE
    divide of those exact values, quantized — bit-identical to the
    oracle. Hours are session-UTC (the engine pins UTC so both
    engines bucket identically)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour")
    ).agg(
        F.count("*").alias("n_events"),
        ex.quantized_avg("value", 6).alias("avg_value"),
    )
    totals = ev.groupBy("event_type").agg(
        ex.quantized_avg("value", 6).alias("type_avg")
    )
    return hourly.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "hour",
        "n_events",
        "avg_value",
        "type_avg",
        ex.quantize(F.col("avg_value") / F.col("type_avg"), 6).alias(
            "ratio"
        ),
    )


ORACLE_SEASONAL = f"""
    WITH hourly AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
             count(*) AS n_events,
             {ex.sql_avg('value', 6)} AS avg_value
      FROM events GROUP BY event_type, hour(ts)
    ), totals AS (
      SELECT event_type, {ex.sql_avg('value', 6)} AS type_avg
      FROM events GROUP BY event_type
    )
    SELECT h.event_type, h.hour, h.n_events, h.avg_value, t.type_avg,
           {ex.sql_quantize('h.avg_value / t.type_avg', 6)} AS ratio
    FROM hourly h JOIN totals t USING (event_type)
"""


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition counts: for each user's event stream in
    (ts, event_id) order, count consecutive event_type pairs — the
    first-order Markov matrix behind next-action prediction and
    funnel-drop diagnosis (complements events_funnel_conversion,
    which fixes one path; this surfaces ALL paths).

    One shuffle on user_id for the lag window, then a tiny-key
    aggregate (|event_types|² groups) with map-side combine — the
    same scale-free shape as the reference's 3/26/4-key reduces."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.col("event_type").alias("to_type"),
            F.lag("event_type").over(w).alias("from_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )


def customer_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization: replace direct identifiers with stable
    SHA-256 digests — the reversible-by-nobody sibling of
    text_pii_redaction (redaction destroys linkage; hashing keeps
    join-ability across tables without exposing the identifier).
    Pure map-side crypto in whole-stage codegen; at 100 TB add a
    secret salt column from a vault so digests can't be
    dictionary-reversed (omitted here for oracle determinism)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.sha2(F.col("c_custkey").cast("string"), 256).alias("custkey_h"),
        F.sha2(F.col("c_name"), 256).alias("name_h"),
        "c_mktsegment",
        "c_acctbal",
    )


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency (days since last order,
    against the corpus max date), frequency (order count), monetary
    (exact 2-decimal spend), each scored into quintiles (ntile 5 —
    score 5 = most recent / most frequent / highest spend) with
    custkey tiebreak so the tiling is deterministic in any engine,
    plus the concatenated segment code marketing pipelines key on.

    Plan: one grouped aggregate over orders (map-side combine), the
    corpus max date broadcast back as a scalar, then three exact
    global ranks via :func:`two_phase_rank` (broadcast quantile
    boundaries + map-side bucket assignment + per-bucket partitioned
    row_number) with each quintile score derived from its rank by
    integer arithmetic — no unpartitioned window anywhere, so the
    query holds at billions of customers. Recency ranks descending
    via the negated integer day count (same total order). The three
    ranks run as independent branches off the per-customer frame and
    re-join on custkey (narrow customer-cardinality shuffles) rather
    than chaining, which would nest each rank's whole plan inside the
    next one's boundary/count branches."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_totalprice"
    )
    ref = o.agg(F.max("d").alias("ref_d"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("d").alias("last_d"),
            F.count("*").alias("frequency"),
            ex.quantized_sum("o_totalprice", 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.datediff("ref_d", "last_d").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    neg = per_cust.withColumn("_neg_rec", -F.col("recency_days"))
    r_rank = two_phase_rank(neg, "_neg_rec", "custkey", out="_rr").select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.expr(_sql_ntile("_rr", "_n", 5)).cast("int").alias("r_score"),
    )
    f_rank = two_phase_rank(per_cust, "frequency", "custkey", out="_rf").select(
        "custkey",
        F.expr(_sql_ntile("_rf", "_n", 5)).cast("int").alias("f_score"),
    )
    m_rank = two_phase_rank(per_cust, "monetary", "custkey", out="_rm").select(
        "custkey",
        F.expr(_sql_ntile("_rm", "_n", 5)).cast("int").alias("m_score"),
    )
    return (
        r_rank.join(f_rank, "custkey")
        .join(m_rank, "custkey")
        .select(
            "custkey",
            "recency_days",
            "frequency",
            "monetary",
            "r_score",
            "f_score",
            "m_score",
            F.concat_ws("", "r_score", "f_score", "m_score").alias("segment"),
        )
    )


ORACLE_RFM = f"""
    WITH o AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_totalprice
      FROM orders
    ), ref AS (
      SELECT MAX(d) AS ref_d FROM o
    ), per_cust AS (
      SELECT o_custkey AS custkey,
             date_diff('day', MAX(d), (SELECT ref_d FROM ref)) AS recency_days,
             COUNT(*) AS frequency,
             {ex.sql_sum('o_totalprice', 2)} AS monetary
      FROM o GROUP BY o_custkey
    ), scored AS (
      SELECT custkey, recency_days, frequency, monetary,
             CAST(NTILE(5) OVER (ORDER BY recency_days DESC, custkey) AS INTEGER) AS r_score,
             CAST(NTILE(5) OVER (ORDER BY frequency ASC, custkey) AS INTEGER) AS f_score,
             CAST(NTILE(5) OVER (ORDER BY monetary ASC, custkey) AS INTEGER) AS m_score
      FROM per_cust
    )
    SELECT *, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
              || CAST(m_score AS VARCHAR) AS segment
    FROM scored
"""


def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival gap distribution ACROSS the stream
    (median / p90 / p99 / max of successive same-type gaps, seconds) —
    the measurement that justifies a session gap or watermark delay
    before anyone hardcodes one. Gaps are integer micros (exact), the
    percentiles exact interpolated over them, then quantized to the
    1e-6 s grid (Spark's Percentile and DuckDB's quantile_cont use
    different FP interpolation expressions that can differ in the last
    ulp; the repo's scale-6 quantize makes the hash compare exact);
    one window shuffle on event_type + one grouped aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id"
    )
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn(
            "gap_us",
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)),
        )
        .where(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        ex.quantize(F.percentile("gap_us", F.lit(0.5)) / 1e6, 6).alias(
            "p50_sec"
        ),
        ex.quantize(F.percentile("gap_us", F.lit(0.9)) / 1e6, 6).alias(
            "p90_sec"
        ),
        ex.quantize(F.percentile("gap_us", F.lit(0.99)) / 1e6, 6).alias(
            "p99_sec"
        ),
        (F.max("gap_us") / F.lit(1e6)).alias("max_sec"),
    )


ORACLE_INTERARRIVAL = f"""
    WITH g AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
             - epoch_us(CAST(LAG(ts) OVER (PARTITION BY event_type
                                           ORDER BY ts, event_id)
                             AS TIMESTAMP)) AS gap_us
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_gaps,
           {ex.sql_quantize('quantile_cont(gap_us, 0.5) / 1e6', 6)} AS p50_sec,
           {ex.sql_quantize('quantile_cont(gap_us, 0.9) / 1e6', 6)} AS p90_sec,
           {ex.sql_quantize('quantile_cont(gap_us, 0.99) / 1e6', 6)} AS p99_sec,
           MAX(gap_us) / 1e6 AS max_sec
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
"""


def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order
    month, spend tracked per months-since-first (offset k), plus the
    cumulative LTV running total per cohort — the retention economics
    table every subscription/commerce warehouse maintains.

    Exactness: month offsets are integer month arithmetic on
    month-truncated dates; spend sums and the cumulative window both
    use the integer-scaled exact-sum discipline (quantized_sum /
    quantized_sum_over), so the running totals are bit-identical at
    any parallelism. Plan: one grouped min per customer (broadcast
    back), one grouped sum on (cohort, k), one small window over the
    cohort×k frame."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("m"),
        "o_totalprice",
    )
    first = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    joined = o.join(first, "o_custkey").select(
        F.date_format("cohort_m", "yyyy-MM").alias("cohort_month"),
        F.months_between("m", "cohort_m").cast("int").alias("month_k"),
        "o_totalprice",
        "o_custkey",
    )
    per_cell = joined.groupBy("cohort_month", "month_k").agg(
        F.countDistinct("o_custkey").alias("n_active"),
        ex.quantized_sum("o_totalprice", 2).alias("spend"),
    )
    w = (
        W.partitionBy("cohort_month")
        .orderBy("month_k")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return per_cell.select(
        "cohort_month",
        "month_k",
        "n_active",
        "spend",
        ex.quantized_sum_over("spend", 2, w).alias("cum_spend"),
    )


ORACLE_COHORT_LTV = f"""
    WITH o AS (
      SELECT o_custkey, date_trunc('month', o_orderdate) AS m, o_totalprice
      FROM orders
    ), first AS (
      SELECT o_custkey, MIN(m) AS cohort_m FROM o GROUP BY o_custkey
    ), joined AS (
      SELECT strftime(f.cohort_m, '%Y-%m') AS cohort_month,
             date_diff('month', f.cohort_m, o.m) AS month_k,
             o.o_totalprice, o.o_custkey
      FROM o JOIN first f USING (o_custkey)
    ), per_cell AS (
      SELECT cohort_month, CAST(month_k AS INTEGER) AS month_k,
             COUNT(DISTINCT o_custkey) AS n_active,
             {ex.sql_sum('o_totalprice', 2)} AS spend
      FROM joined GROUP BY cohort_month, month_k
    )
    SELECT cohort_month, month_k, n_active, spend,
           {ex.sql_sum_over('spend', 2, 'PARTITION BY cohort_month ORDER BY month_k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW')} AS cum_spend
    FROM per_cell
"""


# ---------------------------------------------------------------------------
# Truncated EWMA smoothing
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.2
EWMA_WINDOW = 20  #: truncation: fold over the last 20 values only


def events_user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event exponentially-weighted moving average of ``value``
    per user — truncated at EWMA_WINDOW lags so the weight tail
    ((1−α)^20 ≈ 1.2%) is dropped and the state is a bounded frame,
    not an unbounded recursion.

    The untruncated recurrence is inherently sequential per user;
    the truncated form is a LEFT FOLD over the trailing frame
    (init = oldest value, acc ← α·x + (1−α)·acc), which both engines
    express with bit-identical arithmetic (F.aggregate here,
    list_reduce in the oracle — both strict left folds, same literal
    order α·x + (1−α)·acc). One shuffle on user_id, streaming ROWS
    frame; the fold is interpreted HOF at 20 elements/row — the Arrow
    escape hatch (functions/vectors.py rationale) applies if a
    profile ever shows it hot."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_WINDOW - 1), 0)
    )
    lst = F.collect_list("value").over(w)
    a = F.lit(EWMA_ALPHA)
    fold = F.aggregate(
        F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0))),
        F.element_at(lst, 1),
        lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
    )
    return ev.select(
        "event_id",
        "user_id",
        ex.quantize(F.col("value"), 6).alias("value"),
        ex.quantize(fold, 6).alias("ewma"),
    )


ORACLE_EWMA = f"""
    WITH framed AS (
      SELECT event_id, user_id, value,
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW
             ) AS lst
      FROM events
    )
    SELECT event_id, user_id,
           ROUND(value * 1000000.0) / 1000000.0 AS value,
           ROUND(list_reduce(lst,
                 (acc, x) -> {EWMA_ALPHA} * x + (1.0 - {EWMA_ALPHA}) * acc)
                 * 1000000.0) / 1000000.0 AS ewma
    FROM framed
"""


QUERIES = {
    "customer_pseudonymize": customer_pseudonymize,
    "customer_rfm_segments": customer_rfm_segments,
    "events_interarrival_stats": events_interarrival_stats,
    "orders_cohort_ltv": orders_cohort_ltv,
    "events_transition_matrix": events_transition_matrix,
    "events_value_anomalies": events_value_anomalies,
    "events_rolling_user_stats": events_rolling_user_stats,
    "events_sessionize": events_sessionize,
    "events_retention_cohorts": events_retention_cohorts,
    "orders_market_basket": orders_market_basket,
    "customer_spend_deciles": customer_spend_deciles,
    "order_price_histogram": order_price_histogram,
    "text_pii_redaction": text_pii_redaction,
    "events_ohlc_bars": events_ohlc_bars,
    "events_user_value_ewma": events_user_value_ewma,
    "events_seasonal_profile": events_seasonal_profile,
    "parts_abc_revenue": parts_abc_revenue,
}

ORACLE = {
    "events_ohlc_bars": ORACLE_OHLC,
    "events_user_value_ewma": ORACLE_EWMA,
    "events_seasonal_profile": ORACLE_SEASONAL,
    "parts_abc_revenue": ORACLE_ABC,
    "customer_rfm_segments": ORACLE_RFM,
    "events_interarrival_stats": ORACLE_INTERARRIVAL,
    "orders_cohort_ltv": ORACLE_COHORT_LTV,
    "customer_pseudonymize": """
        SELECT sha256(CAST(c_custkey AS VARCHAR)) AS custkey_h,
               sha256(c_name) AS name_h,
               c_mktsegment, c_acctbal
        FROM customer
    """,
    "events_transition_matrix": """
        WITH t AS (
          SELECT user_id, event_type AS to_type,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS from_type
          FROM events
        )
        SELECT from_type, to_type, COUNT(*) AS n
        FROM t WHERE from_type IS NOT NULL
        GROUP BY 1, 2
    """,
    "events_value_anomalies": f"""
        WITH c AS (
          SELECT event_id, user_id, ts, value,
                 CAST(ROUND(value * 100) AS BIGINT) AS x
          FROM events
        ), w AS (
          SELECT event_id, user_id, value, x,
                 COUNT(*) OVER win AS n,
                 SUM(x) OVER win AS s,
                 SUM(x * x) OVER win AS ss
          FROM c WINDOW win AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN {ANOMALY_WIN - 1} PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, user_id, value FROM w
        WHERE n = {ANOMALY_WIN}
          AND (n * x - s) * (n * x - s)
              > {ANOMALY_K * ANOMALY_K} * (n * ss - s * s)
    """,
    "events_sessionize": f"""
        WITH ev AS (
          SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS t_us
          FROM events
        ), f AS (
          SELECT user_id, event_id, t_us,
                 CASE WHEN lag(t_us) OVER w IS NULL THEN 1
                      WHEN t_us - lag(t_us) OVER w > {SESSION_GAP_US} THEN 1
                      ELSE 0 END AS new_sess
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
        ), s AS (
          SELECT user_id, t_us,
                 SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY t_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM f
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               COUNT(*) AS n_events,
               MIN(t_us) AS start_us, MAX(t_us) AS end_us,
               MAX(t_us) - MIN(t_us) AS duration_us
        FROM s GROUP BY user_id, session_seq
    """,
    "events_retention_cohorts": """
        WITH ev AS (
          SELECT user_id,
                 CAST((ts::DATE - DATE '2024-01-01') // 7 AS BIGINT) AS week
          FROM events
        ), first AS (
          SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id
        )
        SELECT f.cohort_week,
               e.week - f.cohort_week AS week_offset,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM ev e JOIN first f USING (user_id)
        GROUP BY 1, 2
    """,
    "orders_market_basket": """
        WITH items AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_orders
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY n_orders DESC, part_a ASC, part_b ASC
        LIMIT 100
    """,
    "events_rolling_user_stats": """
        WITH base AS (
          SELECT event_id, user_id,
                 CAST(epoch_us(ts) // 1000000 AS BIGINT) AS epoch_s,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events
        )
        SELECT event_id, user_id,
               COUNT(*) OVER w AS roll_n,
               CAST(SUM(cents) OVER w AS DOUBLE) / 100.0 AS roll_sum
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    "customer_spend_deciles": f"""
        WITH spend AS (
          SELECT o_custkey, {ex.sql_sum('o_totalprice', 2)} AS spend
          FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey AS custkey, spend,
               CAST(NTILE(10) OVER w AS BIGINT) AS decile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM spend
        WINDOW w AS (ORDER BY spend, o_custkey)
    """,
    "order_price_histogram": """
        WITH c AS (
          SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        )
        SELECT cents // 5000000 AS bin,
               COUNT(*) AS n_orders,
               CAST(MIN(cents) AS DOUBLE) / 100.0 AS min_price,
               CAST(MAX(cents) AS DOUBLE) / 100.0 AS max_price
        FROM c GROUP BY 1
    """,
    "text_pii_redaction": r"""
        WITH m AS (
          SELECT doc_id, text,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '[MASKED]', 'g'),
                     '\b[0-9]{3}[- ][0-9]{4}\b', '[MASKED]', 'g'),
                   '\b(customer|value)\b', '[MASKED]', 'g') AS masked
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                 AS n_email,
               CAST(len(regexp_extract_all(text,
                 '\b[0-9]{3}[- ][0-9]{4}\b')) AS BIGINT) AS n_phone,
               CAST(len(regexp_extract_all(text,
                 '\b(customer|value)\b')) AS BIGINT) AS n_blocked,
               CAST(length(masked) AS BIGINT) AS masked_len,
               substring(masked, 1, 40) AS masked_prefix
        FROM m
    """,
}
