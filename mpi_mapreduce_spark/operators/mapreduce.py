"""MapReduce-parity operators, Spark-first.

The reference ships three pluggable map UDTFs (reference tasks.c:13-45,
53-88, 98-133) and one sum reducer (tasks.c:149-161), dispatched by task
number (main.cpp:84-95). Here each map is re-expressed as **native
columnar expressions** — no Python runs per row, the whole pipeline
stays inside whole-stage codegen — and the reducer is Spark's partial +
final hash aggregation (map-side combine, which the reference lacks:
it ships raw pairs, main.cpp:208-224).

Scale notes (100 TB):
- map1/map3 emit O(1) rows per document (3 and 4 keys): the shuffle
  carries only pre-combined per-partition partials — bytes, not rows.
- map2 emits exactly 26 rows per document via one explode of a
  26-element array (not one row per character!), so shuffle volume is
  26 x #docs before map-side combine collapses it to 26 x #partitions.
- Key cardinality is tiny (3/26/4), so the final agg is a handful of
  rows regardless of input size; AQE coalesces the post-shuffle side.
"""

from __future__ import annotations

import string
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import KV_SCHEMA, load_table

LETTERS = tuple(string.ascii_lowercase)

#: keys cycled by the reference's synthetic emitter (tasks.c:103-124)
MAP3_KEYS = ("we", "love", "cs", "3210")


# ---------------------------------------------------------------------------
# map1 — character-class counts (reference tasks.c:13-45)
# ---------------------------------------------------------------------------

def charclass_counts(text: Column) -> dict[str, Column]:
    """Per-document counts of ASCII letters / digits / everything else.

    The reference classifies each byte: [A-Za-z] -> letters,
    [0-9] -> numbers, all else (incl. whitespace) -> others
    (tasks.c:20-29). One regexp_replace pass per class, JVM-side.
    """
    n = F.length(text)
    letters = n - F.length(F.regexp_replace(text, "[A-Za-z]", ""))
    numbers = n - F.length(F.regexp_replace(text, "[0-9]", ""))
    others = n - letters - numbers
    return {"letters": letters, "numbers": numbers, "others": others}


def map1_charclass(df: DataFrame, text_col: str = "text") -> DataFrame:
    """letters/numbers/others totals over a corpus → (key, val).

    Equivalent to reference map1 + sum reduce (tasks.c:13-45, 149-161):
    every document emits the 3 class counts; reduce sums per key.
    Implemented as a single global aggregate + unpivot: the shuffle
    moves three longs per partition, nothing else.
    """
    counts = charclass_counts(F.col(text_col))
    agg = df.select(
        *[F.sum(c).cast("long").alias(k) for k, c in counts.items()]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("key"), F.coalesce(F.col(k), F.lit(0)).alias("val"))
            for k in counts
        ]
    )
    return agg.select(F.explode(pairs).alias("kv")).select("kv.key", "kv.val")


# ---------------------------------------------------------------------------
# map2 — case-folded letter histogram, zero counts kept (tasks.c:53-88)
# ---------------------------------------------------------------------------

def map2_letterfreq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Histogram of a-z over lowercased text → 26 (key, val) rows.

    Reference semantics: upper+lower fold together and **all 26 keys
    are emitted even at count zero** (tasks.c:62-81) — the classic
    silent-wrong spot if implemented as explode-chars + groupBy, which
    drops absent letters. Here every document emits a dense 26-element
    (letter, count) array — counts via length-difference after
    single-char removal, one codegen'd pass per letter, no per-char
    row explosion — so zero groups survive structurally.
    """
    lowered = F.lower(F.col(text_col))
    doc = df.select(lowered.alias("_t"))
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("key"),
                (
                    F.length(F.col("_t"))
                    - F.length(F.regexp_replace(F.col("_t"), c, ""))
                ).cast("long").alias("val"),
            )
            for c in LETTERS
        ]
    )
    return (
        doc.select(F.explode(pairs).alias("kv"))
        .groupBy(F.col("kv.key").alias("key"))
        .agg(F.sum("kv.val").alias("val"))
    )


# ---------------------------------------------------------------------------
# map3 — synthetic emitter: 4*(len%49) pairs of val 1 (tasks.c:98-133)
# ---------------------------------------------------------------------------

def map3_synthetic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Each doc contributes ``length(text) % 49`` to each of 4 keys.

    The reference emits 4*count pairs of val=1 cycling {we,love,cs,3210}
    then sum-reduces (tasks.c:98-133, 149-161); algebraically each key's
    total is sum(len%49). We aggregate first (one long per partition)
    and cross the 4-key frame at the end — the explode-then-sum version
    would ship up to 4x48 duplicate-key rows per doc for no reason
    (exactly the no-map-side-combine waste the reference has,
    main.cpp:208-224).
    """
    total = df.select(
        F.sum(F.length(F.col(text_col)) % 49).cast("long").alias("val")
    )
    keys = F.array(*[F.lit(k) for k in MAP3_KEYS])
    return total.select(
        F.explode(keys).alias("key"), F.coalesce(F.col("val"), F.lit(0)).alias("val")
    )


# ---------------------------------------------------------------------------
# Generic MapReduce combinator — the reference's extension point
# (tasks.h:22-26, dispatched at main.cpp:84-95), generalized.
# ---------------------------------------------------------------------------

def map_reduce(
    df: DataFrame,
    map_fn: Callable[[str], Iterable[tuple[str, int]]],
    reduce_fn: Callable[[Column], Column] = F.sum,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Run an arbitrary Python ``doc -> [(key, val), ...]`` emitter and
    reduce per key: the exact (map UDTF, reduce UDAF) contract of the
    reference (tasks.h:22-26), over a DataFrame.

    The mapper runs as an Arrow-batched ``mapInPandas`` (vectorized
    transfer, one Python worker per partition — never per row); the
    reduce side is a native Spark aggregate, so partial aggregation
    (map-side combine) and spill come for free. ``num_partitions``
    mirrors the reference's ``num_reduce_workers`` CLI knob
    (main.cpp:74) — normally leave it None and let AQE size the
    exchange.
    """
    import pandas as pd  # local import: only the generic path needs it

    def run_map(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            keys: list[str] = []
            vals: list[int] = []
            for doc in pdf[text_col]:
                for k, v in map_fn(doc):
                    keys.append(k)
                    vals.append(v)
            yield pd.DataFrame({"key": keys, "val": vals})

    mapped = df.mapInPandas(run_map, schema=KV_SCHEMA)
    grouped = (
        mapped.repartition(num_partitions, "key") if num_partitions else mapped
    ).groupBy("key")
    return grouped.agg(reduce_fn(F.col("val")).cast("long").alias("val"))


def map_reduce_udtf(
    spark: SparkSession,
    df: DataFrame,
    map_fn: Callable[[str], Iterable[tuple[str, int]]],
    text_col: str = "text",
) -> DataFrame:
    """Same (map UDTF, sum reduce) contract as :func:`map_reduce`, but
    through Spark's first-class Python UDTF surface (SURVEY.md §2.10):
    the emitter runs as a ``LATERAL`` table function in SQL — the
    literal relational spelling of the reference's 1-doc→N-pairs map
    shape (tasks.h:22-24).

    ``mapInPandas`` (the default path) moves whole Arrow batches and is
    the faster choice for bulk jobs; this path exists for API parity —
    a UDTF composes with arbitrary SQL (joins, filters around the
    lateral) without leaving the query language. The class is defined
    in-function so cloudpickle ships it by value (driver workers can't
    import this package)."""
    from pyspark.sql.functions import udtf

    class _Mapper:
        def eval(self, text: str):
            if text is None:
                return
            for k, v in map_fn(text):
                yield str(k), int(v)

    mapper = udtf(_Mapper, returnType="key string, val long")
    spark.udtf.register("mr_map_udtf", mapper)
    df.select(F.col(text_col).alias("__doc")).createOrReplaceTempView("mr_udtf_in")
    return spark.sql(
        """
        SELECT m.key, CAST(SUM(m.val) AS LONG) AS val
        FROM mr_udtf_in, LATERAL mr_map_udtf(__doc) AS m
        GROUP BY m.key
        """
    )


def ref_compat(kv: DataFrame) -> DataFrame:
    """Opt-in exact-compat mode for (key, val) results: truncate keys
    to 7 chars + NUL like the reference's fixed `char key[8]` wire
    struct (reference tasks.h:13, strncpy at tasks.c:157-158) and
    narrow values to int32 (tasks.h:14). These are MPI message-format
    artifacts, NOT semantics — the engine's native path keeps
    unbounded string keys and 64-bit values (SURVEY.md §1.2); this
    wrapper exists only to byte-match reference output. Truncation can
    merge distinct keys (as it would in the reference), so re-sum."""
    return (
        kv.select(
            F.substring("key", 1, 7).alias("key"),
            F.col("val").cast("int").alias("val"),
        )
        .groupBy("key")
        .agg(F.sum("val").cast("int").alias("val"))
    )


def djb2(key: str) -> int:
    """The reference's partitioner hash, bit-exact: djb2 over the key
    bytes with 64-bit unsigned wraparound (reference utils.c:10-19 —
    ``unsigned long hash = 5381; hash = hash*33 + c`` where
    ``unsigned long`` is 64-bit on the course lab's Linux hosts).
    ASCII-safe; the C loop reads signed chars, identical for < 0x80."""
    h = 5381
    for b in key.encode("utf-8"):
        h = (h * 33 + b) & 0xFFFFFFFFFFFFFFFF
    return h


def partition_by_djb2(kv: DataFrame, num_partitions: int):
    """Exact reference partition *placement*: returns an
    ``RDD[(key, row)]`` where partition index == djb2(key) %
    num_partitions, the routing rule of reference utils.c:10-19 /
    main.cpp:207-217.

    This is the one operator that genuinely needs an RDD: DataFrame
    ``repartition(n, col)`` hashes with Murmur3 and the placement is
    not observable in results (SURVEY.md §2.8) — which is why the
    engine's native path never does this. Provided as the compat/
    parity form of the reference's partitioner-UDF extension point;
    a custom Python partitioner costs one pickle round-trip per row,
    so it is compat-only, not the 100 TB path.

    The routing function is a CLOSURE (djb2 inlined locally), per the
    repo rule that worker-side Python must pickle by value: a
    module-level reference would make every worker import this
    package, which the driver's foreign-cwd harness (and a cluster
    without --py-files) cannot do."""
    n = num_partitions

    def _route(k: str) -> int:
        h = 5381
        for b in k.encode("utf-8"):
            h = (h * 33 + b) & 0xFFFFFFFFFFFFFFFF
        return h % n

    return (
        kv.select("key", "val")
        .rdd.map(lambda r: (r["key"], r["val"]))
        .partitionBy(n, _route)
    )


# ---------------------------------------------------------------------------
# Registry entries: (spark, sf_dir) -> DataFrame over the documents table
# ---------------------------------------------------------------------------

def q_map1_charclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    return map1_charclass(load_table(spark, sf_dir, "documents"))


def q_map2_letterfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return map2_letterfreq(load_table(spark, sf_dir, "documents"))


def q_map3_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return map3_synthetic(load_table(spark, sf_dir, "documents"))


def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic MapReduce wordcount via the *native* fast path: one
    explode + hash agg, whole-stage codegen end to end."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("key"))
        .where(F.col("key") != "")
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("val"))
    )


QUERIES = {
    "map1_charclass": q_map1_charclass,
    "map2_letterfreq": q_map2_letterfreq,
    "map3_synthetic": q_map3_synthetic,
    "wordcount": q_wordcount,
}

ORACLE = {
    "map1_charclass": """
        WITH c AS (
          SELECT length(text) AS n,
                 length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS letters,
                 length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS numbers
          FROM documents
        ), t AS (
          SELECT CAST(COALESCE(SUM(letters), 0) AS BIGINT) AS letters,
                 CAST(COALESCE(SUM(numbers), 0) AS BIGINT) AS numbers,
                 CAST(COALESCE(SUM(n - letters - numbers), 0) AS BIGINT) AS others
          FROM c
        )
        SELECT 'letters' AS key, letters AS val FROM t
        UNION ALL SELECT 'numbers', numbers FROM t
        UNION ALL SELECT 'others', others FROM t
    """,
    "map2_letterfreq": """
        WITH letters AS (SELECT chr(CAST(97 + i AS INTEGER)) AS key FROM range(26) t(i)),
        d AS (SELECT lower(text) AS t FROM documents)
        SELECT l.key AS key,
               CAST(COALESCE(SUM(length(d.t) - length(replace(d.t, l.key, ''))), 0) AS BIGINT) AS val
        FROM letters l CROSS JOIN d
        GROUP BY l.key
    """,
    "map3_synthetic": """
        WITH t AS (SELECT CAST(COALESCE(SUM(length(text) % 49), 0) AS BIGINT) AS val FROM documents)
        SELECT k.key AS key, t.val AS val
        FROM t CROSS JOIN (VALUES ('we'), ('love'), ('cs'), ('3210')) k(key)
    """,
    "wordcount": """
        SELECT w AS key, CAST(COUNT(*) AS BIGINT) AS val
        FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents)
        WHERE w <> ''
        GROUP BY w
    """,
}
