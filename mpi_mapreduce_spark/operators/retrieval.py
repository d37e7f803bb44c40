"""Full-text retrieval over ``documents`` — BM25 ranked search on the
inverted index the text-analysis family already builds (tf/df frames).

The retrieval counterpart to text_tfidf_top_terms: where that query
extracts keywords per document, this one ranks documents for a fixed
query workload with the Okapi BM25 weighting — the scoring function
behind every classic search stack and the standard first-stage
retriever in front of LLM RAG pipelines. Like the reference's
map/reduce tasks, a query set is a tiny dimension the engine
broadcasts (reference main.cpp:84-95's fixed task dispatch → a fixed
query workload here).

Scale shape (100 TB corpus, q queries): postings are pruned to the
query vocabulary INSIDE the scan stage (a literal IN-list filter
before any aggregate — non-query terms never reach a shuffle, let
alone an aggregate), per-doc length is computed per row as the token
count (no corpus-wide tf table, no dl re-join), document frequency
and the scored rows derive from the pruned postings, and corpus
stats (N, avgdl) are one linear no-shuffle pass to a broadcast
1-row frame. Top-k per query is a window over the q-partitioned
score frame — q is small, each partition holds only that query's
matching docs.

All arithmetic follows the engine's exactness discipline: per-row
scores are quantized (scale 6) before the order-independent
quantized_sum, so ranking ties are exact and the DuckDB oracle
hash-matches bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mpi_mapreduce_spark.datamodel import load_table
from mpi_mapreduce_spark.functions import exact as ex
from mpi_mapreduce_spark.functions.text import tokens

#: Okapi BM25 parameters (the textbook defaults)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10

#: fixed query workload — terms drawn from the fixture's vocabulary so
#: every query has a non-trivial posting list at any scale factor
QUERY_SET: list[tuple[int, str]] = [
    (1, "hash join"),
    (2, "scan filter row"),
    (3, "sort merge join"),
    (4, "customer order value"),
    (5, "slow batch"),
]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]] = QUERY_SET,
    k: int = BM25_TOPK,
) -> DataFrame:
    """Top-``k`` documents per query under BM25(k1, b).

    idf uses the guarded form ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (never negative, standard Lucene variant); query terms are
    de-duplicated (short-query convention: query term weight 1).
    Ties on the quantized score break on doc_id ASC in both engines.

    Convention: ``N`` (n_docs) counts docs with ≥ 1 token — it is
    derived from the per-doc-length frame, so token-empty docs are
    excluded from the corpus size by construction (they can never
    match a term anyway). The DuckDB oracle counts N the same way;
    callers wanting the raw-corpus N should count the documents frame
    and pass-through idf themselves.
    """
    spark = docs.sparkSession
    qrows = sorted(
        {
            (qid, t)
            for qid, qtext in queries
            for t in qtext.lower().split()
            if t
        }
    )
    qterms = spark.createDataFrame(qrows, "query_id long, term string")
    vocab_terms = sorted({t for _, t in qrows})
    # Per-doc length dl = Σ_term tf = the doc's token count, so it is
    # computable per ROW as size(tokens) — no full-vocabulary tf
    # aggregate, no corpus-wide (doc_id, term) shuffle, no dl join.
    toks = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    # corpus stats (N over docs with >= 1 token, avgdl): ONE linear
    # no-shuffle pass to a 1-row aggregate — previously derived from
    # the full tf table (explode + corpus-wide two-key aggregate).
    stats = (
        toks.select(F.size("tok").alias("dl"))
        .where(F.col("dl") > 0)
        .agg(
            F.count("*").alias("n_docs"),
            ex.quantized_avg("dl", 6).alias("avgdl"),
        )
    )
    # Postings pruned to the query vocabulary BEFORE the aggregate
    # (guide §2.3: filter/aggregate before you shuffle): the literal
    # IN-list filter runs inside the scan stage, so only matching
    # postings ever reach a shuffle — at 100 TB the difference between
    # shuffling the whole inverted index and shuffling q posting
    # lists. dl rides along as a grouping key (functionally dependent
    # on doc_id), eliminating the old corpus-wide dl re-join.
    exploded = toks.select(
        "doc_id",
        F.size("tok").alias("dl"),
        F.explode("tok").alias("term"),
    )
    # ADVICE r13: the literal IN-list is ideal for the small fixed
    # QUERY_SET (planned into the scan stage), but this is a public
    # API taking arbitrary queries — a huge vocabulary would bloat the
    # plan/codegen, and an empty one must error, not silently match
    # nothing. Past the threshold, prune with a broadcast semi-join on
    # term instead (same rows, scales with any query set).
    if not vocab_terms:
        raise ValueError("queries contain no terms")
    if len(vocab_terms) <= 256:
        pruned = exploded.where(F.col("term").isin(vocab_terms))
    else:
        pruned = exploded.join(
            F.broadcast(qterms.select("term").distinct()),
            "term",
            "left_semi",
        )
    tfq = pruned.groupBy("doc_id", "term", "dl").agg(
        F.count("*").alias("tf")
    )
    dfreq = tfq.groupBy("term").agg(F.count("*").alias("df"))
    idf = ex.quantize(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
        6,
    )
    tf_d = F.col("tf").cast("double")
    norm = tf_d + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
    )
    contrib = ex.quantize(
        idf * (tf_d * F.lit(BM25_K1 + 1.0)) / norm, 6
    )
    scored = (
        tfq.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            contrib.alias("contrib"),
        )
    )
    per = scored.groupBy("query_id", "doc_id").agg(
        ex.quantized_sum("contrib", 6).alias("score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`bm25_topk` over documents."""
    return bm25_topk(_docs(spark, sf_dir))


def _query_values_sql() -> str:
    rows = sorted(
        {
            (qid, t)
            for qid, qtext in QUERY_SET
            for t in qtext.lower().split()
            if t
        }
    )
    return ", ".join(f"({qid}, '{t}')" for qid, t in rows)


ORACLE_BM25 = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS tok
      FROM documents
    ), tokpos AS (
      SELECT doc_id, unnest(tok) AS term FROM toks
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tokpos GROUP BY doc_id, term
    ), dl AS (
      SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
    ), stats AS (
      SELECT count(*) AS n_docs, {ex.sql_avg('dl', 6)} AS avgdl FROM dl
    ), q(query_id, term) AS (
      VALUES {_query_values_sql()}
    ), vocab AS (
      SELECT DISTINCT term FROM q
    ), tfq AS (
      SELECT tf.* FROM tf JOIN vocab USING (term)
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tfq GROUP BY term
    ), scored AS (
      SELECT q.query_id, tfq.doc_id,
             {ex.sql_quantize(
                 f"({ex.sql_quantize('ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))', 6)})"
                 f" * (CAST(tfq.tf AS DOUBLE) * {BM25_K1 + 1.0})"
                 f" / (CAST(tfq.tf AS DOUBLE) + {BM25_K1} * "
                 f"({1.0 - BM25_B} + {BM25_B} * CAST(dl.dl AS DOUBLE) / stats.avgdl))",
                 6,
             )} AS contrib
      FROM tfq
      JOIN q USING (term)
      JOIN dfreq USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
    ), per AS (
      SELECT query_id, doc_id, {ex.sql_sum('contrib', 6)} AS score
      FROM scored GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score, rnk FROM (
      SELECT query_id, doc_id, score,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id ASC
             ) AS BIGINT) AS rnk
      FROM per
    ) WHERE rnk <= {BM25_TOPK}
"""


QUERIES = {
    "text_bm25_topk": text_bm25_topk,
}

ORACLE = {
    "text_bm25_topk": ORACLE_BM25,
}
