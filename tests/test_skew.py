"""Salted aggregation must be exactly equivalent to the direct
groupBy, including on pathologically skewed input."""

from __future__ import annotations

from pyspark.sql import functions as F

from mpi_mapreduce_spark.operators import skew as SK


def test_salted_agg_equals_direct_on_skewed_data(spark):
    # 10k rows of one hot key + a long tail
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).alias("v")
    )
    tail = spark.range(500).select(
        F.concat(F.lit("t"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    df = hot.unionByName(tail)
    got = SK.salted_agg(
        df,
        key="k",
        aggs={
            "n": (F.count("*"), F.sum),
            "s": (F.sum("v"), F.sum),
            "mx": (F.max("v"), F.max),
        },
    )
    direct = df.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))


def test_salted_agg_spreads_hot_key(spark):
    hot = spark.range(5_000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    salt = (
        F.spark_partition_id() * 31 + F.monotonically_increasing_id()
    ) % SK.DEFAULT_SALT
    n_subkeys = (
        hot.withColumn("_salt", salt).select("k", "_salt").distinct().count()
    )
    assert n_subkeys > 1, "salt must split the hot key across reducers"


def test_hot_key_split_join_planted_zipf(spark):
    """VERDICT r11 item 6: hot_key_split_join on a planted-Zipf
    instance table — results exactly equal the plain join, the hot
    keys ride the broadcast path (never entering the shuffle), and
    the cold-side shuffle stays balanced because the mega-keys are
    anti-filtered out."""
    import pyspark.sql.functions as F

    # Zipf-ish: key 'h0' has 20_000 instances, 'h1' 5_000, then a
    # 500-key cold tail with <= 40 instances each
    rows = (
        [("h0", "x", i) for i in range(20_000)]
        + [("h1", "y", i) for i in range(5_000)]
        + [(f"c{j}", "z", i) for j in range(500) for i in range(j % 40 + 1)]
    )
    left = spark.createDataFrame(rows, "w1 string, w2 string, payload long")
    right = left.groupBy("w1", "w2").agg(F.count("*").alias("n12"))

    split = SK.hot_key_split_join(
        left, right, ["w1", "w2"], hot_by="n12", hot_k=2
    )
    direct = left.join(right, ["w1", "w2"])
    assert sorted(map(tuple, split.collect())) == sorted(
        map(tuple, direct.collect())
    )

    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan  # the hot tier
    assert "LeftAnti" in plan, plan  # hot keys removed from the tail

    # the mega-keys never reach the shuffled cold side: with hot_k=2
    # the cold join's biggest per-key group is the tail's (<= 40), so
    # no shuffle partition of the cold output can exceed the tail sum
    hot = right.orderBy(F.desc("n12")).limit(2)
    cold_out = left.join(
        F.broadcast(hot.select("w1", "w2")), ["w1", "w2"], "left_anti"
    ).join(right, ["w1", "w2"])
    sizes = (
        cold_out.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    assert sizes and max(r["count"] for r in sizes) < 20_000
    assert sum(r["count"] for r in sizes) == sum(j % 40 + 1 for j in range(500))


def test_lm_scorers_hash_stable_under_hot_split(spark, sf_dir):
    """The skew-hardened LM scorers return byte-identical results to
    a direct-join re-derivation on the same corpus (the hot/cold
    boundary must never move a value)."""
    import pyspark.sql.functions as F

    from mpi_mapreduce_spark.operators import textops as T
    from mpi_mapreduce_spark.functions import exact as ex

    docs = T._docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("p", "tok")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("p")
    big = tok.select(
        "doc_id",
        F.col("tok").alias("w1"),
        F.lead("tok", 1).over(w).alias("w2"),
    ).where(F.col("w2").isNotNull())
    c12 = big.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("n12").alias("n1"), F.count("*").alias("t1")
    )
    c2 = c12.groupBy("w2").agg(F.count("*").alias("t2"))
    types = c12.agg(F.count("*").alias("tt"))
    d = F.lit(T.KN_DISCOUNT)
    p = (F.col("n12") - d) / F.col("n1") + (
        d * F.col("t1") / F.col("n1")
    ) * (F.col("t2") / F.col("tt"))
    direct = (
        big.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(types))
        .select("doc_id", (-F.log(p)).alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            ex.quantized_avg("nll", 4).alias("kn_cross_entropy"),
        )
    )
    got = T.text_kn_bigram_score(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hot_split_join_tie_boundary_exact(spark):
    """ADVICE r12 high: the rank-hot_k cut must be a TOTAL order.
    orderBy(desc(hot_by)).limit(k) alone is nondeterministic under
    ties, and hot_key_split_join evaluates the hot plan TWICE
    (broadcast inner join vs left_anti key filter, different
    projections — no exchange reuse), so a boundary tie resolving
    differently across evaluations duplicates a key's rows (both
    paths) or drops them (neither). Plant a ten-key tie block
    straddling the hot_k=4 boundary and require exact plain-join
    equality across repeated executions."""
    rows = (
        [("a", "a", i) for i in range(50)]
        + [("b", "b", i) for i in range(40)]
        # ten boundary keys, ALL with count 7 — the rank-3..12 tie
        + [(f"t{j}", "t", i) for j in range(10) for i in range(7)]
    )
    left = spark.createDataFrame(
        rows, "w1 string, w2 string, payload long"
    ).repartition(16)
    right = left.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    direct = sorted(map(tuple, left.join(right, ["w1", "w2"]).collect()))
    for _ in range(3):
        got = SK.hot_key_split_join(
            left, right, ["w1", "w2"], hot_by="n12", hot_k=4
        )
        rows_got = sorted(map(tuple, got.collect()))
        assert len(rows_got) == len(direct), "boundary key dropped/duplicated"
        assert rows_got == direct
