"""MapReduce-parity unit tests, including the reference golden tests.

The golden fixtures are the reference's own sample inputs/outputs
(/root/reference/sample_{input,output}_files, verified in SURVEY.md §5);
tests skip cleanly if the reference checkout is absent.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mpi_mapreduce_spark.operators.mapreduce import (
    map1_charclass,
    map2_letterfreq,
    map3_synthetic,
    map_reduce,
)

REF_INPUTS = "/root/reference/sample_input_files"
REF_OUTPUTS = "/root/reference/sample_output_files"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_INPUTS), reason="reference corpus not available"
)


def _ref_corpus(spark, n_files: int):
    """One row per sample file — the reference's whole-file record
    granularity (main.cpp:36-47, 141-155). Read as latin-1 so byte
    counts equal char counts (strlen semantics, tasks.c:14)."""
    rows = []
    for i in range(n_files):
        with open(os.path.join(REF_INPUTS, f"{i}.txt"), "rb") as f:
            rows.append((i, f.read().decode("latin-1")))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _golden(name: str) -> dict[str, int]:
    out = {}
    with open(os.path.join(REF_OUTPUTS, name)) as f:
        for line in f:
            if line.strip():
                k, v = line.split()
                out[k] = int(v)
    return out


def _kv(df) -> dict[str, int]:
    return {r["key"]: r["val"] for r in df.collect()}


@needs_reference
def test_map1_golden_file0(spark):
    # 1.output is task 1 over file 0 only (SURVEY.md §5)
    got = _kv(map1_charclass(_ref_corpus(spark, 1)))
    assert got == _golden("1.output") == {"letters": 170, "numbers": 0, "others": 23}


@needs_reference
def test_map2_golden_files_0_to_4(spark):
    got = _kv(map2_letterfreq(_ref_corpus(spark, 5)))
    golden = _golden("2.output")
    assert got == golden
    assert len(got) == 26 and sum(got.values()) == 107244


@needs_reference
def test_map3_golden_all_files(spark):
    got = _kv(map3_synthetic(_ref_corpus(spark, 6)))
    assert got == _golden("3.output") == {k: 180 for k in ("we", "love", "cs", "3210")}


def test_map2_keeps_zero_counts(spark):
    df = spark.createDataFrame([("aaa bbb",)], "text string")
    got = _kv(map2_letterfreq(df))
    assert len(got) == 26
    assert got["a"] == 3 and got["b"] == 3 and got["z"] == 0


def test_map1_empty_and_mixed(spark):
    df = spark.createDataFrame([("ab12 !",), ("",)], "text string")
    got = _kv(map1_charclass(df))
    assert got == {"letters": 2, "numbers": 2, "others": 2}


def test_generic_map_reduce_matches_native_map1(spark):
    """The Arrow-batched generic combinator reproduces the native path
    — the exact (map, reduce) plug-in contract of the reference."""
    df = spark.createDataFrame(
        [("Hello, World 42!",), ("x9y",), ("",)], "text string"
    )

    def ref_map1(doc: str):
        letters = sum(c.isascii() and c.isalpha() for c in doc)
        numbers = sum(c.isascii() and c.isdigit() for c in doc)
        return [
            ("letters", letters),
            ("numbers", numbers),
            ("others", len(doc) - letters - numbers),
        ]

    got = _kv(map_reduce(df, ref_map1))
    assert got == _kv(map1_charclass(df))


def test_generic_map_reduce_udtf_matches_mapinpandas(spark):
    """The SQL-lateral UDTF path and the Arrow mapInPandas path agree
    on the same emitter (map3-style: data-dependent fan-out per doc)."""
    from mpi_mapreduce_spark.operators.mapreduce import map_reduce_udtf

    df = spark.createDataFrame(
        [("abcdef",), ("xy",), ("",), (None,)], "text string"
    )

    def ref_map3(doc: str):
        count = len(doc) % 5
        return [(k, 1) for _ in range(count) for k in ("we", "love", "cs", "3210")]

    got = _kv(map_reduce_udtf(spark, df, ref_map3))
    assert got == _kv(map_reduce(df.where(F.col("text").isNotNull()), ref_map3))
    assert got == {"we": 3, "love": 3, "cs": 3, "3210": 3}


def test_generic_map_reduce_custom_reducer(spark):
    df = spark.createDataFrame([("a a b",), ("b",)], "text string")
    got = _kv(
        map_reduce(df, lambda doc: [(w, 1) for w in doc.split()], reduce_fn=F.max)
    )
    assert got == {"a": 1, "b": 1}


def test_ref_compat_truncates_and_resums(spark):
    from mpi_mapreduce_spark.operators.mapreduce import ref_compat

    kv = spark.createDataFrame(
        [("longkeyA", 1), ("longkeyB", 2), ("short", 3)], "key string, val long"
    )
    got = _kv(ref_compat(kv))
    # 7-char truncation merges longkeyA/longkeyB (reference tasks.c:157-158)
    assert got == {"longkey": 3, "short": 3}
    assert dict(ref_compat(kv).dtypes)["val"] == "int"


def test_djb2_bit_exact_reference_values():
    """Literals computed by hand from reference utils.c:10-19
    (hash=5381; hash = hash*33 + c, 64-bit unsigned)."""
    from mpi_mapreduce_spark.operators.mapreduce import djb2

    assert djb2("a") == 177670  # 5381*33 + 97
    assert djb2("we") == 5863937
    assert djb2("love") == 6385446971
    assert djb2("letters") == 229473414723976


def test_djb2_partitioner_places_every_key_exactly(spark, sf_dir):
    """partition index == djb2(key) % R for every key — the routing
    rule of reference main.cpp:207-217 with the utils.c partitioner."""
    from mpi_mapreduce_spark.operators.mapreduce import (
        djb2,
        partition_by_djb2,
        q_wordcount,
    )

    kv = q_wordcount(spark, sf_dir)
    n = 4
    rdd = partition_by_djb2(kv, n)
    assert rdd.getNumPartitions() == n
    placed = rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, k) for k, _ in it]
    ).collect()
    assert placed, "expected keys"
    for pid, key in placed:
        assert djb2(key) % n == pid
