"""Text-processing column functions — all native Spark expressions.

These are the building blocks for dedup / text-analysis operators:
tokenization, shingling, jaccard. Everything here is a Column-in /
Column-out combinator that stays inside whole-stage codegen; no Python
executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: keeps rolling-hash arithmetic in 64-bit range
# in both Spark and the DuckDB oracle (no overflow semantics involved).
FP_MOD = 2_147_483_647


def tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text, empties dropped."""
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda t: t != F.lit("")
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; a doc shorter than n tokens
    contributes its whole token string as a single shingle."""
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(
                    " ", *[F.get(toks, i + j) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def jaccard(a: Column, b: Column) -> Column:
    """|A ∩ B| / |A ∪ B| over two distinct-element arrays, in double."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# NOTE: no array-based minhash_signature combinator here on purpose.
# Computing N minhashes as array_min(transform(...)) runs in Spark's
# interpreted higher-order-function path (~30x slower than codegen);
# operators/dedup.py builds signatures via explode + N native min()
# aggregates instead, which also gets map-side combine at scale.


def simhash64(token_hash: Column, weight: Column) -> list[Column]:
    """Per-bit signed contributions for a 64-bit TF-weighted SimHash.

    Returns 64 aggregate expressions (one per bit): sum over tokens of
    ``weight`` if the bit of ``token_hash`` is set else ``-weight``.
    Caller groups by document and combines bits with
    :func:`assemble_simhash`.
    """
    return [
        F.sum(
            F.when(F.shiftright(token_hash, b).bitwiseAND(F.lit(1)) == 1, weight)
            .otherwise(-weight)
        ).alias(f"_b{b}")
        for b in range(64)
    ]


def assemble_simhash(prefix: str = "_b") -> Column:
    """Combine the 64 per-bit sums into one signed 64-bit value.
    Bits are disjoint so the sum of shifted bits equals bitwise OR;
    bit 63 makes the value negative, which is fine — it's an opaque
    signature."""
    out = F.lit(0).cast("long")
    for b in range(64):
        bit = F.when(F.col(f"{prefix}{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        out = out + F.shiftleft(bit, b)
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures."""
    return F.bit_count(a.bitwiseXOR(b))
