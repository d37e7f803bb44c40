"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
with decode / feature-extract / frame-sample stages as Arrow-batched
``mapInPandas`` operators.

The container has no image/audio codecs, so the *decode* step is
stubbed (deterministic byte-level features, or NotImplementedError for
the real-codec path) — but everything Spark-side is real and tested:
schemas, binary column construction, partitioning, the pandas-UDF
batch shapes, and the feature aggregation that follows. Swapping the
stub for Pillow/torchaudio changes one function body, not the plan.

At 100 TB: binary payloads dominate row size → keep
``spark.sql.files.maxPartitionBytes`` at 128-256 MB so a partition is
a few hundred blobs; feature extraction is CPU-bound per partition and
scales linearly; never collect payloads to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_mapreduce_spark.datamodel import load_table

FEATURE_DIM = 4

#: real decoders would be registered here; absent in this container
REAL_CODECS_AVAILABLE = False


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal table shape from ``documents``: one
    binary payload per row plus typed metadata — the schema an
    ingestion job would produce from an object store."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def make_decode_features():
    """Build the STUB decode mapInPandas function: deterministic
    byte-level features standing in for an image/audio decoder.
    Feature vector per payload:
    [n_bytes % 256, first_byte, last_byte, n_bytes % 7].

    Returned as a *closure* on purpose: cloudpickle serializes nested
    functions by value, so Spark's Python workers never need this
    package importable on their own sys.path (a module-level function
    would pickle by reference and crash any driver that didn't install
    the repo). A real deployment replaces the inner body with e.g.
    PIL.Image.open + resize + channel stats; the signature (pandas
    batches in/out) and the surrounding plan stay identical.
    """
    real_codecs = REAL_CODECS_AVAILABLE

    def decode_features(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        if real_codecs:  # pragma: no cover
            raise NotImplementedError(
                "real codec path not wired in this container"
            )
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [
                [
                    float(len(b) % 256),
                    float(b[0]) if len(b) else 0.0,
                    float(b[-1]) if len(b) else 0.0,
                    float(len(b) % 7),
                ]
                for b in payloads
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return decode_features


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → features via Arrow-batched mapInPandas; output exploded
    to one row per feature slot so the result is flat, deterministic
    and oracle-checkable (the stub features are pure byte arithmetic
    DuckDB can replicate)."""
    media = media_table(spark, sf_dir)
    feats = media.select("media_id", "payload").mapInPandas(
        make_decode_features(), schema="media_id long, features array<double>"
    )
    return feats.select(
        "media_id",
        F.posexplode("features").alias("slot", "value"),
    )


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling stand-in: chunk each payload into fixed
    64-byte frames and keep every 4th — pure Spark array ops (slice of
    a chunked binary→substring grid), no Python. Returns per-media
    sampled-frame count and bytes retained."""
    media = media_table(spark, sf_dir)
    n_frames = F.ceil(F.col("meta.n_bytes") / 64).cast("long")
    sampled = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(4)
    )
    return media.select(
        "media_id",
        n_frames.alias("n_frames"),
        F.size(sampled).cast("long").alias("n_sampled"),
        F.aggregate(
            F.transform(
                sampled,
                lambda i: F.least(
                    F.col("meta.n_bytes") - i * 64, F.lit(64)
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("bytes_kept"),
    )


RESIZE_STRIDE = 4


def make_resize(stride: int = RESIZE_STRIDE):
    """Build the STUB resize mapInPandas function: 1-D nearest-neighbor
    downsample — keep every ``stride``-th byte of the payload, emitting
    the resized payload (real binary-out plumbing) plus audit stats.
    A real deployment swaps the inner body for PIL resize / audio
    resample; batch shapes and schema stay identical. Closure for the
    same cloudpickle reason as make_decode_features."""

    def resize(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = [bytes(b[::stride]) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_out": out,
                    "orig_bytes": [len(b) for b in pdf["payload"]],
                    "resized_bytes": [len(b) for b in out],
                    "checksum": [sum(b) for b in out],
                }
            )

    return resize


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → resized binary via Arrow-batched mapInPandas. The
    registry query projects the audit stats (scalar, oracle-checkable:
    the stub keeps bytes at 0-based positions 0, stride, 2*stride, …
    of ASCII text, so DuckDB can recompute the checksum); the resized
    payload itself is asserted byte-exact in pytest."""
    media = media_table(spark, sf_dir)
    resized = media.select("media_id", "payload").mapInPandas(
        make_resize(),
        schema=(
            "media_id long, payload_out binary, orig_bytes long, "
            "resized_bytes long, checksum long"
        ),
    )
    return resized.select("media_id", "orig_bytes", "resized_bytes", "checksum")


ENERGY_FRAME_BYTES = 64


def make_frame_energy(frame: int = ENERGY_FRAME_BYTES):
    """Build the frame-energy mapInPandas function: per fixed-size
    byte frame, RMS of the raw sample values — the audio-style feature
    (VAD/loudness pre-filter) computed on codec-free raw bytes, so
    unlike the decode stub this is the REAL math end-to-end. Closure
    for the usual cloudpickle reason.

    Exactness: frame byte values are small integers, so the squared
    sum is an exact integer in double at any summation order, sqrt is
    IEEE correctly-rounded, and the division is by an exact count —
    bit-identical across engines before the final quantize."""

    def frame_energy(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, fidx, nb, rms = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                nfr = -(-len(b) // frame) if len(b) else 0
                for f in range(nfr):
                    seg = b[f * frame : (f + 1) * frame]
                    ids.append(mid)
                    fidx.append(f)
                    nb.append(len(seg))
                    rms.append(float(np.sqrt(np.sum(seg * seg) / len(seg))))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": fidx,
                    "n_bytes": nb,
                    "rms": rms,
                }
            )

    return frame_energy


def multimodal_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary → per-frame RMS energy via Arrow-batched mapInPandas;
    64-byte frames. At scale this is the linear CPU-bound pass that
    precedes sampling decisions (silence/blank trimming); payloads
    never leave the executors."""
    media = media_table(spark, sf_dir)
    frames = media.select("media_id", "payload").mapInPandas(
        make_frame_energy(),
        schema="media_id long, frame_idx long, n_bytes long, rms double",
    )
    from mpi_mapreduce_spark.functions import exact as ex

    return frames.select(
        "media_id",
        "frame_idx",
        "n_bytes",
        ex.quantize(F.col("rms"), 6).alias("rms"),
    )


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": frame_sample,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_energy": multimodal_frame_energy,
}

ORACLE = {
    # ASCII corpus: character codepoints equal payload bytes, so the
    # frame RMS is recomputable from text character arithmetic.
    "multimodal_frame_energy": """
        WITH frames AS (
          SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
                 substring(text, CAST(f * 64 + 1 AS INTEGER), 64) AS chunk
          FROM documents,
               LATERAL (SELECT unnest(range(CAST(ceil(strlen(text) / 64.0) AS BIGINT))) AS f)
          WHERE strlen(text) > 0
        )
        SELECT media_id, frame_idx,
               CAST(strlen(chunk) AS BIGINT) AS n_bytes,
               ROUND(sqrt(
                 list_sum(list_transform(range(strlen(chunk)),
                   i -> CAST(ascii(substring(chunk, CAST(i + 1 AS INTEGER), 1))
                             AS DOUBLE)
                        * ascii(substring(chunk, CAST(i + 1 AS INTEGER), 1))))
                 / strlen(chunk)) * 1000000.0) / 1000000.0 AS rms
        FROM frames
    """,
    # The stub decode is deterministic byte arithmetic over ASCII text,
    # so even the pandas-UDF path gets a real oracle.
    "multimodal_features": """
        WITH f AS (
          SELECT doc_id AS media_id,
                 strlen(text) AS nb,
                 [CAST(strlen(text) % 256 AS DOUBLE),
                  CAST(CASE WHEN length(text) > 0 THEN ascii(substring(text, 1, 1)) ELSE 0 END AS DOUBLE),
                  CAST(CASE WHEN length(text) > 0 THEN ascii(substring(text, length(text), 1)) ELSE 0 END AS DOUBLE),
                  CAST(strlen(text) % 7 AS DOUBLE)] AS features
          FROM documents
        )
        SELECT media_id, CAST(i AS INTEGER) AS slot, features[i + 1] AS value
        FROM f, range(4) t(i)
    """,
    "multimodal_frame_sample": """
        WITH m AS (
          SELECT doc_id AS media_id, strlen(text) AS nb,
                 CAST(ceil(strlen(text) / 64.0) AS BIGINT) AS n_frames
          FROM documents
        ), s AS (
          SELECT media_id, nb, n_frames,
                 range(0, greatest(n_frames - 1, 0) + 1, 4) AS sampled
          FROM m
        )
        SELECT media_id, n_frames,
               CAST(len(sampled) AS BIGINT) AS n_sampled,
               CAST(COALESCE(list_sum(list_transform(sampled, i -> least(nb - i * 64, 64))), 0) AS BIGINT) AS bytes_kept
        FROM s
    """,
    # Stub resize keeps bytes at 0-based positions 0, stride, 2*stride…
    # of the UTF-8 payload; documents.text is ASCII in the test corpus,
    # so DuckDB character positions equal byte positions.
    "multimodal_resize": """
        WITH r AS (
          SELECT doc_id AS media_id,
                 strlen(text) AS orig_bytes,
                 list_transform(range(1, strlen(text) + 1, 4),
                                i -> ascii(substring(text, i, 1))) AS kept
          FROM documents
        )
        SELECT media_id,
               CAST(orig_bytes AS BIGINT) AS orig_bytes,
               CAST(len(kept) AS BIGINT) AS resized_bytes,
               CAST(COALESCE(list_sum(kept), 0) AS BIGINT) AS checksum
        FROM r
    """,
}
