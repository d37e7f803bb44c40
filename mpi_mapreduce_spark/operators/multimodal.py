"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
with decode / feature-extract / frame-sample stages as Arrow-batched
``mapInPandas`` operators.

The container has no image/audio codec *libraries*, so the decode
boundary splits honestly in two:

- **Real decoders for formats that are pure math** — WAV-PCM (RIFF
  chunk walking, fmt validation, 16-bit sample extraction), 24-bit
  BMP (header parse, BGR order, 4-byte row padding, bottom-up rows),
  PNG at every valid depth × color-type × interlace combination
  (chunk walk with CRC32 verification, stdlib-zlib inflate, all five
  per-row filter reconstructions, Adam7, sub-byte unpacking, palette
  + tRNS), baseline JPEG (marker walk, canonical Huffman decode
  rebuilt from DHT, dequantize + de-zigzag + IDCT, restart markers,
  4:2:0 upsampling, JFIF YCbCr→RGB) and — round 11 — progressive
  JPEG (SOF2 multi-scan reader: spectral selection, successive
  approximation, EOBRUN, G.1.2.3 refinement correction bits) are
  implemented for real: the engine builds genuine files
  executor-side and parses them back, with DuckDB oracles
  recomputing the expected stats from the generating formula and
  pytest cross-checking against the stdlib ``wave`` reader,
  hand-assembled fixture images, an independent reference IDCT and a
  numpy recount.
- **Stub for formats needing a codec library** (MP3/H.264,
  arithmetic-coded/12-bit JPEG — different entropy coders, not more
  byte math) — deterministic byte-level features, or
  NotImplementedError on the real-codec path. Swapping the stub for
  Pillow/torchaudio changes one function body, not the plan.

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


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a decode-stage input to the session's default
    parallelism. Decode stages are CPU-dense per ROW while their
    inputs are tiny in BYTES (payloads are synthesized executor-side
    from doc_id, or are small relative to the decode work), so
    Spark's byte-based file splitting under-partitions them: a 50 MB
    documents file is ONE split under the default 128 MB
    maxPartitionBytes, which serializes the whole corpus decode into
    a single task no matter how many executors exist (measured: the
    100k-doc JPEG decode ran 292 s on one core with 31 idle —
    SCALING.md round-10). The round-robin shuffle this adds moves
    only the tiny input rows and unlocks full-cluster decode; with
    real blob-dominated payloads at 100 TB the byte-based split
    sizes partitions correctly on its own.

    GATED on the input's actual split count (VERDICT r10 item 8):
    when the scan already yields >= defaultParallelism partitions —
    the sf0.1 bench reality, where Spark's totalBytes/parallelism
    split term kicks in — the round-robin shuffle is pure overhead
    (measured 1.52x on multimodal_wav_decode) and is skipped; the
    under-split case (few big files, e.g. the coalesce(4) rehearsal
    corpora) still spreads. getNumPartitions is plan-time driver
    metadata, no job."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal table shape from ``documents``: one
    binary payload per row plus typed metadata — the schema an
    ingestion job would produce from an object store."""
    d = _spread(load_table(spark, sf_dir, "documents"))
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


# ---------------------------------------------------------------------------
# Real codec-free decoders: WAV-PCM and 24-bit BMP
# ---------------------------------------------------------------------------

#: WAV fixture shape: 16-bit mono PCM, deterministic samples from the
#: doc_id so the DuckDB oracle can re-derive them without parsing bytes
WAV_RATE = 8000
WAV_N = 256
WAV_MUL = 2_654_435_761
WAV_INC = 40_503

#: BMP fixture shape: 24-bit, odd width so every stored row carries
#: real padding (17*3 = 51 → 52-byte stride), bottom-up row order
BMP_W = 17
BMP_H = 8


def make_wav_codec():
    """Factory returning ``(build, parse)`` pure functions for 16-bit
    mono PCM WAV. Defined inside a factory (not module level) so
    mapInPandas closures capture them by value — cloudpickle then
    ships the code to Python workers that never import this package.

    ``build(doc_id)`` emits a genuine RIFF/WAVE file: RIFF size, fmt
    chunk (PCM, 1 channel, 8 kHz, 16-bit, correct block-align/byte-
    rate) and a data chunk of WAV_N little-endian int16 samples
    ``((doc_id*WAV_MUL + i*WAV_INC) % 65536) - 32768``.

    ``parse(payload)`` is a real chunk-walking reader: validates the
    RIFF/WAVE magic, walks chunks honoring their declared sizes (and
    the odd-size pad byte), requires audio_format == 1 (PCM) and
    16-bit samples, and decodes the data chunk — it is NOT a fixed-
    offset peek, so extra chunks (LIST/INFO) would be skipped
    correctly. Raises NotImplementedError for non-PCM formats (the
    honest codec boundary) and ValueError for malformed bytes."""
    import struct

    rate, n, mul, inc = WAV_RATE, WAV_N, WAV_MUL, WAV_INC

    def build(doc_id: int) -> bytes:
        import numpy as np

        i = np.arange(n, dtype=np.int64)
        samples = ((doc_id * mul + i * inc) % 65536 - 32768).astype("<i2")
        data = samples.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def parse(payload: bytes) -> dict:
        import numpy as np

        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        riff_size = struct.unpack("<I", payload[4:8])[0]
        if riff_size != len(payload) - 8:
            raise ValueError("RIFF size mismatch")
        pos, fmt_chunk, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            csize = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            cbody = payload[pos + 8 : pos + 8 + csize]
            if cid == b"fmt ":
                fmt_chunk = struct.unpack("<HHIIHH", cbody[:16])
            elif cid == b"data":
                data = cbody
            pos += 8 + csize + (csize & 1)  # chunks pad to even
        if fmt_chunk is None or data is None:
            raise ValueError("missing fmt/data chunk")
        audio_format, n_channels, sample_rate, _, block_align, bits = fmt_chunk
        if audio_format != 1:
            raise NotImplementedError(
                f"compressed WAV (format {audio_format}) needs a codec"
            )
        if bits != 16:
            raise NotImplementedError(f"{bits}-bit PCM not wired")
        if block_align != n_channels * 2:
            raise ValueError("block align inconsistent with 16-bit PCM")
        samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
        return {
            "sample_rate": sample_rate,
            "n_channels": n_channels,
            "bits": bits,
            "samples": samples,
        }

    return build, parse


def make_bmp_codec():
    """Factory returning ``(build, parse)`` for 24-bit uncompressed
    BMP (same closure rationale as make_wav_codec).

    ``build(doc_id)`` emits a genuine BMP: BITMAPFILEHEADER ('BM',
    file size, pixel-array offset 54) + BITMAPINFOHEADER (40 bytes,
    positive height → bottom-up) + pixel rows in stored order
    bottom-to-top, each pixel B,G,R with rows padded to 4 bytes.
    Channel values are ``(doc_id*c1 + x*c2 + y*c3) % 256`` per the
    module constants below, with (x, y) in IMAGE coordinates (y = 0 is
    the top row) — so the builder itself must get the bottom-up
    flip right for the parser (and oracle) to agree.

    ``parse(payload)`` validates the magic/header sizes/bpp/
    compression, reads width/height/offset from the headers (not
    assumptions), strips row padding, un-flips bottom-up storage and
    returns H×W×3 RGB arrays. NotImplementedError for compressed or
    non-24-bit files; ValueError for malformed bytes."""
    import struct

    w, h = BMP_W, BMP_H

    def build(doc_id: int) -> bytes:
        import numpy as np

        y, x = np.mgrid[0:h, 0:w]
        r = (doc_id * 3 + x * 7 + y * 13) % 256
        g = (doc_id * 5 + x * 11 + y * 3) % 256
        b = (doc_id * 7 + x * 13 + y * 5) % 256
        stride = (w * 3 + 3) & ~3
        rows = bytearray()
        for yy in range(h - 1, -1, -1):  # bottom-up storage
            row = bytearray()
            for xx in range(w):
                row += bytes(
                    (int(b[yy, xx]), int(g[yy, xx]), int(r[yy, xx]))
                )
            row += b"\x00" * (stride - len(row))
            rows += row
        header = struct.pack(
            "<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54
        ) + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
        )
        return bytes(header) + bytes(rows)

    def parse(payload: bytes) -> dict:
        import numpy as np

        if len(payload) < 54 or payload[:2] != b"BM":
            raise ValueError("not a BMP file")
        _, file_size, _, _, offset = struct.unpack("<2sIHHI", payload[:14])
        if file_size != len(payload):
            raise ValueError("BMP file size mismatch")
        (hdr, width, height, planes, bpp, comp) = struct.unpack(
            "<IiiHHI", payload[14:34]
        )
        if hdr < 40 or planes != 1:
            raise ValueError("unsupported BMP header")
        if comp != 0:
            raise NotImplementedError("compressed BMP needs a codec")
        if bpp != 24:
            raise NotImplementedError(f"{bpp}-bpp BMP not wired")
        bottom_up = height > 0
        height = abs(height)
        stride = (width * 3 + 3) & ~3
        px = np.frombuffer(
            payload, dtype=np.uint8, count=stride * height, offset=offset
        ).reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
        if bottom_up:
            px = px[::-1]
        # stored order is B,G,R
        return {
            "width": width,
            "height": height,
            "rgb": px[:, :, ::-1].astype(np.int64),
        }

    return build, parse


#: PNG fixture geometry — deliberately different from the BMP 17×8 so
#: a copy-pasted oracle or a swapped codec cannot accidentally agree
PNG_W = 19
PNG_H = 11
PNG_PALETTE_SIZE = 256
#: tRNS shorter than the palette on purpose — exercises the spec's
#: default-opaque (255) rule for indices past the table's end
PNG_TRNS_LEN = 64


def make_png_codec():
    """Factory returning ``(build, parse)`` for 8-bit non-interlaced
    PNG — stdlib-only (``zlib`` inflate/deflate + ``struct``), closing
    the round-8 disclosed boundary that PNG sat behind the codec stub:
    the wire format is DEFLATE + per-row byte filters, both pure byte
    math, no external codec needed. JPEG/MP3/H.264 stay honestly
    stubbed (they genuinely need codec libraries).

    ``build(doc_id, ctype=2)`` emits a genuine PNG: 8-byte signature,
    IHDR (8-bit, no interlace), for color type 3 a 256-entry PLTE and
    a SHORT (64-entry) tRNS — shorter than the palette on purpose, so
    the decode must honor the spec's default-opaque rule for the
    tail — one IDAT holding the zlib-compressed filtered scanlines,
    IEND — every chunk with a correct CRC32. All five 8-bit color
    types are wired (0 gray, 2 truecolor, 3 palette, 4 gray+alpha,
    6 RGBA); channel values are ``(doc_id*c + x*c' + y*c'') % 256``
    per the formulas in the oracle, with (x, y) in image coordinates
    (PNG stores top-down — no BMP-style flip), and palette entry i is
    ``((i*29+1)%256, (i*31+2)%256, (i*37+3)%256)`` with tRNS alpha
    ``(i*41+5)%256`` for i < 64. Row y is filtered with type
    ``y % 5``, so every decode exercises ALL FIVE spec filters (None,
    Sub, Up, Average, Paeth) at every bpp in {1, 2, 3, 4} — a wrong
    reconstruction in any one of them shifts pixels in ~1/5 of the
    rows and fails the value hash.

    ``parse(payload)`` validates the signature, walks chunks by
    (length, type, data, CRC) VERIFYING each CRC32, reads geometry
    from IHDR, concatenates IDAT payloads, inflates, checks the exact
    decompressed size, un-filters row by row per the spec's
    reconstruction functions (bpp = channel count at depth 8), looks
    indices up in PLTE/tRNS for color type 3, and returns H×W×3 RGB
    (color types 2/3/6) or H×W×1 (0/4) arrays plus an H×W ``alpha``
    array (types 3-with-tRNS/4/6; None otherwise). Since r10 the
    decoder is SPEC-COMPLETE across transport axes: **Adam7
    interlace** (seven independently-filtered passes, each unfiltered
    with its own zero prior row and scattered back onto the full
    grid — a pure transport permutation, so the decoded image is
    identical to the progressive layout's), **16-bit depth**
    (big-endian sample pairs; the five filters operate on BYTES with
    bpp = channels × 2 per the spec, so the reconstruction math is
    unchanged), and **sub-byte depths 1/2/4** (MSB-first bit
    unpacking with per-row zero padding; filter bpp floors at 1).
    Every valid depth × color-type × interlace combination decodes;
    everything else is a loud ValueError (bad magic, CRC mismatch,
    bad zlib stream, size mismatch, unknown filter type, invalid
    color type / interlace / depth or depth-type combination,
    palette images with a missing / ragged / oversized-for-depth /
    overrun PLTE or an oversized tRNS)."""
    import struct
    import zlib

    w, h = PNG_W, PNG_H

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def _filter_image(byte_rows, bpp: int) -> bytearray:
        """Per-row filtered scanlines of one (sub-)image (a list of
        equal-length byte rows): row i gets filter type i % 5 so
        every image (and every Adam7 pass tall enough) exercises all
        five spec filters. Filters operate on BYTES with bpp =
        max(1, channels × depth // 8), per the spec — the same math
        at every depth, including sub-byte packing."""
        if not byte_rows:
            return bytearray()
        rowlen = len(byte_rows[0])
        prior = bytes(rowlen)
        out = bytearray()
        for yy, row in enumerate(byte_rows):
            ft = yy % 5
            out.append(ft)
            if ft == 0:  # None
                filt = row
            elif ft == 1:  # Sub
                filt = bytes(
                    (row[i] - (row[i - bpp] if i >= bpp else 0)) % 256
                    for i in range(rowlen)
                )
            elif ft == 2:  # Up
                filt = bytes(
                    (row[i] - prior[i]) % 256 for i in range(rowlen)
                )
            elif ft == 3:  # Average
                filt = bytes(
                    (
                        row[i]
                        - ((row[i - bpp] if i >= bpp else 0) + prior[i]) // 2
                    )
                    % 256
                    for i in range(rowlen)
                )
            else:  # Paeth
                filt = bytes(
                    (
                        row[i]
                        - _paeth(
                            row[i - bpp] if i >= bpp else 0,
                            prior[i],
                            prior[i - bpp] if i >= bpp else 0,
                        )
                    )
                    % 256
                    for i in range(rowlen)
                )
            out += filt
            prior = row
        return out

    #: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
    ADAM7 = (
        (0, 0, 8, 8),
        (4, 0, 8, 8),
        (0, 4, 4, 8),
        (2, 0, 4, 4),
        (0, 2, 2, 4),
        (1, 0, 2, 2),
        (0, 1, 1, 2),
    )

    def build(
        doc_id: int, ctype: int = 2, interlace: int = 0, depth: int = 8
    ) -> bytes:
        import numpy as np

        mod = 1 << depth
        y, x = np.mgrid[0:h, 0:w]
        r = (doc_id * 11 + x * 5 + y * 17) % mod
        g = (doc_id * 13 + x * 3 + y * 7) % mod
        b = (doc_id * 17 + x * 19 + y * 11) % mod
        a = (doc_id * 7 + x * 13 + y * 3) % mod
        # r doubles as the gray value (type 0/4) and the palette
        # index (type 3) — ONE generating formula per channel slot,
        # mirrored verbatim in the oracle SQL
        channels = {
            0: [r],
            2: [r, g, b],
            3: [r],
            4: [r, a],
            6: [r, g, b, a],
        }[ctype]
        raw = np.stack(channels, axis=2)  # H×W×C sample values
        bpp = max(1, len(channels) * depth // 8)

        def _byte_rows(img) -> list:
            if depth == 16:
                return [r.tobytes() for r in img.astype(">u2")]
            if depth == 8:
                return [r.tobytes() for r in img.astype(np.uint8)]
            # sub-byte: MSB-first bit packing, zero-padded to byte
            # boundary per row (np.packbits pads exactly per spec)
            vals = img[:, :, 0]
            bits = (
                (vals[..., None] >> np.arange(depth - 1, -1, -1)) & 1
            ).astype(np.uint8)
            packed = np.packbits(bits.reshape(img.shape[0], -1), axis=1)
            return [r.tobytes() for r in packed]

        if interlace == 0:
            out = _filter_image(_byte_rows(raw), bpp)
        else:
            out = bytearray()
            for x0, y0, dx, dy in ADAM7:
                sub = raw[y0::dy, x0::dx]
                if sub.shape[0] and sub.shape[1]:
                    out += _filter_image(_byte_rows(sub), bpp)
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        ancillary = b""
        if ctype == 3:
            # spec: the palette must not exceed 2^depth entries; the
            # tRNS stays shorter than the palette so the
            # default-opaque tail is exercised at every depth
            n_pal = min(PNG_PALETTE_SIZE, 1 << depth)
            plte = bytes(
                v
                for i in range(n_pal)
                for v in (
                    (i * 29 + 1) % 256,
                    (i * 31 + 2) % 256,
                    (i * 37 + 3) % 256,
                )
            )
            trns = bytes(
                (i * 41 + 5) % 256
                for i in range(min(PNG_TRNS_LEN, n_pal // 2))
            )
            ancillary = _chunk(b"PLTE", plte) + _chunk(b"tRNS", trns)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + ancillary
            + _chunk(b"IDAT", zlib.compress(bytes(out)))
            + _chunk(b"IEND", b"")
        )

    def parse(payload: bytes) -> dict:
        import numpy as np

        if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG file")
        pos = 8
        ihdr = None
        plte = None
        trns = None
        idat = bytearray()
        while pos < len(payload):
            if pos + 8 > len(payload):
                raise ValueError("truncated PNG chunk header")
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if len(data) != length or pos + 12 + length > len(payload):
                raise ValueError("truncated PNG chunk")
            (crc,) = struct.unpack(
                ">I", payload[pos + 8 + length : pos + 12 + length]
            )
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG CRC mismatch in {ctype!r}")
            if ctype == b"IHDR":
                ihdr = data
            elif ctype == b"PLTE":
                plte = data
            elif ctype == b"tRNS":
                trns = data
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if ihdr is None or len(ihdr) != 13:
            raise ValueError("missing or malformed IHDR")
        width, height, depth, ctype_n, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", ihdr
        )
        if comp != 0 or filt != 0:
            raise ValueError("unknown PNG compression/filter method")
        if interlace not in (0, 1):
            raise ValueError(f"invalid PNG interlace method {interlace}")
        if depth not in (1, 2, 4, 8, 16):
            raise ValueError(f"invalid PNG bit depth {depth}")
        if depth < 8 and ctype_n not in (0, 3):
            raise ValueError(
                f"{depth}-bit depth is invalid for color type {ctype_n}"
            )
        if depth == 16 and ctype_n == 3:
            raise ValueError("palette PNG with 16-bit depth is invalid")
        try:
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype_n]
        except KeyError:
            raise ValueError(
                f"invalid PNG color type {ctype_n}"
            ) from None
        if ctype_n == 3:
            if plte is None:
                raise ValueError("palette PNG without a PLTE chunk")
            if len(plte) == 0 or len(plte) % 3 != 0:
                raise ValueError(
                    f"ragged PLTE chunk ({len(plte)} bytes)"
                )
            if len(plte) // 3 > (1 << depth):
                raise ValueError(
                    f"PLTE has {len(plte) // 3} entries; {depth}-bit "
                    f"indices allow at most {1 << depth}"
                )
            if trns is not None and len(trns) > len(plte) // 3:
                raise ValueError(
                    f"tRNS has {len(trns)} entries for a "
                    f"{len(plte) // 3}-entry palette"
                )
        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error as e:
            raise ValueError(f"bad PNG zlib stream: {e}") from e
        bpp = max(1, channels * depth // 8)
        dt = np.dtype(">u2") if depth == 16 else np.uint8

        def _row_bytes(w_: int) -> int:
            return (w_ * channels * depth + 7) // 8

        def _to_px(data: bytes, w_: int, h_: int):
            """Decode reconstructed scanline bytes to an h×w×C sample
            array (MSB-first unpack for sub-byte depths, big-endian
            pairs for 16-bit)."""
            if depth >= 8:
                return np.frombuffer(data, dtype=dt).reshape(
                    h_, w_, channels
                )
            arr = np.frombuffer(data, dtype=np.uint8).reshape(
                h_, _row_bytes(w_)
            )
            bits = np.unpackbits(arr, axis=1)
            vals = (
                bits.reshape(h_, -1, depth)
                * (1 << np.arange(depth - 1, -1, -1))
            ).sum(axis=2)
            return vals[:, :w_].reshape(h_, w_, 1)

        def _unfilter(off: int, w_: int, h_: int) -> tuple[bytes, int]:
            """Reconstruct one (sub-)image's scanlines starting at
            ``off`` in the inflated stream; returns (pixel bytes, new
            offset)."""
            rowlen = _row_bytes(w_)
            need = h_ * (1 + rowlen)
            if off + need > len(raw):
                raise ValueError(
                    f"PNG data size mismatch: need {off + need}, "
                    f"have {len(raw)}"
                )
            prior = bytes(rowlen)
            rows = []
            for yy in range(h_):
                o = off + yy * (1 + rowlen)
                ft = raw[o]
                line = raw[o + 1 : o + 1 + rowlen]
                if ft == 0:
                    rec = bytearray(line)
                elif ft == 1:  # Sub
                    rec = bytearray(rowlen)
                    for i in range(rowlen):
                        rec[i] = (
                            line[i] + (rec[i - bpp] if i >= bpp else 0)
                        ) % 256
                elif ft == 2:  # Up
                    rec = bytearray(
                        (line[i] + prior[i]) % 256 for i in range(rowlen)
                    )
                elif ft == 3:  # Average
                    rec = bytearray(rowlen)
                    for i in range(rowlen):
                        rec[i] = (
                            line[i]
                            + (
                                (rec[i - bpp] if i >= bpp else 0)
                                + prior[i]
                            )
                            // 2
                        ) % 256
                elif ft == 4:  # Paeth
                    rec = bytearray(rowlen)
                    for i in range(rowlen):
                        rec[i] = (
                            line[i]
                            + _paeth(
                                rec[i - bpp] if i >= bpp else 0,
                                prior[i],
                                prior[i - bpp] if i >= bpp else 0,
                            )
                        ) % 256
                else:
                    raise ValueError(f"unknown PNG filter type {ft}")
                prior = bytes(rec)
                rows.append(rec)
            return b"".join(rows), off + need

        if interlace == 0:
            data, end = _unfilter(0, width, height)
            if end != len(raw):
                raise ValueError(
                    f"PNG data size mismatch: {len(raw)} != {end}"
                )
            px = _to_px(data, width, height)
        else:
            # Adam7: seven independently-filtered passes scattered
            # back onto the full grid (empty passes carry no bytes)
            px = np.zeros((height, width, channels), dtype=np.int64)
            end = 0
            for x0, y0, dx, dy in ADAM7:
                pw = max(0, (width - x0 + dx - 1) // dx)
                ph = max(0, (height - y0 + dy - 1) // dy)
                if pw == 0 or ph == 0:
                    continue
                data, end = _unfilter(end, pw, ph)
                px[y0::dy, x0::dx] = _to_px(data, pw, ph)
            if end != len(raw):
                raise ValueError(
                    f"PNG data size mismatch: {len(raw)} != {end}"
                )
        alpha = None
        if ctype_n == 3:
            n_pal = len(plte) // 3
            idx = px[:, :, 0].astype(np.int64)
            if int(idx.max()) >= n_pal:
                raise ValueError(
                    f"palette index {int(idx.max())} >= palette size "
                    f"{n_pal}"
                )
            pal = np.frombuffer(plte, dtype=np.uint8).reshape(n_pal, 3)
            rgb = pal[idx].astype(np.int64)
            if trns is not None:
                # spec: entries past the end of tRNS default to 255
                lut = np.full(n_pal, 255, dtype=np.int64)
                lut[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
                alpha = lut[idx]
        elif ctype_n == 4:
            rgb = px[:, :, :1].astype(np.int64)
            alpha = px[:, :, 1].astype(np.int64)
        elif ctype_n == 6:
            rgb = px[:, :, :3].astype(np.int64)
            alpha = px[:, :, 3].astype(np.int64)
        else:
            rgb = px.astype(np.int64)
        return {
            "width": width,
            "height": height,
            "color_type": ctype_n,
            "depth": depth,
            "interlaced": interlace == 1,
            "rgb": rgb,
            "alpha": alpha,
        }

    return build, parse


def png_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One genuine 8-bit truecolor PNG payload per document, built
    executor-side."""
    build, _ = make_png_codec()

    def encode(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [build(int(d)) for d in pdf["doc_id"]],
                }
            )

    d = _spread(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(encode, schema="media_id long, payload binary")


def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end-to-end: build genuine zlib-deflated,
    per-row-filtered PNG bytes (all five filter types in every image),
    parse them back through the chunk-walking, CRC-verifying,
    unfiltering reader, and emit per-media image stats. The oracle
    re-derives the expected stats from the generating pixel formula —
    a mistake anywhere in the deflate round-trip, the CRC math, or any
    of the five filter reconstructions shifts pixels and fails the
    hash. ``top_row_sum`` pins row ORDER (PNG is top-down — a decoder
    that flipped rows BMP-style would pass the means and fail this).

    At 100 TB: one linear Arrow pipeline, payloads stay columnar on
    executors, output is one stats row per media — identical plan
    shape to the WAV/BMP decodes."""
    build, parse = make_png_codec()

    def decode(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {
                "media_id": [],
                "width": [],
                "height": [],
                "mean_r": [],
                "mean_g": [],
                "mean_b": [],
                "top_row_sum": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = parse(bytes(payload))
                rgb = img["rgb"]
                npx = img["width"] * img["height"]
                rows["media_id"].append(mid)
                rows["width"].append(img["width"])
                rows["height"].append(img["height"])
                rows["mean_r"].append(float(np.sum(rgb[:, :, 0])) / npx)
                rows["mean_g"].append(float(np.sum(rgb[:, :, 1])) / npx)
                rows["mean_b"].append(float(np.sum(rgb[:, :, 2])) / npx)
                rows["top_row_sum"].append(int(np.sum(rgb[0])))
            yield pd.DataFrame(rows)

    media = png_media_table(spark, sf_dir)
    out = media.mapInPandas(
        decode,
        schema=(
            "media_id long, width long, height long, mean_r double, "
            "mean_g double, mean_b double, top_row_sum long"
        ),
    )
    from mpi_mapreduce_spark.functions import exact as ex

    return out.select(
        "media_id",
        "width",
        "height",
        ex.quantize(F.col("mean_r"), 6).alias("mean_r"),
        ex.quantize(F.col("mean_g"), 6).alias("mean_g"),
        ex.quantize(F.col("mean_b"), 6).alias("mean_b"),
        "top_row_sum",
    )


def wav_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One genuine WAV-PCM payload per document, built executor-side
    (Arrow batches; the driver never sees a payload)."""
    build, _ = make_wav_codec()

    def encode(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [build(int(d)) for d in pdf["doc_id"]],
                }
            )

    d = _spread(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(encode, schema="media_id long, payload binary")


def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV-PCM decode end-to-end: build genuine RIFF bytes, parse
    them back with the chunk-walking reader, and emit per-media audio
    stats. The oracle re-derives the samples from the generating
    formula — a header/layout/endianness mistake anywhere in the
    encode-parse round trip shifts every decoded sample and fails the
    hash. RMS is exact-integer square sums (≤ 2^38, order-independent
    in double) → one division → sqrt → the repo's scale-6 quantize.

    At 100 TB: encode+decode is one linear Arrow pipeline; payloads
    stay columnar on executors, output is a small stats row per
    media."""
    build, parse = make_wav_codec()

    def decode(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {
                "media_id": [],
                "sample_rate": [],
                "n_channels": [],
                "bits": [],
                "n_samples": [],
                "peak": [],
                "rms": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w = parse(bytes(payload))
                s = w["samples"]
                rows["media_id"].append(mid)
                rows["sample_rate"].append(w["sample_rate"])
                rows["n_channels"].append(w["n_channels"])
                rows["bits"].append(w["bits"])
                rows["n_samples"].append(len(s))
                rows["peak"].append(int(np.max(np.abs(s))) if len(s) else 0)
                rows["rms"].append(
                    float(np.sqrt(np.sum((s * s).astype(np.float64)) / len(s)))
                    if len(s)
                    else 0.0
                )
            yield pd.DataFrame(rows)

    media = wav_media_table(spark, sf_dir)
    out = media.mapInPandas(
        decode,
        schema=(
            "media_id long, sample_rate long, n_channels long, bits long, "
            "n_samples long, peak long, rms double"
        ),
    )
    from mpi_mapreduce_spark.functions import exact as ex

    return out.select(
        "media_id",
        "sample_rate",
        "n_channels",
        "bits",
        "n_samples",
        "peak",
        ex.quantize(F.col("rms"), 6).alias("rms"),
    )


#: naive integer decimation factor for the audio downsample op
DECIM_FACTOR = 4


def multimodal_audio_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer decimation (every DECIM_FACTOR-th sample) over
    genuinely decoded WAV-PCM audio — the downsample step a
    frame-rate/bandwidth normalizer runs before feature extraction.
    Emits per-media in/out sample counts, decimated peak, and RMS
    before/after.

    Deliberately NAIVE decimation: a production resampler low-pass
    filters first (an FIR is more pure byte math, not a codec
    dependency — left for the day the op needs it); what this op pins
    is the decode → stride-indexing → stats pipeline, with the oracle
    re-deriving the kept samples arithmetically so an off-by-one in
    the stride start or the parse shifts the hash. Same linear Arrow
    pipeline shape as multimodal_wav_decode."""
    _, parse = make_wav_codec()
    k = DECIM_FACTOR

    def decim(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {
                "media_id": [],
                "n_in": [],
                "n_out": [],
                "peak_out": [],
                "rms_in": [],
                "rms_out": [],
            }

            def rms(x):
                return (
                    float(np.sqrt(np.sum((x * x).astype(np.float64)) / len(x)))
                    if len(x)
                    else 0.0
                )

            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s = parse(bytes(payload))["samples"]
                d = s[::k]
                rows["media_id"].append(mid)
                rows["n_in"].append(len(s))
                rows["n_out"].append(len(d))
                rows["peak_out"].append(
                    int(np.max(np.abs(d))) if len(d) else 0
                )
                rows["rms_in"].append(rms(s))
                rows["rms_out"].append(rms(d))
            yield pd.DataFrame(rows)

    media = wav_media_table(spark, sf_dir)
    out = media.mapInPandas(
        decim,
        schema=(
            "media_id long, n_in long, n_out long, peak_out long, "
            "rms_in double, rms_out double"
        ),
    )
    from mpi_mapreduce_spark.functions import exact as ex

    return out.select(
        "media_id",
        "n_in",
        "n_out",
        "peak_out",
        ex.quantize(F.col("rms_in"), 6).alias("rms_in"),
        ex.quantize(F.col("rms_out"), 6).alias("rms_out"),
    )


def bmp_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One genuine 24-bit BMP payload per document, built
    executor-side."""
    build, _ = make_bmp_codec()

    def encode(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [build(int(d)) for d in pdf["doc_id"]],
                }
            )

    d = _spread(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(encode, schema="media_id long, payload binary")


def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 24-bit BMP decode end-to-end: build genuine BMP bytes
    (BGR, padded rows, bottom-up), parse them back, and emit per-media
    image stats. ``top_row_sum`` pins the row-order/flip logic — the
    image's top row is the LAST stored row, so a parser that skipped
    the bottom-up un-flip (or mis-sized the padding) hash-fails.
    Channel means are exact integer sums over one division, then
    quantized."""
    build, parse = make_bmp_codec()

    def decode(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {
                "media_id": [],
                "width": [],
                "height": [],
                "mean_r": [],
                "mean_g": [],
                "mean_b": [],
                "top_row_sum": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = parse(bytes(payload))
                rgb = img["rgb"]
                npx = img["width"] * img["height"]
                rows["media_id"].append(mid)
                rows["width"].append(img["width"])
                rows["height"].append(img["height"])
                rows["mean_r"].append(float(np.sum(rgb[:, :, 0])) / npx)
                rows["mean_g"].append(float(np.sum(rgb[:, :, 1])) / npx)
                rows["mean_b"].append(float(np.sum(rgb[:, :, 2])) / npx)
                rows["top_row_sum"].append(int(np.sum(rgb[0])))
            yield pd.DataFrame(rows)

    media = bmp_media_table(spark, sf_dir)
    out = media.mapInPandas(
        decode,
        schema=(
            "media_id long, width long, height long, mean_r double, "
            "mean_g double, mean_b double, top_row_sum long"
        ),
    )
    from mpi_mapreduce_spark.functions import exact as ex

    return out.select(
        "media_id",
        "width",
        "height",
        ex.quantize(F.col("mean_r"), 6).alias("mean_r"),
        ex.quantize(F.col("mean_g"), 6).alias("mean_g"),
        ex.quantize(F.col("mean_b"), 6).alias("mean_b"),
        "top_row_sum",
    )


def multimodal_pixel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bin grayscale histogram per image over the REAL BMP decode
    path — the classic image statistic (exposure/contrast screens,
    near-duplicate image prefilters) computed from genuinely parsed
    pixel bytes, not metadata. gray = (r+g+b)//3 and bin = gray//16
    are pure integer arithmetic, so the oracle re-derives the exact
    counts from the synthetic pixel formula without any decoder.

    Plan: one Arrow decode pass emitting ≤16 rows per image (the
    histogram is aggregated inside the UDF with numpy bincount —
    pixels never become rows), then nothing else. Linear; output is
    images × occupied bins."""
    build, parse = make_bmp_codec()

    def decode(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            mids, bins, ns = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = parse(bytes(payload))
                rgb = img["rgb"].astype(np.int64)
                gray = (rgb[:, :, 0] + rgb[:, :, 1] + rgb[:, :, 2]) // 3
                counts = np.bincount((gray // 16).ravel(), minlength=16)
                for b in range(16):
                    if counts[b]:
                        mids.append(mid)
                        bins.append(b)
                        ns.append(int(counts[b]))
            yield pd.DataFrame({"media_id": mids, "bin": bins, "n": ns})

    media = bmp_media_table(spark, sf_dir)
    return media.mapInPandas(
        decode, schema="media_id long, bin long, n long"
    )


def multimodal_png_palette_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL palette/alpha PNG decode: per document, build one PNG of
    each remaining 8-bit color type — 3 (palette via PLTE, with a
    SHORT tRNS so the default-opaque tail is exercised), 4
    (gray+alpha), 6 (RGBA) — and decode through the same
    chunk-walking, CRC-verifying, five-filter reader as the truecolor
    query. Emits one stats row per (media, color_type): channel means
    INCLUDING alpha and a top-row checksum over r+g+b+a (gray
    replicated ×3 for type 4). The oracle re-derives everything from
    the generating formulas — palette lookups included — so only a
    byte-exact decode with correct PLTE/tRNS semantics agrees.

    At 100 TB: identical plan shape to multimodal_png_decode — one
    linear Arrow pipeline, three payloads per doc built and parsed
    executor-side, one output row each."""
    build, parse = make_png_codec()

    def decode(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {
                "media_id": [],
                "color_type": [],
                "mean_r": [],
                "mean_g": [],
                "mean_b": [],
                "mean_a": [],
                "top_row_sum": [],
            }
            for did in pdf["doc_id"]:
                for ct in (3, 4, 6):
                    img = parse(build(int(did), ctype=ct))
                    rgb, alpha = img["rgb"], img["alpha"]
                    npx = img["width"] * img["height"]
                    if rgb.shape[2] == 1:  # type 4: gray → r=g=b
                        rgb = np.repeat(rgb, 3, axis=2)
                    rows["media_id"].append(int(did))
                    rows["color_type"].append(ct)
                    rows["mean_r"].append(float(np.sum(rgb[:, :, 0])) / npx)
                    rows["mean_g"].append(float(np.sum(rgb[:, :, 1])) / npx)
                    rows["mean_b"].append(float(np.sum(rgb[:, :, 2])) / npx)
                    rows["mean_a"].append(float(np.sum(alpha)) / npx)
                    rows["top_row_sum"].append(
                        int(np.sum(rgb[0])) + int(np.sum(alpha[0]))
                    )
            yield pd.DataFrame(rows)

    d = _spread(load_table(spark, sf_dir, "documents").select("doc_id"))
    out = d.mapInPandas(
        decode,
        schema=(
            "media_id long, color_type long, mean_r double, "
            "mean_g double, mean_b double, mean_a double, "
            "top_row_sum long"
        ),
    )
    from mpi_mapreduce_spark.functions import exact as ex

    return out.select(
        "media_id",
        "color_type",
        ex.quantize(F.col("mean_r"), 6).alias("mean_r"),
        ex.quantize(F.col("mean_g"), 6).alias("mean_g"),
        ex.quantize(F.col("mean_b"), 6).alias("mean_b"),
        ex.quantize(F.col("mean_a"), 6).alias("mean_a"),
        "top_row_sum",
    )


def multimodal_png_interlaced_16bit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL Adam7 + 16-bit PNG decode: per document, build (a) an
    Adam7-interlaced 8-bit truecolor PNG, (b) a progressive 16-bit
    grayscale PNG, (c) an Adam7-interlaced 16-bit RGBA PNG — the
    everything-at-once case — and decode through the same
    chunk-walking, CRC-verifying reader. Interlacing is a transport
    permutation, so variant (a) must reproduce exactly the truecolor
    stats `multimodal_png_decode` attests on the progressive layout —
    a wrong pass offset/stride or a filter prior leaking across
    passes scrambles pixels and fails the hash; the 16-bit variants
    pin the big-endian sample pairing (mod-65536 formulas). Variants
    without an alpha channel report mean_a = 0.

    At 100 TB: same linear Arrow pipeline as the sibling PNG
    queries."""
    build, parse = make_png_codec()

    def decode(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        variants = (
            ("adam7", dict(ctype=2, interlace=1)),
            ("gray16", dict(ctype=0, depth=16)),
            ("rgba16i", dict(ctype=6, depth=16, interlace=1)),
        )
        for pdf in batches:
            rows = {
                "media_id": [],
                "variant": [],
                "mean_r": [],
                "mean_g": [],
                "mean_b": [],
                "mean_a": [],
                "top_row_sum": [],
            }
            for did in pdf["doc_id"]:
                for vname, kw in variants:
                    img = parse(build(int(did), **kw))
                    rgb, alpha = img["rgb"], img["alpha"]
                    npx = img["width"] * img["height"]
                    if rgb.shape[2] == 1:  # grayscale → r=g=b
                        rgb = np.repeat(rgb, 3, axis=2)
                    rows["media_id"].append(int(did))
                    rows["variant"].append(vname)
                    rows["mean_r"].append(float(np.sum(rgb[:, :, 0])) / npx)
                    rows["mean_g"].append(float(np.sum(rgb[:, :, 1])) / npx)
                    rows["mean_b"].append(float(np.sum(rgb[:, :, 2])) / npx)
                    rows["mean_a"].append(
                        0.0 if alpha is None else float(np.sum(alpha)) / npx
                    )
                    rows["top_row_sum"].append(
                        int(np.sum(rgb[0]))
                        + (0 if alpha is None else int(np.sum(alpha[0])))
                    )
            yield pd.DataFrame(rows)

    d = _spread(load_table(spark, sf_dir, "documents").select("doc_id"))
    out = d.mapInPandas(
        decode,
        schema=(
            "media_id long, variant string, mean_r double, "
            "mean_g double, mean_b double, mean_a double, "
            "top_row_sum long"
        ),
    )
    from mpi_mapreduce_spark.functions import exact as ex

    return out.select(
        "media_id",
        "variant",
        ex.quantize(F.col("mean_r"), 6).alias("mean_r"),
        ex.quantize(F.col("mean_g"), 6).alias("mean_g"),
        ex.quantize(F.col("mean_b"), 6).alias("mean_b"),
        ex.quantize(F.col("mean_a"), 6).alias("mean_a"),
        "top_row_sum",
    )


def multimodal_png_subbyte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL sub-byte PNG decode — the LAST spec boundary closed: per
    document, build a 1-bit grayscale, a 2-bit grayscale under Adam7
    (sub-byte packing × interlacing composed), a 4-bit grayscale, and
    a 4-bit palette PNG (16-entry PLTE, 8-entry tRNS so the
    default-opaque tail is exercised inside a nibble), and decode
    through the same reader. MSB-first bit unpacking with per-row
    zero padding is the new math under test; a bit-order or padding
    mistake shifts every sample and fails the hash. With this the
    decoder covers EVERY valid PNG depth/color-type/interlace
    combination.

    At 100 TB: same linear Arrow pipeline as the sibling PNG
    queries."""
    build, parse = make_png_codec()

    def decode(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        variants = (
            ("gray1", dict(ctype=0, depth=1)),
            ("gray2i", dict(ctype=0, depth=2, interlace=1)),
            ("gray4", dict(ctype=0, depth=4)),
            ("pal4", dict(ctype=3, depth=4)),
        )
        for pdf in batches:
            rows = {
                "media_id": [],
                "variant": [],
                "mean_r": [],
                "mean_g": [],
                "mean_b": [],
                "mean_a": [],
                "top_row_sum": [],
            }
            for did in pdf["doc_id"]:
                for vname, kw in variants:
                    img = parse(build(int(did), **kw))
                    rgb, alpha = img["rgb"], img["alpha"]
                    npx = img["width"] * img["height"]
                    if rgb.shape[2] == 1:
                        rgb = np.repeat(rgb, 3, axis=2)
                    rows["media_id"].append(int(did))
                    rows["variant"].append(vname)
                    rows["mean_r"].append(float(np.sum(rgb[:, :, 0])) / npx)
                    rows["mean_g"].append(float(np.sum(rgb[:, :, 1])) / npx)
                    rows["mean_b"].append(float(np.sum(rgb[:, :, 2])) / npx)
                    rows["mean_a"].append(
                        0.0 if alpha is None else float(np.sum(alpha)) / npx
                    )
                    rows["top_row_sum"].append(
                        int(np.sum(rgb[0]))
                        + (0 if alpha is None else int(np.sum(alpha[0])))
                    )
            yield pd.DataFrame(rows)

    d = _spread(load_table(spark, sf_dir, "documents").select("doc_id"))
    out = d.mapInPandas(
        decode,
        schema=(
            "media_id long, variant string, mean_r double, "
            "mean_g double, mean_b double, mean_a double, "
            "top_row_sum long"
        ),
    )
    from mpi_mapreduce_spark.functions import exact as ex

    return out.select(
        "media_id",
        "variant",
        ex.quantize(F.col("mean_r"), 6).alias("mean_r"),
        ex.quantize(F.col("mean_g"), 6).alias("mean_g"),
        ex.quantize(F.col("mean_b"), 6).alias("mean_b"),
        ex.quantize(F.col("mean_a"), 6).alias("mean_a"),
        "top_row_sum",
    )


#: baseline-JPEG fixture geometry: 4×2 luma blocks, 2×1 MCUs at 4:2:0
JPEG_W = 32
JPEG_H = 16


def make_jpeg_codec():
    """Build (build, parse, encode, encode_progressive) for REAL
    baseline + progressive JPEG (the public ITU-T T.81 spec) —
    stdlib + numpy only, no codec library.

    ``encode(planes, sampling, restart_interval=0, qtab=None)`` writes
    a genuine baseline JFIF stream: level shift, 8×8 float FDCT,
    quantization (all-ones table by default — lossless for the
    blockwise-constant fixtures, arbitrary tables for pytest), T.81
    zigzag, canonical-Huffman entropy coding with DC prediction,
    run/size AC symbols (ZRL + EOB), 0xFF00 byte stuffing, 1-bit
    flush padding, and optional DRI/RSTn restart intervals. The
    Huffman tables are GENERATED degenerate-but-valid canonical
    tables (all 12 DC categories at 4 bits, all 162 AC run/size
    symbols at 8 bits) — suboptimal compression, zero table-constant
    baggage, and the decoder still exercises the full canonical-code
    machinery because it rebuilds codes from the DHT segment like any
    other file's.

    ``parse(payload)`` is the general decoder: marker walk (APPn/COM
    skipped, DQT/DHT accumulate multi-table segments, SOF0/1, DRI,
    SOS), canonical-Huffman decode rebuilt from DHT bits/values, DC
    prediction + T.81 EXTEND sign recovery, dequantize + de-zigzag,
    float-matrix IDCT, +128 level shift, clamp/round, restart-marker
    realignment with predictor reset, chroma upsampling by
    replication, and JFIF YCbCr→RGB (floor(x+0.5) rounding, mirrored
    verbatim in the oracle SQL). Grayscale, 4:4:4 and 4:2:0 all
    decode; progressive (SOF2) decodes through the multi-scan path
    (round 11 — see ``encode_progressive``); 12-bit precision rides
    the same paths (round 11); sequential (SOF9) AND progressive
    (SOF10) ARITHMETIC coding encode and decode through the T.81 QM
    coder (round 12 — see ``encode_arith`` /
    ``encode_arith_progressive``); LOSSLESS (SOF3) predictive coding
    encodes and decodes per Annex H (round 12 — see
    ``encode_lossless``); LOSSLESS ARITHMETIC (SOF11) composes the
    two — Annex-H prediction entropy-coded by the QM coder under the
    H.1.2.3 2-D conditioned DC model (round 13 — see
    ``encode_lossless_arith``); the remaining processes —
    differential/hierarchical — raise
    NotImplementedError; everything
    malformed — bad SOI, truncated segments or entropy stream, a
    marker inside the entropy segment, missing quant/Huffman tables,
    invalid Huffman codes, DC category overflow, AC index overrun,
    wrong RSTn, missing EOI — raises a descriptive ValueError.

    ``build(doc_id, mode)`` assembles the oracle fixtures: planes are
    CONSTANT per 8×8 block (per MCU for 4:2:0 chroma), so every DCT
    is DC-only and the decode is bit-exact against the generating
    formulas — while pytest drives ``encode`` with arbitrary images
    to exercise the AC path against an independent reference IDCT."""
    import math
    import struct

    w, h = JPEG_W, JPEG_H

    #: 8×8 DCT-II basis rows A[u][x] = c(u)/2 · cos((2x+1)uπ/16)
    _a_rows = [
        [
            0.5
            * ((1 / math.sqrt(2)) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]

    #: T.81 zigzag: diagonals by sum, odd diagonals walk row-ascending
    _zz = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )

    def _canonical_codes(bits, vals):
        """(BITS[1..16], HUFFVAL) → {symbol: (code, len)} per T.81 C.2."""
        codes = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[vals[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        return codes

    # generated degenerate-but-valid tables (see factory docstring)
    _dc_bits = [0, 0, 0, 12] + [0] * 12
    _dc_vals = list(range(12))
    _ac_bits = [0] * 7 + [162] + [0] * 8
    _ac_vals = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    _dc_codes = _canonical_codes(_dc_bits, _dc_vals)
    _ac_codes = _canonical_codes(_ac_bits, _ac_vals)
    # 12-bit twins: DC categories reach 15 (|diff| ≤ 8·4095 under an
    # all-ones quantizer), AC sizes reach 14 (T.81 F.1.2.2.1 note)
    _dc_bits12 = [0, 0, 0, 0, 16] + [0] * 11
    _dc_vals12 = list(range(16))
    _ac_bits12 = [0] * 8 + [226] + [0] * 7
    _ac_vals12 = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 15)
    ]
    _dc_codes12 = _canonical_codes(_dc_bits12, _dc_vals12)
    _ac_codes12 = _canonical_codes(_ac_bits12, _ac_vals12)

    def _segment(marker: int, payload: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + struct.pack(">H", len(payload) + 2)
            + payload
        )

    class _BitWriter:
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, code: int, length: int) -> None:
            self.acc = (self.acc << length) | (code & ((1 << length) - 1))
            self.n += length
            while self.n >= 8:
                b = (self.acc >> (self.n - 8)) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.n -= 8
            self.acc &= (1 << self.n) - 1

        def flush(self) -> None:
            if self.n:
                pad = 8 - self.n
                self.put((1 << pad) - 1, pad)  # 1-fill per spec

    def _category(v: int) -> int:
        m = abs(v)
        n = 0
        while m:
            n += 1
            m >>= 1
        return n

    def encode(
        planes,
        sampling,
        restart_interval: int = 0,
        qtab=None,
        precision: int = 8,
    ) -> bytes:
        """planes: HxW sample arrays, values in [0, 2^precision)
        (1 = gray, 3 = Y/Cb/Cr at their own resolutions); sampling:
        (h, v) factor per plane. ``precision`` 8 emits baseline SOF0;
        12 emits EXTENDED SEQUENTIAL SOF1 (T.81: baseline is 8-bit
        only) with the 16-category DC / 14-size AC tables and a 2048
        level shift. A quant table with any entry > 255 is serialized
        as a 16-bit (Pq=1) DQT."""
        import numpy as np

        A = np.asarray(_a_rows)
        if precision not in (8, 12):
            raise ValueError(f"unsupported JPEG precision {precision}")
        if qtab is None:
            qtab = np.ones((8, 8), dtype=np.int64)
        qtab = np.asarray(qtab, dtype=np.int64)
        dc_codes = _dc_codes if precision == 8 else _dc_codes12
        ac_codes = _ac_codes if precision == 8 else _ac_codes12
        shift = float(1 << (precision - 1))
        ncomp = len(planes)
        hmax = max(hh for hh, vv in sampling)
        vmax = max(vv for hh, vv in sampling)
        H, W = planes[0].shape
        out = bytearray(b"\xff\xd8")  # SOI
        out += _segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        if int(qtab.max()) > 255:
            out += _segment(
                0xDB,
                bytes([0x10])
                + b"".join(
                    struct.pack(">H", int(qtab[r][c])) for r, c in _zz
                ),
            )
        else:
            out += _segment(
                0xDB, bytes([0]) + bytes(int(qtab[r][c]) for r, c in _zz)
            )
        sof = struct.pack(">BHHB", precision, H, W, ncomp)
        for i, (hh, vv) in enumerate(sampling):
            sof += bytes([i + 1, (hh << 4) | vv, 0])
        out += _segment(0xC0 if precision == 8 else 0xC1, sof)
        if precision == 8:
            dht = bytes([0x00]) + bytes(_dc_bits) + bytes(_dc_vals)
            dht += bytes([0x10]) + bytes(_ac_bits) + bytes(_ac_vals)
        else:
            dht = bytes([0x00]) + bytes(_dc_bits12) + bytes(_dc_vals12)
            dht += bytes([0x10]) + bytes(_ac_bits12) + bytes(_ac_vals12)
        out += _segment(0xC4, dht)
        if restart_interval:
            out += _segment(0xDD, struct.pack(">H", restart_interval))
        sos = bytes([ncomp])
        for i in range(ncomp):
            sos += bytes([i + 1, 0x00])
        sos += bytes([0, 63, 0])
        out += _segment(0xDA, sos)

        mcux = (W + 8 * hmax - 1) // (8 * hmax)
        mcuy = (H + 8 * vmax - 1) // (8 * vmax)
        padded_planes = []
        for (hh, vv), plane in zip(sampling, planes):
            bw, bh = mcux * hh, mcuy * vv
            padded = np.zeros((bh * 8, bw * 8), dtype=np.int64)
            ph, pw = plane.shape
            padded[:ph, :pw] = plane
            if pw < bw * 8:  # edge-replicate so pad DCTs stay DC-ish
                padded[:ph, pw:] = np.asarray(plane)[:, -1:]
            if ph < bh * 8:
                padded[ph:, :] = padded[ph - 1 : ph, :]
            padded_planes.append(padded)

        wtr = _BitWriter()
        pred = [0] * ncomp
        mcu_count = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    wtr.flush()
                    wtr.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    pred = [0] * ncomp
                for ci, (hh, vv) in enumerate(sampling):
                    for by in range(vv):
                        for bx in range(hh):
                            y0 = (my * vv + by) * 8
                            x0 = (mx * hh + bx) * 8
                            blk = padded_planes[ci][
                                y0 : y0 + 8, x0 : x0 + 8
                            ]
                            S = A @ (blk.astype(np.float64) - shift) @ A.T
                            q = np.floor(S / qtab + 0.5).astype(np.int64)
                            diff = int(q[0, 0]) - pred[ci]
                            pred[ci] = int(q[0, 0])
                            n = _category(diff)
                            c, ln = dc_codes[n]
                            wtr.put(c, ln)
                            if n:  # T.81 F.1.2.1: n LSBs, negatives offset
                                wtr.put(
                                    diff if diff >= 0 else diff + (1 << n) - 1,
                                    n,
                                )
                            zzvals = [int(q[r, c2]) for (r, c2) in _zz[1:]]
                            last_nz = -1
                            for i, v2 in enumerate(zzvals):
                                if v2:
                                    last_nz = i
                            run = 0
                            for i in range(last_nz + 1):
                                v2 = zzvals[i]
                                if v2 == 0:
                                    run += 1
                                    continue
                                while run > 15:
                                    c, ln = ac_codes[0xF0]  # ZRL
                                    wtr.put(c, ln)
                                    run -= 16
                                n = _category(v2)
                                c, ln = ac_codes[(run << 4) | n]
                                wtr.put(c, ln)
                                wtr.put(
                                    v2 if v2 >= 0 else v2 + (1 << n) - 1, n
                                )
                                run = 0
                            if last_nz < 62:
                                c, ln = ac_codes[0x00]  # EOB
                                wtr.put(c, ln)
                mcu_count += 1
        wtr.flush()
        out += wtr.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    def encode_progressive(planes, sampling, qtab=None) -> bytes:
        """Progressive (SOF2) twin of ``encode``: same FDCT +
        quantization + canonical tables, coefficients delivered over
        the classic six-scan spectral-selection + successive-
        approximation schedule —

        1. DC first, interleaved, Al=1 (point transform: arithmetic
           shift, T.81 G.1.2.1);
        2. per component: AC first, band 1..63, Al=1 (point transform:
           truncate toward zero, G.1.2.2), EOB0-per-block;
        3. DC refinement, interleaved, Ah=1→Al=0 (one raw bit/block);
        4. per component: AC refinement, band 1..63, Ah=1→Al=0
           (G.1.2.3: newly-significant run/1 symbols + sign bit,
           correction bits appended for already-significant
           coefficients passed over).

        The schedule reconstructs coefficients EXACTLY (both
        approximation levels delivered), so a progressive stream
        decodes bit-identically to its baseline twin — the equality
        pytest and the registered query's closed-form oracle both
        lean on that."""
        import numpy as np

        A = np.asarray(_a_rows)
        if qtab is None:
            qtab = np.ones((8, 8), dtype=np.int64)
        qtab = np.asarray(qtab, dtype=np.int64)
        ncomp = len(planes)
        hmax = max(hh for hh, vv in sampling)
        vmax = max(vv for hh, vv in sampling)
        H, W = planes[0].shape
        mcux = (W + 8 * hmax - 1) // (8 * hmax)
        mcuy = (H + 8 * vmax - 1) // (8 * vmax)

        # quantized zigzag coefficient grid per component (MCU-padded,
        # same padding rule as the baseline encoder)
        coefs = []
        for (hh, vv), plane in zip(sampling, planes):
            bw, bh = mcux * hh, mcuy * vv
            padded = np.zeros((bh * 8, bw * 8), dtype=np.int64)
            ph, pw = plane.shape
            padded[:ph, :pw] = plane
            if pw < bw * 8:
                padded[:ph, pw:] = np.asarray(plane)[:, -1:]
            if ph < bh * 8:
                padded[ph:, :] = padded[ph - 1 : ph, :]
            arr = np.zeros((bh, bw, 64), dtype=np.int64)
            for by in range(bh):
                for bx in range(bw):
                    blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    S = A @ (blk.astype(np.float64) - 128.0) @ A.T
                    q = np.floor(S / qtab + 0.5).astype(np.int64)
                    arr[by, bx] = [int(q[r, c]) for (r, c) in _zz]
            coefs.append(arr)
        # real (non-interleaved) block grid per component
        nblocks = [
            (
                (-(-(H * vv) // vmax) + 7) // 8,
                (-(-(W * hh) // hmax) + 7) // 8,
            )
            for hh, vv in sampling
        ]

        out = bytearray(b"\xff\xd8")
        out += _segment(
            0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        )
        out += _segment(
            0xDB, bytes([0]) + bytes(int(qtab[r][c]) for r, c in _zz)
        )
        sof = struct.pack(">BHHB", 8, H, W, ncomp)
        for i, (hh, vv) in enumerate(sampling):
            sof += bytes([i + 1, (hh << 4) | vv, 0])
        out += _segment(0xC2, sof)  # SOF2: progressive DCT
        dht = bytes([0x00]) + bytes(_dc_bits) + bytes(_dc_vals)
        dht += bytes([0x10]) + bytes(_ac_bits) + bytes(_ac_vals)
        out += _segment(0xC4, dht)

        def sos_header(comp_idx, Ss, Se, Ah, Al):
            s = bytes([len(comp_idx)])
            for ci in comp_idx:
                s += bytes([ci + 1, 0x00])
            s += bytes([Ss, Se, (Ah << 4) | Al])
            return _segment(0xDA, s)

        def dc_blocks():
            """Interleaved MCU order when the frame has >1 component,
            the component's own grid otherwise (a one-component scan
            is always non-interleaved per T.81)."""
            if ncomp > 1:
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci, (hh, vv) in enumerate(sampling):
                            for by in range(vv):
                                for bx in range(hh):
                                    yield ci, my * vv + by, mx * hh + bx
            else:
                bh, bw = nblocks[0]
                for by in range(bh):
                    for bx in range(bw):
                        yield 0, by, bx

        # scan 1: DC first (Al=1)
        out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
        wtr = _BitWriter()
        pred = [0] * ncomp
        for ci, by, bx in dc_blocks():
            v = int(coefs[ci][by, bx, 0]) >> 1  # arithmetic PT
            diff = v - pred[ci]
            pred[ci] = v
            n = _category(diff)
            c, ln = _dc_codes[n]
            wtr.put(c, ln)
            if n:
                wtr.put(diff if diff >= 0 else diff + (1 << n) - 1, n)
        wtr.flush()
        out += wtr.out

        # scans 2..: AC first per component (Al=1, truncate-toward-0)
        for ci in range(ncomp):
            out += sos_header([ci], 1, 63, 0, 1)
            wtr = _BitWriter()
            bh, bw = nblocks[ci]
            for by in range(bh):
                for bx in range(bw):
                    band = coefs[ci][by, bx]
                    pt = [
                        (abs(int(band[k])) >> 1)
                        * (1 if band[k] >= 0 else -1)
                        for k in range(1, 64)
                    ]
                    last = -1
                    for i, v in enumerate(pt):
                        if v:
                            last = i
                    run = 0
                    for i in range(last + 1):
                        v = pt[i]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = _ac_codes[0xF0]
                            wtr.put(c, ln)
                            run -= 16
                        n = _category(v)
                        c, ln = _ac_codes[(run << 4) | n]
                        wtr.put(c, ln)
                        wtr.put(v if v >= 0 else v + (1 << n) - 1, n)
                        run = 0
                    if last < 62:
                        c, ln = _ac_codes[0x00]  # EOB0
                        wtr.put(c, ln)
            wtr.flush()
            out += wtr.out

        # scan: DC refinement (Ah=1, Al=0): one raw bit per block
        out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
        wtr = _BitWriter()
        for ci, by, bx in dc_blocks():
            wtr.put(int(coefs[ci][by, bx, 0]) & 1, 1)
        wtr.flush()
        out += wtr.out

        # scans: AC refinement per component (Ah=1, Al=0)
        for ci in range(ncomp):
            out += sos_header([ci], 1, 63, 1, 0)
            wtr = _BitWriter()
            bh, bw = nblocks[ci]
            for by in range(bh):
                for bx in range(bw):
                    band = [int(coefs[ci][by, bx, k]) for k in range(64)]
                    last_new = -1
                    for i in range(1, 64):
                        if abs(band[i]) == 1:
                            last_new = i
                    run = 0
                    pending: list[int] = []
                    for i in range(1, last_new + 1):
                        v = band[i]
                        a = abs(v)
                        if a == 0:
                            run += 1
                            continue
                        # Emit pending ZRLs BEFORE branching on
                        # already-significant (ADVICE r12 high,
                        # matching libjpeg encode_mcu_AC_refine): the
                        # decoder consumes correction bits per 16-zero
                        # ZRL span, so an already-significant
                        # coefficient sitting past the 16th zero must
                        # see its ZRL first or the bitstream
                        # desynchronizes and decodes to wrong pixels.
                        while run > 15:
                            c, ln = _ac_codes[0xF0]
                            wtr.put(c, ln)
                            for b2 in pending:
                                wtr.put(b2, 1)
                            pending = []
                            run -= 16
                        if a > 1:  # already significant at Al+1
                            pending.append(a & 1)
                            continue
                        c, ln = _ac_codes[(run << 4) | 1]
                        wtr.put(c, ln)
                        wtr.put(1 if v > 0 else 0, 1)
                        for b2 in pending:
                            wtr.put(b2, 1)
                        pending = []
                        run = 0
                    if last_new < 63:
                        # EOB0, then corrections for every already-
                        # significant coefficient in the tail
                        c, ln = _ac_codes[0x00]
                        wtr.put(c, ln)
                        for i in range(last_new + 1, 64):
                            if i >= 1 and abs(band[i]) > 1:
                                wtr.put(abs(band[i]) & 1, 1)
            wtr.flush()
            out += wtr.out

        out += b"\xff\xd9"
        return bytes(out)

    # ------------------------------------------------------------------
    # Arithmetic coding — the T.81 QM coder (Annexes D, E, F), round 12.
    # Closes the last declared JPEG entropy-coder boundary: SOF9
    # extended-sequential arithmetic encode + decode, pure stdlib math.
    # In-container validation is encoder<->decoder round-trip equality
    # against the Huffman baseline decode of the same planes (lossless
    # given the same quantizer, so pixels must match bit-exactly) plus
    # the registered query's closed-form oracle; no external codec
    # exists in this environment to cross-check bitstream interop.
    # ------------------------------------------------------------------

    #: T.81 Table D.3: (Qe, Next_Index_LPS, Next_Index_MPS, Switch_MPS)
    #: per probability-estimation state, plus the NON-adaptive sign bin
    #: (index 113, Qe=0.5, self-looping) F.1.4.4.1.2 uses for AC signs.
    _QM = [
        (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
        (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
        (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
        (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
        (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
        (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
        (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
        (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
        (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
        (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
        (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
        (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
        (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
        (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
        (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
        (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
        (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
        (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
        (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
        (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
        (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
        (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
        (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
        (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
        (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
        (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
        (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
        (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
        (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
        (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
        (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
        (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
        (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
        (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
        (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
        (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
        (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
        (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
        # index 113: the fixed (non-adaptive) equiprobable bin
        (0x5A1D, 113, 113, 0),
    ]

    #: default conditioning (T.81 Table F.5 defaults): DC thresholds
    #: L=0 / U=1, AC high/low-frequency split Kx=5
    _ARITH_DC_L, _ARITH_DC_U, _ARITH_AC_KX = 0, 1, 5

    class _ArithEncoder:
        """QM encoder registers per T.81 D.1: 16-bit interval A
        (0x10000 at init), code register C drained through the
        bit-19 window, CT shift countdown, byte buffer + stacked-0xFF
        carry pipeline (D.1.8), 0xFF00 byte stuffing on output.
        Statistics bins live in caller-owned bytearrays: bit 7 = MPS
        sense, bits 0-6 = Table D.3 state index."""

        def __init__(self):
            self.a = 0x10000
            self.c = 0
            self.ct = 11
            self.buf = None  # no byte buffered yet
            self.sx = 0  # stacked 0xFF bytes awaiting carry resolution
            self.out = bytearray()

        def _emit(self, b: int) -> None:
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

        def _byteout(self) -> None:
            t = self.c >> 19
            self.c &= 0x7FFFF
            if t > 0xFF:
                # carry: ripples through every stacked 0xFF (-> 0x00)
                # into the buffered byte; a second carry into the same
                # position is impossible (the code value left after a
                # carry is strictly below one unit in that place)
                if self.buf is not None:
                    self._emit(self.buf + 1)
                for _ in range(self.sx):
                    self._emit(0x00)
                self.sx = 0
                self.buf = t & 0xFF
            elif t == 0xFF:
                self.sx += 1  # a future carry may still flip it
            else:
                if self.buf is not None:
                    self._emit(self.buf)
                for _ in range(self.sx):
                    self._emit(0xFF)  # _emit appends the 0x00 stuff
                self.sx = 0
                self.buf = t

        def code(self, st: bytearray, i: int, bit: int) -> None:
            """Code one binary decision against statistics bin i."""
            sv = st[i]
            mps = sv >> 7
            qe, nlps, nmps, sw = _QM[sv & 0x7F]
            self.a -= qe
            if bit == mps:
                if self.a >= 0x8000:
                    return  # no renormalization, no state change
                if self.a < qe:  # conditional exchange
                    self.c += self.a
                    self.a = qe
                st[i] = (mps << 7) | nmps
            else:
                if self.a >= qe:  # plain LPS: the top subinterval
                    self.c += self.a
                    self.a = qe
                # else conditional exchange: keep the bottom interval
                if sw:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            while self.a < 0x8000:  # RENORME
                self.a <<= 1
                self.c <<= 1
                self.ct -= 1
                if self.ct == 0:
                    self._byteout()
                    self.ct = 8

        def flush(self) -> bytes:
            # CLEARBITS (D.1.9): zero as many low C bits as the final
            # interval allows, then push the rest through the window
            t = (self.c + self.a - 1) & ~0xFFFF
            if t < self.c:
                t += 0x8000
            self.c = t
            self.c <<= self.ct
            self._byteout()
            self.c <<= 8
            self._byteout()
            if self.buf is not None:
                self._emit(self.buf)
            for _ in range(self.sx):
                self._emit(0xFF)
            self.sx = 0
            self.buf = None
            return bytes(self.out)

    class _ArithDecoder:
        """QM decoder mirroring _ArithEncoder bit-for-bit: the code
        value rides in c_high against the same A discipline; bytes
        feed MSB-first with 0xFF00 de-stuffing, and per T.81 the
        decoder supplies ZERO bits once a marker is reached (markers
        inside arithmetic entropy data are legal stream ends, unlike
        the Huffman path)."""

        def __init__(self, data: bytes, pos: int):
            self.data = data
            self.bp = pos
            self.acc = 0
            self.nbits = 0
            self.marker_pos: int | None = None
            self.a = 0x10000
            self.c_high = 0
            for _ in range(16):
                self.c_high = (self.c_high << 1) | self._bit()

        def _byte(self) -> int:
            if self.marker_pos is not None:
                return 0  # zero-feed past the marker
            if self.bp >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.bp]
            if b == 0xFF:
                nxt = (
                    self.data[self.bp + 1]
                    if self.bp + 1 < len(self.data)
                    else None
                )
                if nxt == 0x00:
                    self.bp += 2  # stuffed 0xFF00 -> literal 0xFF
                    return 0xFF
                self.marker_pos = self.bp
                return 0
            self.bp += 1
            return b

        def _bit(self) -> int:
            if self.nbits == 0:
                self.acc = self._byte()
                self.nbits = 8
            self.nbits -= 1
            return (self.acc >> self.nbits) & 1

        def decode(self, st: bytearray, i: int) -> int:
            sv = st[i]
            mps = sv >> 7
            qe, nlps, nmps, sw = _QM[sv & 0x7F]
            self.a -= qe
            if self.c_high < self.a:
                if self.a >= 0x8000:
                    return mps
                if self.a < qe:  # MPS_EXCHANGE: roles swapped
                    bit = mps ^ 1
                    if sw:
                        mps ^= 1
                    st[i] = (mps << 7) | nlps
                else:
                    bit = mps
                    st[i] = (mps << 7) | nmps
            else:
                self.c_high -= self.a
                bottom = self.a
                self.a = qe
                if bottom < qe:  # LPS_EXCHANGE: roles swapped
                    bit = mps
                    st[i] = (mps << 7) | nmps
                else:
                    bit = mps ^ 1
                    if sw:
                        mps ^= 1
                    st[i] = (mps << 7) | nlps
            while self.a < 0x8000:  # RENORMD
                self.a <<= 1
                self.c_high = (self.c_high << 1) | self._bit()
            return bit

    def _arith_enc_dc(enc, dc_st, dc_ctx, ci, diff, L, U) -> None:
        """Encode one DC difference per F.1.4.1/F.1.4.4.1: zero/sign
        decisions in the 4-bin group picked by the previous diff's
        conditioning category, magnitude-category chain at X1=20,
        magnitude bits 14 bins above the chain terminator."""
        s0 = dc_ctx[ci]
        if diff == 0:
            enc.code(dc_st, s0, 0)
            dc_ctx[ci] = 0
            return
        enc.code(dc_st, s0, 1)
        sign = 1 if diff < 0 else 0
        enc.code(dc_st, s0 + 1, sign)
        v = (-diff if sign else diff) - 1
        st = s0 + 2 + sign
        m = 0
        if v:
            enc.code(dc_st, st, 1)
            m = 1
            st = 20
            v2 = v
            while v2 >> 1:
                v2 >>= 1
                enc.code(dc_st, st, 1)
                m <<= 1
                st += 1
        enc.code(dc_st, st, 0)
        if m < (1 << L) >> 1:
            dc_ctx[ci] = 0
        elif m > (1 << U) >> 1:
            dc_ctx[ci] = 12 + sign * 4
        else:
            dc_ctx[ci] = 4 + sign * 4
        st += 14
        while m >> 1:
            m >>= 1
            enc.code(dc_st, st, 1 if (v & m) else 0)

    def _arith_dec_dc(dec, dc_st, dc_ctx, ci, L, U, prec) -> int:
        """Decode one DC difference (mirror of _arith_enc_dc)."""
        s0 = dc_ctx[ci]
        if dec.decode(dc_st, s0) == 0:
            dc_ctx[ci] = 0
            return 0
        sign = dec.decode(dc_st, s0 + 1)
        st = s0 + 2 + sign
        m = dec.decode(dc_st, st)
        if m:
            st = 20
            while dec.decode(dc_st, st):
                m <<= 1
                if m > (1 << (prec + 2)):
                    raise ValueError("JPEG arithmetic DC magnitude overflow")
                st += 1
        if m < (1 << L) >> 1:
            dc_ctx[ci] = 0
        elif m > (1 << U) >> 1:
            dc_ctx[ci] = 12 + sign * 4
        else:
            dc_ctx[ci] = 4 + sign * 4
        v = m
        st += 14
        while m >> 1:
            m >>= 1
            if dec.decode(dc_st, st):
                v |= m
        v += 1
        return -v if sign else v

    # ---- lossless-arithmetic (SOF11) statistical model, T.81 H.1.2 ----
    # The per-sample difference is coded with the SAME binary decision
    # procedure as a sequential DC difference (zero? sign? Sz>=1?
    # magnitude-category chain, magnitude bits), but the conditioning
    # is TWO-dimensional (H.1.2.3): the context group is selected by
    # the pair (class(Da), class(Db)) where Da/Db are the differences
    # previously coded at the left/above neighbor positions, each
    # classified into the five F.1.4.4.1.4 categories (zero, small+/-,
    # large+/-) under the DC conditioning bounds L/U; and the
    # magnitude-category / magnitude-bit bins come in TWO sets,
    # selected by whether Db falls in a large category. Statistics
    # layout (ours, compact): 25 context groups x 4 decision bins at
    # 0..99, set-0 X chain at 100 (M bits +16), set-1 X chain at 132
    # (M bits +16) -> 164 bins. Missing neighbors (first row/column,
    # start of scan, post-restart) condition as zero differences.
    _LL_STATS = 164
    _LL_X0, _LL_X1, _LL_MOFF = 100, 132, 16

    def _ll_classify(v: int, L: int, U: int) -> int:
        """F.1.4.4.1.4 five-way difference classification, applied to
        a stored difference value: the category compares the
        magnitude's POWER (the MSB of Sz = |v|-1), exactly as the
        coding procedure computes it."""
        if v == 0:
            return 0
        sz = (v if v > 0 else -v) - 1
        m = 0 if sz == 0 else 1 << (sz.bit_length() - 1)
        if m < (1 << L) >> 1:
            return 0
        sign = 1 if v < 0 else 0
        if m > (1 << U) >> 1:
            return 3 + sign
        return 1 + sign

    def _arith_enc_diff(enc, st, da, db, diff, L, U) -> None:
        """Encode one lossless difference under the 2-D conditioned
        DC model (mirror: _arith_dec_diff)."""
        ca, cb = _ll_classify(da, L, U), _ll_classify(db, L, U)
        s0 = 4 * (ca * 5 + cb)
        if diff == 0:
            enc.code(st, s0, 0)
            return
        enc.code(st, s0, 1)
        sign = 1 if diff < 0 else 0
        enc.code(st, s0 + 1, sign)
        v = (-diff if sign else diff) - 1
        sx = s0 + 2 + sign
        m = 0
        if v:
            enc.code(st, sx, 1)
            m = 1
            sx = _LL_X1 if cb >= 3 else _LL_X0
            v2 = v
            while v2 >> 1:
                v2 >>= 1
                enc.code(st, sx, 1)
                m <<= 1
                sx += 1
        enc.code(st, sx, 0)
        sx += _LL_MOFF
        while m >> 1:
            m >>= 1
            enc.code(st, sx, 1 if (v & m) else 0)

    def _arith_dec_diff(dec, st, da, db, L, U) -> int:
        """Decode one lossless difference (mirror of _arith_enc_diff);
        magnitudes are mod-65536 signed, so the chain is bounded."""
        ca, cb = _ll_classify(da, L, U), _ll_classify(db, L, U)
        s0 = 4 * (ca * 5 + cb)
        if dec.decode(st, s0) == 0:
            return 0
        sign = dec.decode(st, s0 + 1)
        sx = s0 + 2 + sign
        m = dec.decode(st, sx)
        if m:
            sx = _LL_X1 if cb >= 3 else _LL_X0
            while dec.decode(st, sx):
                m <<= 1
                if m > (1 << 16):
                    raise ValueError(
                        "JPEG lossless arithmetic magnitude overflow"
                    )
                sx += 1
        v = m
        sx += _LL_MOFF
        while m >> 1:
            m >>= 1
            if dec.decode(st, sx):
                v |= m
        v += 1
        return -v if sign else v

    def _arith_enc_ac(enc, ac_st, fixed, vals, kx, ss=1, se=63) -> None:
        """Encode one block's AC coefficients over the zigzag band
        [ss, se] per F.1.4.2/F.1.4.4.2 (and G.1.3.2 for progressive
        first scans, which use the same model band-limited): per-index
        (EOB, zero/nonzero, magnitude>1) bin triples, fixed
        equiprobable sign bin, magnitude chains at 189 (k<=Kx) / 217
        (k>Kx). ``vals`` is zigzag-indexed (vals[k])."""
        ke = ss - 1
        for k in range(ss, se + 1):
            if vals[k]:
                ke = k  # last nonzero k in the band
        k = ss
        while k <= ke:
            st = 3 * (k - 1)
            enc.code(ac_st, st, 0)  # not EOB yet
            while vals[k] == 0:
                enc.code(ac_st, st + 1, 0)
                st += 3
                k += 1
            enc.code(ac_st, st + 1, 1)
            val = vals[k]
            sign = 1 if val < 0 else 0
            enc.code(fixed, 0, sign)
            v = (-val if sign else val) - 1
            st += 2
            m = 0
            if v:
                enc.code(ac_st, st, 1)
                m = 1
                v2 = v
                if v2 >> 1:
                    v2 >>= 1
                    enc.code(ac_st, st, 1)
                    m <<= 1
                    st = 189 if k <= kx else 217
                    while v2 >> 1:
                        v2 >>= 1
                        enc.code(ac_st, st, 1)
                        m <<= 1
                        st += 1
            enc.code(ac_st, st, 0)
            st += 14
            while m >> 1:
                m >>= 1
                enc.code(ac_st, st, 1 if (v & m) else 0)
            k += 1
        if ke < se:
            enc.code(ac_st, 3 * (ke + 1 - 1), 1)  # EOB decision

    def _arith_dec_ac(dec, ac_st, fixed, kx, prec, ss=1, se=63) -> list:
        """Decode one block's AC coefficients over the zigzag band
        [ss, se] (mirror of _arith_enc_ac); returns a zigzag-indexed
        64-entry list (entries outside the band stay 0)."""
        vals = [0] * 64
        k = ss
        while k <= se:
            st = 3 * (k - 1)
            if dec.decode(ac_st, st):
                break  # EOB
            while dec.decode(ac_st, st + 1) == 0:
                st += 3
                k += 1
                if k > se:
                    raise ValueError("JPEG arithmetic AC index overrun")
            sign = dec.decode(fixed, 0)
            st += 2
            m = dec.decode(ac_st, st)
            if m:
                if dec.decode(ac_st, st):
                    m <<= 1
                    st = 189 if k <= kx else 217
                    while dec.decode(ac_st, st):
                        m <<= 1
                        if m > (1 << (prec + 2)):
                            raise ValueError(
                                "JPEG arithmetic AC magnitude overflow"
                            )
                        st += 1
            v = m
            st += 14
            while m >> 1:
                m >>= 1
                if dec.decode(ac_st, st):
                    v |= m
            v += 1
            vals[k] = -v if sign else v
            k += 1
        return vals

    def _arith_enc_ac_refine(enc, ac_st, fixed, pt, sgn, ss, se) -> None:
        """Encode one block's AC refinement scan per T.81 G.1.3.3:
        ``pt[k]`` is the point-transformed magnitude |coef| >> Al at
        THIS scan's Al (so >1 = previously significant, 1 = newly
        significant, 0 = still zero), ``sgn[k]`` the coefficient sign.
        EOB decisions are coded only past the last previously-
        significant index; previously-significant coefficients
        contribute one correction bit (their new low magnitude bit),
        newly-significant ones a zero/nonzero decision + fixed-bin
        sign. No EOB runs — arithmetic progressive codes the EOB
        decision per block (that is the model's job, not RLE's)."""
        ke = ss - 1  # last nonzero (any) in the band
        kex = ss - 1  # last previously-significant
        for k in range(ss, se + 1):
            if pt[k]:
                ke = k
                if pt[k] > 1:
                    kex = k
        k = ss
        while k <= ke:
            st = 3 * (k - 1)
            if k > kex:
                enc.code(ac_st, st, 0)  # not EOB yet
            while True:
                t = pt[k]
                if t > 1:  # previously significant: correction bit
                    enc.code(ac_st, st + 2, t & 1)
                    break
                if t == 1:  # newly significant: decision + sign
                    enc.code(ac_st, st + 1, 1)
                    enc.code(fixed, 0, sgn[k])
                    break
                enc.code(ac_st, st + 1, 0)
                st += 3
                k += 1
            k += 1
        if ke < se:
            enc.code(ac_st, 3 * (ke + 1 - 1), 1)  # EOB decision

    def _arith_dec_ac_refine(dec, ac_st, fixed, band, ss, se, al) -> None:
        """Decode one block's AC refinement scan (mirror of
        _arith_enc_ac_refine), updating the zigzag coefficient slice
        ``band`` in place at approximation level ``al``."""
        p1 = 1 << al
        kex = ss - 1
        for k in range(se, ss - 1, -1):
            if band[k]:
                kex = k
                break
        k = ss
        while k <= se:
            st = 3 * (k - 1)
            if k > kex and dec.decode(ac_st, st):
                break  # EOB
            while True:
                v = int(band[k])
                if v:  # previously significant: correction bit
                    if dec.decode(ac_st, st + 2):
                        band[k] = v + (-p1 if v < 0 else p1)
                    break
                if dec.decode(ac_st, st + 1):  # newly significant
                    band[k] = -p1 if dec.decode(fixed, 0) else p1
                    break
                st += 3
                k += 1
                if k > se:
                    raise ValueError("JPEG arithmetic AC index overrun")
            k += 1

    def encode_arith(
        planes,
        sampling,
        qtab=None,
        precision: int = 8,
        restart_interval: int = 0,
    ) -> bytes:
        """ARITHMETIC-coded extended-sequential (SOF9) twin of
        ``encode``: same FDCT + quantization + zigzag + MCU
        interleave, entropy coded by the adaptive QM coder instead of
        canonical Huffman — DAC conditioning segment in place of DHT,
        byte-stuffed QM bitstream, CLEARBITS flush. Every component
        scans against statistics table 0 (matching the shared-table
        Huffman twin); the statistics adapt as the image codes, which
        is the entire point of the arithmetic option (T.81 Annex F).
        Lossless for any plane set under an all-ones quantizer, so
        pixels decode bit-identically to the baseline twin."""
        import numpy as np

        A = np.asarray(_a_rows)
        if precision not in (8, 12):
            raise ValueError(f"unsupported JPEG precision {precision}")
        if qtab is None:
            qtab = np.ones((8, 8), dtype=np.int64)
        qtab = np.asarray(qtab, dtype=np.int64)
        shift = float(1 << (precision - 1))
        ncomp = len(planes)
        hmax = max(hh for hh, vv in sampling)
        vmax = max(vv for hh, vv in sampling)
        H, W = planes[0].shape
        out = bytearray(b"\xff\xd8")
        out += _segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        if int(qtab.max()) > 255:
            out += _segment(
                0xDB,
                bytes([0x10])
                + b"".join(
                    struct.pack(">H", int(qtab[r][c])) for r, c in _zz
                ),
            )
        else:
            out += _segment(
                0xDB, bytes([0]) + bytes(int(qtab[r][c]) for r, c in _zz)
            )
        sof = struct.pack(">BHHB", precision, H, W, ncomp)
        for i, (hh, vv) in enumerate(sampling):
            sof += bytes([i + 1, (hh << 4) | vv, 0])
        out += _segment(0xC9, sof)  # SOF9: extended sequential, arith
        # DAC: DC table 0 conditioning (U<<4 | L), AC table 0 (Kx)
        out += _segment(
            0xCC,
            bytes(
                [
                    0x00,
                    (_ARITH_DC_U << 4) | _ARITH_DC_L,
                    0x10,
                    _ARITH_AC_KX,
                ]
            ),
        )
        if restart_interval:
            out += _segment(0xDD, struct.pack(">H", restart_interval))
        sos = bytes([ncomp])
        for i in range(ncomp):
            sos += bytes([i + 1, 0x00])
        sos += bytes([0, 63, 0])
        out += _segment(0xDA, sos)

        mcux = (W + 8 * hmax - 1) // (8 * hmax)
        mcuy = (H + 8 * vmax - 1) // (8 * vmax)
        padded_planes = []
        for (hh, vv), plane in zip(sampling, planes):
            bw, bh = mcux * hh, mcuy * vv
            padded = np.zeros((bh * 8, bw * 8), dtype=np.int64)
            ph, pw = plane.shape
            padded[:ph, :pw] = plane
            if pw < bw * 8:
                padded[:ph, pw:] = np.asarray(plane)[:, -1:]
            if ph < bh * 8:
                padded[ph:, :] = padded[ph - 1 : ph, :]
            padded_planes.append(padded)

        enc = _ArithEncoder()
        dc_st = bytearray(64)
        ac_st = bytearray(256)
        fixed = bytearray([113])
        dc_ctx = [0] * ncomp
        pred = [0] * ncomp
        mcu_count = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    # F.1.4.4: a restart flushes and REINITIALIZES the
                    # coder, every statistics area and the DC state
                    out += enc.flush()
                    out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    enc = _ArithEncoder()
                    dc_st = bytearray(64)
                    ac_st = bytearray(256)
                    dc_ctx = [0] * ncomp
                    pred = [0] * ncomp
                for ci, (hh, vv) in enumerate(sampling):
                    for by in range(vv):
                        for bx in range(hh):
                            y0 = (my * vv + by) * 8
                            x0 = (mx * hh + bx) * 8
                            blk = padded_planes[ci][
                                y0 : y0 + 8, x0 : x0 + 8
                            ]
                            S = A @ (blk.astype(np.float64) - shift) @ A.T
                            q = np.floor(S / qtab + 0.5).astype(np.int64)
                            diff = int(q[0, 0]) - pred[ci]
                            pred[ci] = int(q[0, 0])
                            _arith_enc_dc(
                                enc,
                                dc_st,
                                dc_ctx,
                                ci,
                                diff,
                                _ARITH_DC_L,
                                _ARITH_DC_U,
                            )
                            vals = [int(q[r, c2]) for (r, c2) in _zz]
                            vals[0] = 0  # DC coded above
                            _arith_enc_ac(
                                enc, ac_st, fixed, vals, _ARITH_AC_KX
                            )
                mcu_count += 1
        out += enc.flush()
        out += b"\xff\xd9"
        return bytes(out)

    def encode_lossless(
        planes, sampling, predictor: int = 4, restart_interval: int = 0
    ) -> bytes:
        """LOSSLESS (SOF3) encoder — T.81 Annex H predictive coding:
        no DCT, no quantizer; each sample's difference from its
        neighborhood predictor (selector 1..7 in the scan header's Ss
        field) is Huffman coded with the DC category + magnitude-bits
        mechanism, all arithmetic modulo 65536. Components are
        emitted as separate NON-interleaved scans (spec-legal for any
        sampling geometry, and it keeps ragged-MCU bookkeeping out of
        the hot loop); the decoder also accepts multi-component
        interleaved scans when every scan component samples at 1x1
        (T.81 H.2.3). First-sample/first-line/first-column prediction and
        RSTn resets per H.1.2; decode is bit-exact — the decoder
        reproduces the input planes sample for sample."""
        if not 1 <= predictor <= 7:
            raise ValueError(f"invalid lossless predictor {predictor}")
        ncomp = len(planes)
        hmax = max(hh for hh, vv in sampling)
        vmax = max(vv for hh, vv in sampling)
        H, W = planes[0].shape
        out = bytearray(b"\xff\xd8")
        out += _segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        sof = struct.pack(">BHHB", 8, H, W, ncomp)
        for i, (hh, vv) in enumerate(sampling):
            sof += bytes([i + 1, (hh << 4) | vv, 0])
        out += _segment(0xC3, sof)  # SOF3: lossless sequential
        dht = bytes([0x00]) + bytes(_dc_bits) + bytes(_dc_vals)
        out += _segment(0xC4, dht)
        if restart_interval:
            out += _segment(0xDD, struct.pack(">H", restart_interval))
        for ci in range(ncomp):
            sos = bytes([1, ci + 1, 0x00, predictor, 0, 0])
            out += _segment(0xDA, sos)
            plane = planes[ci]
            ph, pw = plane.shape
            wtr = _BitWriter()
            count = 0
            rst = 0
            fresh = True  # start-of-scan / post-restart state
            for y in range(ph):
                for x in range(pw):
                    if (
                        restart_interval
                        and count
                        and count % restart_interval == 0
                    ):
                        wtr.flush()
                        wtr.out += bytes([0xFF, 0xD0 + rst])
                        rst = (rst + 1) % 8
                        fresh = True
                    px = _lossless_predict(
                        plane, y, x, predictor, 8, 0, fresh
                    )
                    fresh = False
                    d = (int(plane[y, x]) - px) & 0xFFFF
                    if d >= 0x8000:
                        d -= 0x10000
                    n = _category(d)
                    c, ln = _dc_codes[n]
                    wtr.put(c, ln)
                    if n:
                        wtr.put(d if d >= 0 else d + (1 << n) - 1, n)
                    count += 1
            wtr.flush()
            out += wtr.out
        out += b"\xff\xd9"
        return bytes(out)

    def encode_lossless_arith(
        planes, sampling, predictor: int = 4, restart_interval: int = 0
    ) -> bytes:
        """LOSSLESS ARITHMETIC-coded (SOF11) encoder — the Annex-H
        predictive front end of ``encode_lossless`` (same selectors,
        first-sample/first-line/first-column rules, mod-65536
        arithmetic, RSTn resets) with the QM coder replacing Huffman:
        each difference rides the 2-D conditioned DC decision model
        (``_arith_enc_diff``, T.81 H.1.2.3 — contexts from the left/
        above differences, Db-selected magnitude bins), DAC in place
        of DHT, per-component non-interleaved scans each with a fresh
        coder and statistics area. A restart flushes and reinitializes
        the coder, the statistics AND the conditioning history (prior
        differences re-condition as zero — the same everything-resets
        reading the SOF9/SOF10 paths use, validated by enc≡dec
        bit-identity; no external T.81 codec exists in-container).
        Decode is sample-exact."""
        import numpy as np

        if not 1 <= predictor <= 7:
            raise ValueError(f"invalid lossless predictor {predictor}")
        ncomp = len(planes)
        H, W = planes[0].shape
        out = bytearray(b"\xff\xd8")
        out += _segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        sof = struct.pack(">BHHB", 8, H, W, ncomp)
        for i, (hh, vv) in enumerate(sampling):
            sof += bytes([i + 1, (hh << 4) | vv, 0])
        out += _segment(0xCB, sof)  # SOF11: lossless, arithmetic
        out += _segment(
            0xCC, bytes([0x00, (_ARITH_DC_U << 4) | _ARITH_DC_L])
        )
        if restart_interval:
            out += _segment(0xDD, struct.pack(">H", restart_interval))
        L, U = _ARITH_DC_L, _ARITH_DC_U
        for ci in range(ncomp):
            sos = bytes([1, ci + 1, 0x00, predictor, 0, 0])
            out += _segment(0xDA, sos)
            plane = planes[ci]
            ph, pw = plane.shape
            enc = _ArithEncoder()
            st = bytearray(_LL_STATS)
            dplane = np.zeros((ph, pw), dtype=np.int64)
            count = 0
            rst = 0
            fresh = True
            for y in range(ph):
                for x in range(pw):
                    if (
                        restart_interval
                        and count
                        and count % restart_interval == 0
                    ):
                        out += enc.flush()
                        out += bytes([0xFF, 0xD0 + rst])
                        rst = (rst + 1) % 8
                        enc = _ArithEncoder()
                        st = bytearray(_LL_STATS)
                        dplane[:] = 0
                        fresh = True
                    px = _lossless_predict(
                        plane, y, x, predictor, 8, 0, fresh
                    )
                    fresh = False
                    d = (int(plane[y, x]) - px) & 0xFFFF
                    if d >= 0x8000:
                        d -= 0x10000
                    da = int(dplane[y, x - 1]) if x else 0
                    db = int(dplane[y - 1, x]) if y else 0
                    _arith_enc_diff(enc, st, da, db, d, L, U)
                    dplane[y, x] = d
                    count += 1
            out += enc.flush()
        out += b"\xff\xd9"
        return bytes(out)

    def _lossless_predict(plane, y, x, predictor, prec, pt, fresh) -> int:
        """T.81 H.1.2 neighborhood prediction over RECONSTRUCTED
        samples (encode and decode share it, so any plane whose
        earlier samples are already exact yields the same Px):
        start-of-scan (or post-restart) sample predicts
        2^(P-Pt-1); the rest of the first line predicts from a
        (left); the first column predicts from b (above); interior
        samples use selector 1..7."""
        if fresh:
            return 1 << (prec - pt - 1)
        if y == 0:
            return int(plane[y, x - 1])
        if x == 0:
            return int(plane[y - 1, x])
        a = int(plane[y, x - 1])
        b = int(plane[y - 1, x])
        c = int(plane[y - 1, x - 1])
        if predictor == 1:
            return a
        if predictor == 2:
            return b
        if predictor == 3:
            return c
        if predictor == 4:
            return a + b - c
        if predictor == 5:
            return a + ((b - c) >> 1)
        if predictor == 6:
            return b + ((a - c) >> 1)
        return (a + b) >> 1  # predictor 7

    def encode_arith_progressive(planes, sampling, qtab=None) -> bytes:
        """Progressive ARITHMETIC-coded (SOF10) twin of
        ``encode_progressive``: the same six-scan spectral-selection +
        successive-approximation schedule, entropy coded by the QM
        coder per T.81 G.1.3 — every scan reinitializes the coder AND
        its statistics areas, the DC refinement bit rides the fixed
        equiprobable bin, AC first scans use the band-limited
        sequential model, AC refinement the G.1.3.3
        history-conditioned model (correction bits per
        previously-significant coefficient; arithmetic progressive
        has NO EOB runs — the per-block EOB decision is the model's
        job, not RLE's). The schedule reconstructs coefficients
        exactly, so pixels decode bit-identically to the baseline
        twin."""
        import numpy as np

        A = np.asarray(_a_rows)
        if qtab is None:
            qtab = np.ones((8, 8), dtype=np.int64)
        qtab = np.asarray(qtab, dtype=np.int64)
        ncomp = len(planes)
        hmax = max(hh for hh, vv in sampling)
        vmax = max(vv for hh, vv in sampling)
        H, W = planes[0].shape
        mcux = (W + 8 * hmax - 1) // (8 * hmax)
        mcuy = (H + 8 * vmax - 1) // (8 * vmax)

        coefs = []
        for (hh, vv), plane in zip(sampling, planes):
            bw, bh = mcux * hh, mcuy * vv
            padded = np.zeros((bh * 8, bw * 8), dtype=np.int64)
            ph, pw = plane.shape
            padded[:ph, :pw] = plane
            if pw < bw * 8:
                padded[:ph, pw:] = np.asarray(plane)[:, -1:]
            if ph < bh * 8:
                padded[ph:, :] = padded[ph - 1 : ph, :]
            arr = np.zeros((bh, bw, 64), dtype=np.int64)
            for by in range(bh):
                for bx in range(bw):
                    blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    S = A @ (blk.astype(np.float64) - 128.0) @ A.T
                    q = np.floor(S / qtab + 0.5).astype(np.int64)
                    arr[by, bx] = [int(q[r, c]) for (r, c) in _zz]
            coefs.append(arr)
        nblocks = [
            (
                (-(-(H * vv) // vmax) + 7) // 8,
                (-(-(W * hh) // hmax) + 7) // 8,
            )
            for hh, vv in sampling
        ]

        out = bytearray(b"\xff\xd8")
        out += _segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        out += _segment(
            0xDB, bytes([0]) + bytes(int(qtab[r][c]) for r, c in _zz)
        )
        sof = struct.pack(">BHHB", 8, H, W, ncomp)
        for i, (hh, vv) in enumerate(sampling):
            sof += bytes([i + 1, (hh << 4) | vv, 0])
        out += _segment(0xCA, sof)  # SOF10: progressive, arithmetic
        out += _segment(
            0xCC,
            bytes(
                [
                    0x00,
                    (_ARITH_DC_U << 4) | _ARITH_DC_L,
                    0x10,
                    _ARITH_AC_KX,
                ]
            ),
        )

        def sos_header(comp_idx, Ss, Se, Ah, Al):
            s = bytes([len(comp_idx)])
            for ci in comp_idx:
                s += bytes([ci + 1, 0x00])
            s += bytes([Ss, Se, (Ah << 4) | Al])
            return _segment(0xDA, s)

        def dc_blocks():
            if ncomp > 1:
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci, (hh, vv) in enumerate(sampling):
                            for by in range(vv):
                                for bx in range(hh):
                                    yield ci, my * vv + by, mx * hh + bx
            else:
                bh, bw = nblocks[0]
                for by in range(bh):
                    for bx in range(bw):
                        yield 0, by, bx

        fixed = bytearray([113])

        # scan 1: DC first, interleaved, Al=1 (arithmetic-shift PT)
        out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
        enc = _ArithEncoder()
        dc_st = bytearray(64)
        dc_ctx = [0] * ncomp
        pred = [0] * ncomp
        for ci, by, bx in dc_blocks():
            v = int(coefs[ci][by, bx, 0]) >> 1
            diff = v - pred[ci]
            pred[ci] = v
            _arith_enc_dc(
                enc, dc_st, dc_ctx, ci, diff, _ARITH_DC_L, _ARITH_DC_U
            )
        out += enc.flush()

        # scans: AC first per component (Al=1, truncate-toward-zero)
        for ci in range(ncomp):
            out += sos_header([ci], 1, 63, 0, 1)
            enc = _ArithEncoder()
            ac_st = bytearray(256)
            bh, bw = nblocks[ci]
            for by in range(bh):
                for bx in range(bw):
                    band = coefs[ci][by, bx]
                    vals = [0] * 64
                    for k in range(1, 64):
                        c0 = int(band[k])
                        vals[k] = (abs(c0) >> 1) * (1 if c0 >= 0 else -1)
                    _arith_enc_ac(enc, ac_st, fixed, vals, _ARITH_AC_KX)
            out += enc.flush()

        # scan: DC refinement (Ah=1 -> Al=0): one fixed-bin bit/block
        out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
        enc = _ArithEncoder()
        for ci, by, bx in dc_blocks():
            enc.code(fixed, 0, int(coefs[ci][by, bx, 0]) & 1)
        out += enc.flush()

        # scans: AC refinement per component (Ah=1 -> Al=0)
        for ci in range(ncomp):
            out += sos_header([ci], 1, 63, 1, 0)
            enc = _ArithEncoder()
            ac_st = bytearray(256)
            bh, bw = nblocks[ci]
            for by in range(bh):
                for bx in range(bw):
                    band = coefs[ci][by, bx]
                    pt = [0] * 64
                    sgn = [0] * 64
                    for k in range(1, 64):
                        c0 = int(band[k])
                        pt[k] = abs(c0)  # Al = 0
                        sgn[k] = 1 if c0 < 0 else 0
                    _arith_enc_ac_refine(enc, ac_st, fixed, pt, sgn, 1, 63)
            out += enc.flush()

        out += b"\xff\xd9"
        return bytes(out)

    def build(
        doc_id: int,
        mode: str = "gray",
        progressive: bool = False,
        precision: int = 8,
        arithmetic: bool = False,
        lossless: bool = False,
    ) -> bytes:
        """Oracle fixture: per-8×8-block constant planes (per-MCU
        constant chroma at 4:2:0), one generating formula per plane,
        mirrored verbatim in the oracle SQL. ``progressive`` encodes
        the SAME planes as an SOF2 six-scan stream (the schedule
        reconstructs coefficients exactly, so the decoded pixels — and
        therefore the oracle — are identical to the baseline's).
        ``precision`` 12 widens the same generating formulas to
        mod-4096 samples and emits extended-sequential SOF1.
        ``arithmetic`` encodes the same planes as an SOF9 QM-coded
        stream (lossless under the all-ones quantizer, so pixels —
        and the oracle — again equal the baseline's)."""
        import numpy as np

        if progressive and precision != 8:
            raise ValueError("progressive fixtures are 8-bit")
        mod = 1 << precision
        if lossless:
            if progressive or precision != 8:
                raise ValueError(
                    "lossless fixtures are 8-bit SOF3/SOF11"
                )
            # one predictor per fixture mode so the registered query
            # exercises the selector space (4 = planar, 7 = average,
            # 5 = left + half vertical gradient); ``arithmetic``
            # emits the same planes/predictor as SOF11 (QM coded)
            pred = {"gray": 4, "c444": 7, "c420": 5}.get(mode, 4)
            ll = encode_lossless_arith if arithmetic else encode_lossless
            enc = lambda p, s: ll(p, s, predictor=pred)
        elif progressive and arithmetic:
            enc = lambda p, s: encode_arith_progressive(p, s)
        elif arithmetic:
            enc = lambda p, s: encode_arith(p, s, precision=precision)
        elif progressive:
            enc = lambda p, s: encode_progressive(p, s)
        else:
            enc = lambda p, s: encode(p, s, precision=precision)
        bx, by = np.meshgrid(np.arange(w // 8), np.arange(h // 8))
        yplane = np.repeat(
            np.repeat((doc_id * 7 + bx * 13 + by * 29) % mod, 8, 0), 8, 1
        )
        if mode == "gray":
            return enc([yplane], [(1, 1)])
        if mode == "c444":
            cb = np.repeat(
                np.repeat((doc_id * 11 + bx * 17 + by * 5) % mod, 8, 0), 8, 1
            )
            cr = np.repeat(
                np.repeat((doc_id * 3 + bx * 23 + by * 19) % mod, 8, 0), 8, 1
            )
            return enc([yplane, cb, cr], [(1, 1), (1, 1), (1, 1)])
        if mode == "c420":
            mx, my = np.meshgrid(np.arange(w // 16), np.arange(h // 16))
            cb = np.repeat(
                np.repeat((doc_id * 19 + mx * 7 + my * 13) % mod, 8, 0), 8, 1
            )
            cr = np.repeat(
                np.repeat((doc_id * 23 + mx * 29 + my * 3) % mod, 8, 0), 8, 1
            )
            return enc([yplane, cb, cr], [(2, 2), (1, 1), (1, 1)])
        raise ValueError(f"unknown JPEG fixture mode {mode!r}")

    class _BitReader:
        def __init__(self, data: bytes, pos: int):
            self.data = data
            self.pos = pos
            self.acc = 0
            self.n = 0

        def bit(self) -> int:
            if self.n == 0:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                b = self.data[self.pos]
                if b == 0xFF:
                    nxt = (
                        self.data[self.pos + 1]
                        if self.pos + 1 < len(self.data)
                        else None
                    )
                    if nxt != 0x00:
                        raise ValueError(
                            "marker inside JPEG entropy segment"
                        )
                    self.pos += 2  # stuffed 0xFF00 → literal 0xFF
                else:
                    self.pos += 1
                # mask off consumed high bits (n == 0 here, so the
                # refill IS the whole accumulator) — without the mask
                # acc grows into a bigint proportional to the stream
                # length and every read goes O(stream) (ADVICE r10)
                self.acc = b
                self.n = 8
            self.n -= 1
            return (self.acc >> self.n) & 1

        def bits(self, n: int) -> int:
            v = 0
            for _ in range(n):
                v = (v << 1) | self.bit()
            return v

        def restart_marker(self) -> int:
            """Byte-align (drop pad bits) and consume one RSTn."""
            self.acc = 0
            self.n = 0
            if (
                self.pos + 1 >= len(self.data)
                or self.data[self.pos] != 0xFF
            ):
                raise ValueError("missing JPEG restart marker")
            m = self.data[self.pos + 1]
            self.pos += 2
            return m

    def _huff_decode(reader, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def _next_marker(payload: bytes, p: int) -> int:
        """First real marker position at/after ``p``: entropy bytes
        contain 0xFF only as stuffed 0xFF00, so skip until a 0xFF with
        a non-zero follower."""
        while p + 1 < len(payload) and not (
            payload[p] == 0xFF and payload[p + 1] != 0x00
        ):
            p += 1
        if p + 1 >= len(payload):
            raise ValueError("truncated JPEG entropy stream")
        return p

    def _arith_seq_scan(
        np,
        A,
        payload,
        data_start,
        comps,
        prec,
        qtabs,
        dac,
        scan_tables,
        restart_interval,
        mcux,
        mcuy,
        shift,
    ):
        """Sequential (SOF9) arithmetic-coded scan: the Huffman MCU
        loop's twin with QM decoding — per-table adaptive statistics,
        DAC (or default) conditioning, RSTn realignment resetting the
        statistics AND the coder (F.1.4.4: restart reinitializes the
        arithmetic decoder and all statistics areas)."""
        ncomp = len(comps)
        dc_stats: dict = {}
        ac_stats: dict = {}

        def stats_for(ci):
            cid = comps[ci][0]
            if cid not in scan_tables:
                raise ValueError(f"component {cid} missing from SOS")
            td, ta = scan_tables[cid]
            if td not in dc_stats:
                dc_stats[td] = bytearray(64)
            if ta not in ac_stats:
                ac_stats[ta] = bytearray(256)
            cond_dc = dac.get((0, td), (_ARITH_DC_L, _ARITH_DC_U))
            cond_kx = dac.get((1, ta), _ARITH_AC_KX)
            return dc_stats[td], ac_stats[ta], cond_dc, cond_kx

        fixed = bytearray([113])
        dec = _ArithDecoder(payload, data_start)
        planes = [
            np.zeros((mcuy * vv * 8, mcux * hh * 8))
            for _, hh, vv, _ in comps
        ]
        pred = [0] * ncomp
        dc_ctx = [0] * ncomp
        mcu_count = 0
        rst_expect = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    p = (
                        dec.marker_pos
                        if dec.marker_pos is not None
                        else dec.bp
                    )
                    p = _next_marker(payload, p)
                    m = payload[p + 1]
                    if m != 0xD0 + rst_expect:
                        raise ValueError(
                            f"expected RST{rst_expect}, got marker {m:02x}"
                        )
                    rst_expect = (rst_expect + 1) % 8
                    pred = [0] * ncomp
                    dc_ctx = [0] * ncomp
                    for st in dc_stats.values():
                        st[:] = bytes(len(st))
                    for st in ac_stats.values():
                        st[:] = bytes(len(st))
                    dec = _ArithDecoder(payload, p + 2)
                for ci, (cid, hh, vv, tq) in enumerate(comps):
                    dc_st, ac_st, (L, U), kx = stats_for(ci)
                    q = qtabs.get(tq)
                    if q is None:
                        raise ValueError("missing JPEG quant table")
                    for by in range(vv):
                        for bx in range(hh):
                            pred[ci] += _arith_dec_dc(
                                dec, dc_st, dc_ctx, ci, L, U, prec
                            )
                            vals = _arith_dec_ac(
                                dec, ac_st, fixed, kx, prec
                            )
                            S = np.zeros((8, 8))
                            S[0, 0] = pred[ci] * q[0, 0]
                            for k in range(1, 64):
                                v = vals[k]
                                if v:
                                    r, c = _zz[k]
                                    S[r, c] = v * q[r, c]
                            blk = A.T @ S @ A + shift
                            y0 = (my * vv + by) * 8
                            x0 = (mx * hh + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
                mcu_count += 1
        # EOI must follow (unconsumed flush remnants allowed)
        p = dec.marker_pos if dec.marker_pos is not None else dec.bp
        p = _next_marker(payload, p)
        if payload[p + 1] != 0xD9:
            raise ValueError("missing JPEG EOI")
        return planes

    def _arith_prog_scan(
        payload, seg, data_start, sof, dac, prog_state, restart_interval
    ) -> int:
        """Decode ONE progressive ARITHMETIC (SOF10) scan's entropy
        data into the shared coefficient state; returns the offset of
        the next marker. Scan kinds per T.81 G.1.3: DC first
        (sequential DC model on the point-transformed diffs), DC
        refinement (one fixed-bin decision per block), AC first
        (band-limited sequential AC model), AC refinement (the
        G.1.3.3 history-conditioned model). Each scan — and each
        restart interval — reinitializes the decoder and every
        statistics area."""
        import numpy as np

        H, W, comps, prec = sof
        if not prog_state:
            hmax, vmax, mcux, mcuy, grid, real = _prog_geometry(sof)
            prog_state.update(
                hmax=hmax, vmax=vmax, mcux=mcux, mcuy=mcuy,
                grid=grid, real=real,
                coefs=[
                    np.zeros((bh, bw, 64), dtype=np.int64)
                    for bh, bw in grid
                ],
            )
        ns = seg[0]
        scomps = []
        cids = [cid for cid, _, _, _ in comps]
        for i in range(ns):
            cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
            if cs not in cids:
                raise ValueError(f"component {cs} missing from SOF")
            scomps.append((cids.index(cs), tt >> 4, tt & 0xF))
        Ss, Se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
        Ah, Al = ahal >> 4, ahal & 0xF
        if Ss == 0 and Se != 0:
            raise ValueError(
                "invalid progressive spectral selection (DC scan must "
                "have Se=0; a baseline-shaped 0..63 scan is not a "
                "valid progressive scan)"
            )
        if Ss > 0 and ns != 1:
            raise ValueError(
                "progressive AC scan must be single-component"
            )
        if Ss > 0 and (Se > 63 or Ss > Se):
            raise ValueError("invalid progressive spectral band")
        coefs = prog_state["coefs"]

        def units():
            if ns > 1:
                for my in range(prog_state["mcuy"]):
                    for mx in range(prog_state["mcux"]):
                        blocks = []
                        for ci, td, ta in scomps:
                            _, hh, vv, _ = comps[ci]
                            for by in range(vv):
                                for bx in range(hh):
                                    blocks.append(
                                        (ci, my * vv + by, mx * hh + bx)
                                    )
                        yield blocks
            else:
                ci = scomps[0][0]
                bh, bw = prog_state["real"][ci]
                for by in range(bh):
                    for bx in range(bw):
                        yield [(ci, by, bx)]

        tabs = {ci: (td, ta) for ci, td, ta in scomps}

        def fresh_stats():
            return (
                {ci: 0 for ci, _, _ in scomps},  # dc contexts
                {td: bytearray(64) for _, td, _ in scomps},
                {ta: bytearray(256) for _, _, ta in scomps},
            )

        fixed = bytearray([113])
        dec = _ArithDecoder(payload, data_start)
        dc_ctx, dc_sts, ac_sts = fresh_stats()
        pred = {ci: 0 for ci, _, _ in scomps}
        count = 0
        rst_expect = 0
        for blocks in units():
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                p = (
                    dec.marker_pos
                    if dec.marker_pos is not None
                    else dec.bp
                )
                p = _next_marker(payload, p)
                m = payload[p + 1]
                if m != 0xD0 + rst_expect:
                    raise ValueError(
                        f"expected RST{rst_expect}, got marker {m:02x}"
                    )
                rst_expect = (rst_expect + 1) % 8
                dc_ctx, dc_sts, ac_sts = fresh_stats()
                pred = {ci: 0 for ci, _, _ in scomps}
                dec = _ArithDecoder(payload, p + 2)
            for ci, by, bx in blocks:
                band = coefs[ci][by, bx]
                td, ta = tabs[ci]
                if Ss == 0:
                    if Ah == 0:  # DC first
                        L, U = dac.get(
                            (0, td), (_ARITH_DC_L, _ARITH_DC_U)
                        )
                        pred[ci] += _arith_dec_dc(
                            dec, dc_sts[td], dc_ctx, ci, L, U, prec
                        )
                        band[0] = pred[ci] << Al
                    else:  # DC refinement: one fixed-bin decision
                        if dec.decode(fixed, 0):
                            band[0] = int(band[0]) | (1 << Al)
                elif Ah == 0:  # AC first
                    kx = dac.get((1, ta), _ARITH_AC_KX)
                    vals = _arith_dec_ac(
                        dec, ac_sts[ta], fixed, kx, prec, ss=Ss, se=Se
                    )
                    for k in range(Ss, Se + 1):
                        if vals[k]:
                            band[k] = vals[k] << Al
                else:  # AC refinement
                    _arith_dec_ac_refine(
                        dec, ac_sts[ta], fixed, band, Ss, Se, Al
                    )
            count += 1
        p = dec.marker_pos if dec.marker_pos is not None else dec.bp
        return _next_marker(payload, p)

    def _lossless_scan(
        payload, seg, data_start, sof, htabs, loss_state, restart_interval
    ) -> int:
        """Decode ONE lossless (SOF3) scan — T.81 Annex H: Huffman
        category + magnitude bits per difference, neighborhood
        prediction (selector in Ss, 1..7) over reconstructed samples,
        all arithmetic modulo 65536, point transform honored, RSTn
        resets the prediction to start-of-scan conditions. Components
        decode non-interleaved per scan; a multi-component scan is
        accepted only when every scan component samples at 1x1 —
        per T.81 H.2.3 an interleaved MCU carries Hi x Vi samples per
        component (ABSOLUTE factors, even when uniform), and our
        one-sample-per-component MCU order is correct exactly for
        Hi = Vi = 1 (ADVICE r12 low)."""
        import numpy as np

        H, W, comps, prec = sof
        hmax = max(hh for _, hh, vv, _ in comps)
        vmax = max(vv for _, hh, vv, _ in comps)
        planes = loss_state.setdefault("planes", {})
        ns = seg[0]
        cids = [cid for cid, _, _, _ in comps]
        scomps = []
        for i in range(ns):
            cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
            if cs not in cids:
                raise ValueError(f"component {cs} missing from SOF")
            scomps.append((cids.index(cs), tt >> 4))
        pred_sel = seg[1 + 2 * ns]
        se, ahal = seg[2 + 2 * ns], seg[3 + 2 * ns]
        pt = ahal & 0xF
        if not 1 <= pred_sel <= 7:
            raise ValueError(
                f"invalid lossless predictor {pred_sel} (Ss must be 1..7)"
            )
        if se != 0 or (ahal >> 4) != 0:
            raise ValueError("invalid lossless scan header (Se/Ah)")
        if ns > 1 and any(
            (comps[ci][1], comps[ci][2]) != (1, 1) for ci, _ in scomps
        ):
            # T.81 H.2.3: interleaved MCUs hold HixVi samples per
            # component in raster sub-order — our single-sample MCU
            # walk would scramble any sampling other than 1x1.
            raise NotImplementedError(
                "interleaved lossless scan with non-1x1 sampling"
            )
        dims = {}
        tabs = {}
        for ci, td in scomps:
            _, hh, vv, _ = comps[ci]
            dims[ci] = (-(-H * vv // vmax), -(-W * hh // hmax))
            planes[ci] = np.zeros(dims[ci], dtype=np.int64)
            t = htabs.get((0, td))
            if t is None:
                raise ValueError("missing JPEG Huffman table")
            tabs[ci] = t
        reader = _BitReader(payload, data_start)

        def mcu_units():
            if ns == 1:
                ci = scomps[0][0]
                h_i, w_i = dims[ci]
                for y in range(h_i):
                    for x in range(w_i):
                        yield ((ci, y, x),)
            else:
                h_i, w_i = dims[scomps[0][0]]
                for y in range(h_i):
                    for x in range(w_i):
                        yield tuple((ci, y, x) for ci, _ in scomps)

        fresh = {ci: True for ci, _ in scomps}
        count = 0
        rst_expect = 0
        for unit in mcu_units():
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                m = reader.restart_marker()
                if m != 0xD0 + rst_expect:
                    raise ValueError(
                        f"expected RST{rst_expect}, got marker {m:02x}"
                    )
                rst_expect = (rst_expect + 1) % 8
                fresh = {ci: True for ci, _ in scomps}
            for ci, y, x in unit:
                n = _huff_decode(reader, tabs[ci])
                if n > 16:
                    raise ValueError("invalid JPEG lossless category")
                if n == 16:  # T.81 H.1.2.2: SSSS=16 codes 32768 raw
                    diff = 32768
                elif n:
                    raw = reader.bits(n)
                    diff = (
                        raw
                        if raw >= (1 << (n - 1))
                        else raw - (1 << n) + 1
                    )
                else:
                    diff = 0
                plane = planes[ci]
                px = _lossless_predict(
                    plane, y, x, pred_sel, prec, pt, fresh[ci]
                )
                fresh[ci] = False
                plane[y, x] = (px + diff) & 0xFFFF
            count += 1
        if pt:  # output = reconstructed reduced-precision sample << Pt
            for ci, _ in scomps:
                planes[ci] <<= pt
        p = reader.pos
        while p + 1 < len(payload) and not (
            payload[p] == 0xFF and payload[p + 1] != 0x00
        ):
            p += 1
        if p + 1 >= len(payload):
            raise ValueError("truncated JPEG after lossless scan")
        return p

    def _lossless_arith_scan(
        payload, seg, data_start, sof, dac, loss_state, restart_interval
    ) -> int:
        """Decode ONE lossless ARITHMETIC (SOF11) scan — the QM-coded
        twin of ``_lossless_scan``: identical Annex-H prediction,
        point transform, mod-65536 reconstruction, 1x1-only
        interleave rule and RSTn reset semantics, with each
        difference decoded by the 2-D conditioned DC model
        (``_arith_dec_diff``) under the scan components' DAC (or
        default) DC conditioning. Restart reinitializes the decoder,
        the statistics areas and the conditioning history."""
        import numpy as np

        H, W, comps, prec = sof
        hmax = max(hh for _, hh, vv, _ in comps)
        vmax = max(vv for _, hh, vv, _ in comps)
        planes = loss_state.setdefault("planes", {})
        ns = seg[0]
        cids = [cid for cid, _, _, _ in comps]
        scomps = []
        for i in range(ns):
            cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
            if cs not in cids:
                raise ValueError(f"component {cs} missing from SOF")
            scomps.append((cids.index(cs), tt >> 4))
        pred_sel = seg[1 + 2 * ns]
        se, ahal = seg[2 + 2 * ns], seg[3 + 2 * ns]
        pt = ahal & 0xF
        if not 1 <= pred_sel <= 7:
            raise ValueError(
                f"invalid lossless predictor {pred_sel} (Ss must be 1..7)"
            )
        if se != 0 or (ahal >> 4) != 0:
            raise ValueError("invalid lossless scan header (Se/Ah)")
        if ns > 1 and any(
            (comps[ci][1], comps[ci][2]) != (1, 1) for ci, _ in scomps
        ):
            raise NotImplementedError(
                "interleaved lossless scan with non-1x1 sampling"
            )
        dims = {}
        conds = {}
        stats: dict = {}
        dplanes = {}
        for ci, td in scomps:
            _, hh, vv, _ = comps[ci]
            dims[ci] = (-(-H * vv // vmax), -(-W * hh // hmax))
            planes[ci] = np.zeros(dims[ci], dtype=np.int64)
            dplanes[ci] = np.zeros(dims[ci], dtype=np.int64)
            conds[ci] = dac.get((0, td), (_ARITH_DC_L, _ARITH_DC_U))
            if td not in stats:
                stats[td] = bytearray(_LL_STATS)
            conds[ci] = (*conds[ci], td)

        def mcu_units():
            if ns == 1:
                ci = scomps[0][0]
                h_i, w_i = dims[ci]
                for y in range(h_i):
                    for x in range(w_i):
                        yield ((ci, y, x),)
            else:
                h_i, w_i = dims[scomps[0][0]]
                for y in range(h_i):
                    for x in range(w_i):
                        yield tuple((ci, y, x) for ci, _ in scomps)

        dec = _ArithDecoder(payload, data_start)
        fresh = {ci: True for ci, _ in scomps}
        count = 0
        rst_expect = 0
        for unit in mcu_units():
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                p = (
                    dec.marker_pos
                    if dec.marker_pos is not None
                    else dec.bp
                )
                p = _next_marker(payload, p)
                m = payload[p + 1]
                if m != 0xD0 + rst_expect:
                    raise ValueError(
                        f"expected RST{rst_expect}, got marker {m:02x}"
                    )
                rst_expect = (rst_expect + 1) % 8
                fresh = {ci: True for ci, _ in scomps}
                for st in stats.values():
                    st[:] = bytes(len(st))
                for dp in dplanes.values():
                    dp[:] = 0
                dec = _ArithDecoder(payload, p + 2)
            for ci, y, x in unit:
                L, U, td = conds[ci]
                dp = dplanes[ci]
                da = int(dp[y, x - 1]) if x else 0
                db = int(dp[y - 1, x]) if y else 0
                diff = _arith_dec_diff(dec, stats[td], da, db, L, U)
                dp[y, x] = diff
                plane = planes[ci]
                px = _lossless_predict(
                    plane, y, x, pred_sel, prec, pt, fresh[ci]
                )
                fresh[ci] = False
                plane[y, x] = (px + diff) & 0xFFFF
            count += 1
        if pt:  # output = reconstructed reduced-precision sample << Pt
            for ci, _ in scomps:
                planes[ci] <<= pt
        p = dec.marker_pos if dec.marker_pos is not None else dec.bp
        p = _next_marker(payload, p)
        if p + 1 >= len(payload):
            raise ValueError("truncated JPEG after lossless scan")
        return p

    def parse(payload: bytes) -> dict:
        import numpy as np

        A = np.asarray(_a_rows)
        if len(payload) < 2 or payload[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG file")
        pos = 2
        qtabs: dict = {}
        htabs: dict = {}
        sof = None
        progressive = False
        arith = False
        lossless = False
        dac: dict = {}  # (class, table) -> conditioning, DAC marker
        prog_state: dict = {}  # geometry + coefficient arrays, lazy
        loss_state: dict = {}  # per-component sample planes, lazy
        scans_done = 0
        restart_interval = 0
        seg = b""
        while True:
            if pos + 2 > len(payload):
                raise ValueError("truncated JPEG marker stream")
            if payload[pos] != 0xFF:
                raise ValueError(f"bad JPEG marker byte at offset {pos}")
            marker = payload[pos + 1]
            if marker == 0xD9:
                if (progressive or lossless) and scans_done:
                    break  # multi-scan streams end at EOI
                raise ValueError("EOI before SOS")
            if pos + 4 > len(payload):
                raise ValueError("truncated JPEG marker stream")
            (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            seg = payload[pos + 4 : pos + 2 + seglen]
            if len(seg) != seglen - 2:
                raise ValueError("truncated JPEG segment")
            nxt = pos + 2 + seglen
            if marker == 0xDB:  # DQT (possibly several tables)
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0xF
                    if pq not in (0, 1):
                        raise ValueError(f"invalid DQT precision {pq}")
                    width = 1 + pq  # Pq=1: 16-bit big-endian entries
                    if i + 1 + 64 * width > len(seg):
                        raise ValueError("truncated DQT table")
                    tab = np.zeros((8, 8), dtype=np.int64)
                    for k in range(64):
                        r, c = _zz[k]
                        off = i + 1 + k * width
                        tab[r, c] = (
                            seg[off]
                            if pq == 0
                            else (seg[off] << 8) | seg[off + 1]
                        )
                    qtabs[tq] = tab
                    i += 1 + 64 * width
            elif marker == 0xC4:  # DHT (possibly several tables)
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0xF
                    bits = list(seg[i + 1 : i + 17])
                    nv = sum(bits)
                    vals = list(seg[i + 17 : i + 17 + nv])
                    if len(vals) != nv:
                        raise ValueError("truncated DHT table")
                    htabs[(tc, th)] = {
                        (code, ln): sym
                        for sym, (code, ln) in _canonical_codes(
                            bits, vals
                        ).items()
                    }
                    i += 17 + nv
            elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
                # baseline / ext-seq / progressive / lossless /
                # ext-seq arith / progressive arith / lossless arith
                prec, H, W, nc = struct.unpack(">BHHB", seg[:6])
                if prec == 12 and marker == 0xC0:
                    raise ValueError(
                        "12-bit precision requires extended-sequential "
                        "(SOF1) or progressive (SOF2), not baseline SOF0"
                    )
                if marker in (0xC3, 0xCB):
                    if not 2 <= prec <= 16:
                        raise ValueError(
                            f"invalid lossless precision {prec}"
                        )
                elif prec not in (8, 12):
                    raise NotImplementedError(f"{prec}-bit JPEG precision")
                comps = []
                for i in range(nc):
                    cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                    comps.append((cid, hv >> 4, hv & 0xF, tq))
                sof = (H, W, comps, prec)
                progressive = marker in (0xC2, 0xCA)
                arith = marker in (0xC9, 0xCA, 0xCB)
                lossless = marker in (0xC3, 0xCB)
            elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    "differential (hierarchical) JPEG process"
                )
            elif marker == 0xCC:  # DAC: arithmetic conditioning
                i = 0
                while i + 1 < len(seg):
                    tc, tb = seg[i] >> 4, seg[i] & 0xF
                    cs = seg[i + 1]
                    if tc == 0:  # DC: Cs = (U << 4) | L, need L <= U
                        L, U = cs & 0xF, cs >> 4
                        if L > U:
                            raise ValueError(
                                "invalid JPEG DC arithmetic conditioning"
                            )
                        dac[(0, tb)] = (L, U)
                    elif tc == 1:  # AC: Cs = Kx in 1..63
                        if not 1 <= cs <= 63:
                            raise ValueError(
                                "invalid JPEG AC arithmetic conditioning"
                            )
                        dac[(1, tb)] = cs
                    else:
                        raise ValueError("invalid DAC table class")
                    i += 2
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", seg)
            elif marker == 0xDA:  # SOS — entropy data follows
                if lossless:
                    if sof is None:
                        raise ValueError("JPEG SOS before SOF")
                    if arith:
                        pos = _lossless_arith_scan(
                            payload,
                            seg,
                            nxt,
                            sof,
                            dac,
                            loss_state,
                            restart_interval,
                        )
                    else:
                        pos = _lossless_scan(
                            payload,
                            seg,
                            nxt,
                            sof,
                            htabs,
                            loss_state,
                            restart_interval,
                        )
                    scans_done += 1
                    continue
                if not progressive:
                    break
                if sof is None:
                    raise ValueError("JPEG SOS before SOF")
                if arith:
                    pos = _arith_prog_scan(
                        payload,
                        seg,
                        nxt,
                        sof,
                        dac,
                        prog_state,
                        restart_interval,
                    )
                else:
                    pos = _prog_scan(
                        payload,
                        seg,
                        nxt,
                        sof,
                        qtabs,
                        htabs,
                        prog_state,
                        restart_interval,
                    )
                scans_done += 1
                continue
            # APPn / COM / other tables: skip
            pos = nxt
        if sof is None:
            raise ValueError("JPEG SOS before SOF")
        H, W, comps, prec = sof
        shift = float(1 << (prec - 1))
        hmax = max(hh for _, hh, vv, _ in comps)
        vmax = max(vv for _, hh, vv, _ in comps)
        for cid, hh, vv, _ in comps:
            if hmax % hh or vmax % vv:
                raise ValueError(
                    f"unsupported sampling {hh}x{vv} for component {cid}"
                )
        mcux = (W + 8 * hmax - 1) // (8 * hmax)
        mcuy = (H + 8 * vmax - 1) // (8 * vmax)
        if lossless:
            # all scans decoded: the planes ARE the samples
            planes = []
            for ci in range(len(comps)):
                pl = loss_state.get("planes", {}).get(ci)
                if pl is None:
                    raise ValueError(
                        "lossless frame missing a component scan"
                    )
                planes.append(pl.astype(np.float64))
            return _assemble(np, planes, comps, H, W, hmax, vmax, prec)
        if progressive:
            # all scans decoded: dequantize + de-zigzag + batch IDCT
            planes = []
            for ci, (cid, hh, vv, tq) in enumerate(comps):
                q = qtabs.get(tq)
                if q is None:
                    raise ValueError("missing JPEG quant table")
                arr = prog_state["coefs"][ci]  # (bh, bw, 64) zigzag
                S = np.zeros(arr.shape[:2] + (8, 8))
                for k, (r, c) in enumerate(_zz):
                    S[:, :, r, c] = arr[:, :, k] * q[r, c]
                blk = np.einsum("ki,mnkl,lj->mnij", A, S, A) + shift
                planes.append(
                    blk.transpose(0, 2, 1, 3).reshape(
                        arr.shape[0] * 8, arr.shape[1] * 8
                    )
                )
            return _assemble(
                np, planes, comps, H, W, hmax, vmax, prec
            )
        scan_tables = {}
        for i in range(seg[0]):
            cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
            scan_tables[cs] = (tt >> 4, tt & 0xF)
        if arith:
            planes = _arith_seq_scan(
                np,
                A,
                payload,
                nxt,
                comps,
                prec,
                qtabs,
                dac,
                scan_tables,
                restart_interval,
                mcux,
                mcuy,
                shift,
            )
            return _assemble(np, planes, comps, H, W, hmax, vmax, prec)
        reader = _BitReader(payload, nxt)
        planes = [
            np.zeros((mcuy * vv * 8, mcux * hh * 8))
            for _, hh, vv, _ in comps
        ]
        pred = [0] * len(comps)
        mcu_count = 0
        rst_expect = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    m = reader.restart_marker()
                    if m != 0xD0 + rst_expect:
                        raise ValueError(
                            f"expected RST{rst_expect}, got marker {m:02x}"
                        )
                    rst_expect = (rst_expect + 1) % 8
                    pred = [0] * len(comps)
                for ci, (cid, hh, vv, tq) in enumerate(comps):
                    if cid not in scan_tables:
                        raise ValueError(f"component {cid} missing from SOS")
                    td, ta = scan_tables[cid]
                    dct = htabs.get((0, td))
                    act = htabs.get((1, ta))
                    if dct is None or act is None:
                        raise ValueError("missing JPEG Huffman table")
                    q = qtabs.get(tq)
                    if q is None:
                        raise ValueError("missing JPEG quant table")
                    for by in range(vv):
                        for bx in range(hh):
                            n = _huff_decode(reader, dct)
                            if n > (11 if prec == 8 else 15):
                                raise ValueError("invalid JPEG DC category")
                            diff = 0
                            if n:
                                raw = reader.bits(n)
                                diff = (  # T.81 EXTEND
                                    raw
                                    if raw >= (1 << (n - 1))
                                    else raw - (1 << n) + 1
                                )
                            pred[ci] += diff
                            S = np.zeros((8, 8))
                            S[0, 0] = pred[ci] * q[0, 0]
                            k = 1
                            while k < 64:
                                sym = _huff_decode(reader, act)
                                if sym == 0x00:  # EOB
                                    break
                                if sym == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                run, size = sym >> 4, sym & 0xF
                                k += run
                                if k > 63:
                                    raise ValueError("JPEG AC index overrun")
                                raw = reader.bits(size)
                                val = (
                                    raw
                                    if raw >= (1 << (size - 1))
                                    else raw - (1 << size) + 1
                                )
                                r, c = _zz[k]
                                S[r, c] = val * q[r, c]
                                k += 1
                            blk = A.T @ S @ A + shift
                            y0 = (my * vv + by) * 8
                            x0 = (mx * hh + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
                mcu_count += 1
        p = reader.pos  # pad bits, then EOI must follow
        if p + 1 >= len(payload) or payload[p] != 0xFF or payload[p + 1] != 0xD9:
            raise ValueError("missing JPEG EOI")
        return _assemble(np, planes, comps, H, W, hmax, vmax, prec)

    def _assemble(np, planes, comps, H, W, hmax, vmax, prec=8) -> dict:
        """Shared output stage of the baseline and progressive paths:
        round/clamp, chroma upsample by replication, crop to the frame,
        JFIF YCbCr→RGB (floor(x+0.5), mirrored in the oracle SQL).
        12-bit frames clamp to [0, 4095] around a 2048 chroma center —
        same matrix, wider range."""
        mx = float((1 << prec) - 1)
        ctr = float(1 << (prec - 1))
        outs = []
        for ci, (cid, hh, vv, tq) in enumerate(comps):
            pl = np.clip(np.floor(planes[ci] + 0.5), 0, mx)
            pl = np.repeat(
                np.repeat(pl, vmax // vv, axis=0), hmax // hh, axis=1
            )
            outs.append(pl[:H, :W])
        if len(comps) == 1:
            return {
                "width": W,
                "height": H,
                "gray": outs[0].astype(np.int64),
                "rgb": None,
            }
        if len(comps) != 3:
            raise ValueError(f"{len(comps)}-component JPEG not supported")
        yy, cb, cr = outs
        r = np.clip(np.floor(yy + 1.402 * (cr - ctr) + 0.5), 0, mx)
        g = np.clip(
            np.floor(
                yy - 0.344136 * (cb - ctr) - 0.714136 * (cr - ctr) + 0.5
            ),
            0,
            mx,
        )
        b = np.clip(np.floor(yy + 1.772 * (cb - ctr) + 0.5), 0, mx)
        return {
            "width": W,
            "height": H,
            "gray": None,
            "rgb": np.stack([r, g, b], axis=2).astype(np.int64),
        }

    def _prog_geometry(sof):
        """(hmax, vmax, mcux, mcuy, per-comp MCU-grid block shapes,
        per-comp REAL block shapes) — non-interleaved scans cover only
        the real grid; interleaved DC scans cover MCU padding too."""
        H, W, comps, _prec = sof
        hmax = max(hh for _, hh, vv, _ in comps)
        vmax = max(vv for _, hh, vv, _ in comps)
        for cid, hh, vv, _ in comps:
            if hmax % hh or vmax % vv:
                raise ValueError(
                    f"unsupported sampling {hh}x{vv} for component {cid}"
                )
        mcux = (W + 8 * hmax - 1) // (8 * hmax)
        mcuy = (H + 8 * vmax - 1) // (8 * vmax)
        grid = [(mcuy * vv, mcux * hh) for _, hh, vv, _ in comps]
        real = [
            (
                (-(-(H * vv) // vmax) + 7) // 8,
                (-(-(W * hh) // hmax) + 7) // 8,
            )
            for _, hh, vv, _ in comps
        ]
        return hmax, vmax, mcux, mcuy, grid, real

    def _ac_first_band(reader, act, band, Ss, Se, Al, eobrun):
        """One block of a progressive AC FIRST scan (T.81 G.1.2.2):
        run/size symbols over the point-transformed band, EOBn run
        lengths shared across blocks. Returns the remaining EOBRUN."""
        if eobrun > 0:
            return eobrun - 1
        k = Ss
        while k <= Se:
            sym = _huff_decode(reader, act)
            r, s = sym >> 4, sym & 15
            if s:
                k += r
                if k > Se:
                    raise ValueError("JPEG AC index overrun")
                raw = reader.bits(s)
                val = raw if raw >= (1 << (s - 1)) else raw - (1 << s) + 1
                band[k] = val << Al
                k += 1
            else:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.bits(r)
                    return eobrun
                k += 16  # ZRL
        return 0

    def _ac_refine_band(reader, act, band, Ss, Se, Al, eobrun):
        """One block of a progressive AC REFINEMENT scan (T.81
        G.1.2.3): newly-significant coefficients arrive as run/1
        symbols + sign bit, already-significant ones as correction
        bits read while advancing. Returns the remaining EOBRUN."""
        p1 = 1 << Al
        m1 = -(1 << Al)
        k = Ss
        if eobrun == 0:
            while k <= Se:
                sym = _huff_decode(reader, act)
                r, s = sym >> 4, sym & 15
                if s:
                    if s != 1:
                        raise ValueError(
                            "invalid JPEG AC refinement symbol"
                        )
                    s_val = p1 if reader.bit() else m1
                else:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.bits(r)
                        break
                    s_val = 0  # ZRL: skip 16 zero-history positions
                while k <= Se:
                    c = int(band[k])
                    if c != 0:
                        if reader.bit() and (c & p1) == 0:
                            band[k] = c + (p1 if c >= 0 else m1)
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if s_val:
                    if k > Se:
                        raise ValueError("JPEG AC refinement overrun")
                    band[k] = s_val
                k += 1
        if eobrun > 0:
            while k <= Se:
                c = int(band[k])
                if c != 0:
                    if reader.bit() and (c & p1) == 0:
                        band[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1
        return eobrun

    def _prog_scan(
        payload, seg, data_start, sof, qtabs, htabs, prog_state,
        restart_interval,
    ) -> int:
        """Decode ONE progressive SOS scan's entropy data into the
        shared coefficient state; returns the offset of the next
        marker. Scan kinds per T.81 G.1: DC first (interleaved allowed,
        Huffman category + EXTEND on the point-transformed diffs), DC
        refinement (one raw bit per block), AC first / AC refinement
        (single-component only, spectral band [Ss, Se])."""
        import numpy as np

        H, W, comps, prec = sof
        if not prog_state:
            hmax, vmax, mcux, mcuy, grid, real = _prog_geometry(sof)
            prog_state.update(
                hmax=hmax, vmax=vmax, mcux=mcux, mcuy=mcuy,
                grid=grid, real=real,
                coefs=[
                    np.zeros((bh, bw, 64), dtype=np.int64)
                    for bh, bw in grid
                ],
            )
        ns = seg[0]
        scomps = []
        cids = [cid for cid, _, _, _ in comps]
        for i in range(ns):
            cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
            if cs not in cids:
                raise ValueError(f"component {cs} missing from SOF")
            scomps.append((cids.index(cs), tt >> 4, tt & 0xF))
        Ss, Se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
        Ah, Al = ahal >> 4, ahal & 0xF
        if Ss == 0 and Se != 0:
            raise ValueError(
                "invalid progressive spectral selection (DC scan must "
                "have Se=0; a baseline-shaped 0..63 scan is not a "
                "valid progressive scan)"
            )
        if Ss > 0 and ns != 1:
            raise ValueError(
                "progressive AC scan must be single-component"
            )
        if Ss > 0 and (Se > 63 or Ss > Se):
            raise ValueError("invalid progressive spectral band")
        coefs = prog_state["coefs"]
        reader = _BitReader(payload, data_start)

        def units():
            if ns > 1:
                for my in range(prog_state["mcuy"]):
                    for mx in range(prog_state["mcux"]):
                        blocks = []
                        for ci, td, ta in scomps:
                            _, hh, vv, _ = comps[ci]
                            for by in range(vv):
                                for bx in range(hh):
                                    blocks.append(
                                        (ci, my * vv + by, mx * hh + bx)
                                    )
                        yield blocks
            else:
                ci = scomps[0][0]
                bh, bw = prog_state["real"][ci]
                for by in range(bh):
                    for bx in range(bw):
                        yield [(ci, by, bx)]

        pred = {ci: 0 for ci, _, _ in scomps}
        eobrun = 0
        count = 0
        rst_expect = 0
        dctabs = {}
        actab = None
        if Ss == 0 and Ah == 0:
            for ci, td, _ in scomps:
                t = htabs.get((0, td))
                if t is None:
                    raise ValueError("missing JPEG Huffman table")
                dctabs[ci] = t
        if Ss > 0:
            ta = scomps[0][2]
            actab = htabs.get((1, ta))
            if actab is None:
                raise ValueError("missing JPEG Huffman table")
        for blocks in units():
            if restart_interval and count and count % restart_interval == 0:
                m = reader.restart_marker()
                if m != 0xD0 + rst_expect:
                    raise ValueError(
                        f"expected RST{rst_expect}, got marker {m:02x}"
                    )
                rst_expect = (rst_expect + 1) % 8
                pred = {ci: 0 for ci, _, _ in scomps}
                eobrun = 0
            for ci, by, bx in blocks:
                band = coefs[ci][by, bx]
                if Ss == 0:
                    if Ah == 0:  # DC first
                        t = _huff_decode(reader, dctabs[ci])
                        if t > (11 if prec == 8 else 15):
                            raise ValueError("invalid JPEG DC category")
                        diff = 0
                        if t:
                            raw = reader.bits(t)
                            diff = (
                                raw
                                if raw >= (1 << (t - 1))
                                else raw - (1 << t) + 1
                            )
                        pred[ci] += diff
                        band[0] = pred[ci] << Al
                    else:  # DC refinement: one raw bit
                        if reader.bit():
                            band[0] = int(band[0]) | (1 << Al)
                elif Ah == 0:
                    eobrun = _ac_first_band(
                        reader, actab, band, Ss, Se, Al, eobrun
                    )
                else:
                    eobrun = _ac_refine_band(
                        reader, actab, band, Ss, Se, Al, eobrun
                    )
            count += 1
        p = reader.pos  # skip pad bits to the next marker
        while p + 1 < len(payload) and not (
            payload[p] == 0xFF and payload[p + 1] != 0x00
        ):
            p += 1
        if p + 1 >= len(payload):
            raise ValueError("truncated JPEG after progressive scan")
        return p

    # bin-level test hook: the QM coder classes stay closure-scoped
    # (module-level names would make every decode closure pickle by
    # reference and require the package on executor workers — the
    # documented foreign-cwd hazard), but pytest needs direct access
    # to drive raw statistics bins
    parse._qm = (_QM, _ArithEncoder, _ArithDecoder)
    # SOF11 encoder hook (same rationale as _qm: the 7-tuple shape is
    # unpacked at ~20 sites; the lossless-arith encoder rides as an
    # attribute instead of widening every unpack)
    parse._encode_lossless_arith = encode_lossless_arith
    return (
        build,
        parse,
        encode,
        encode_progressive,
        encode_arith,
        encode_arith_progressive,
        encode_lossless,
    )


def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode — the flagship codec boundary closed
    with pure math: per document, build a grayscale, a 4:4:4 color and
    a 4:2:0 subsampled genuine JFIF stream (FDCT + quantization +
    canonical Huffman + byte stuffing, executor-side) and decode them
    back through the general marker-walking, Huffman-decoding,
    IDCT-reconstructing reader. The fixtures are blockwise-constant so
    the lossy pipeline is exact end-to-end and the oracle re-derives
    every decoded pixel in closed form — a mistake anywhere in the
    zigzag, the DC prediction, the EXTEND sign recovery, the stuffing,
    the IDCT scaling, the 4:2:0 upsampling or the YCbCr matrix shifts
    values and fails the hash. The general AC path (which the DC-only
    fixtures cannot reach) is pinned by pytest against an independent
    reference IDCT on arbitrary images.

    At 100 TB: identical linear Arrow pipeline to the PNG/WAV/BMP
    decodes — payloads stay columnar on executors, one stats row per
    (media, variant)."""
    return _jpeg_decode_query(spark, sf_dir, progressive=False)


def multimodal_jpeg_progressive_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL progressive JPEG decode (round 11 — closing the last
    declared JPEG coding-process gap that is pure math): the same
    per-document gray / 4:4:4 / 4:2:0 fixtures as
    :func:`multimodal_jpeg_decode`, encoded as genuine SOF2 streams
    over the classic six-scan spectral-selection + successive-
    approximation schedule (DC first at Al=1, per-component AC first,
    DC refinement bits, per-component AC refinement with correction
    bits) and decoded through the general multi-scan reader —
    coefficient state across scans, EOBRUN, G.1.2.3 refinement. The
    schedule reconstructs every coefficient exactly, so the decoded
    pixels (and therefore the closed-form DuckDB oracle) are
    IDENTICAL to the baseline query's; the oracle hash pins the
    whole progressive pipeline end-to-end. Arbitrary-image
    progressive==baseline equality (the AC scan machinery the
    DC-only fixtures can't reach) is pinned by pytest. 12-bit
    precision and sequential arithmetic coding each have their own
    registered queries (rounds 11/12)."""
    return _jpeg_decode_query(spark, sf_dir, progressive=True)


def multimodal_jpeg12_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 12-bit extended-sequential JPEG decode (round 11 — the
    12-bit half of the then-remaining JPEG boundary closed; the
    arithmetic-coding half followed in round 12, see
    :func:`multimodal_jpeg_arith_decode`): the same gray / 4:4:4 /
    4:2:0 fixture
    formulas widened to mod-4096 samples, encoded as genuine SOF1
    streams (T.81: baseline SOF0 is 8-bit only) with the 16-category
    DC / 14-size AC canonical tables and a 2048 level shift, decoded
    through the same general reader — precision flows from the SOF
    into the level shift, the DC-category bound, the clamp range and
    the YCbCr chroma center. Same stats schema; the closed-form
    oracle is the baseline query's SQL with the 256/128/255 constants
    widened to 4096/2048/4095. 16-bit (Pq=1) DQT parsing rides along
    (12-bit streams commonly need it) and is pytest-pinned."""
    return _jpeg_decode_query(
        spark, sf_dir, progressive=False, precision=12
    )


def multimodal_jpeg_arith_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL arithmetic-coded JPEG decode (round 12 — the LAST declared
    JPEG entropy-coder boundary closed): the same gray / 4:4:4 / 4:2:0
    fixture formulas as :func:`multimodal_jpeg_decode`, encoded as
    genuine SOF9 extended-sequential streams through the T.81 QM coder
    (Table D.3 probability estimation, conditional MPS/LPS exchange,
    carry-stacked byte pipeline, DAC conditioning, byte stuffing) and
    decoded through the general marker walker — adaptive per-table
    statistics, F.1.4 DC/AC conditioning contexts, zero-fed marker
    ends, RSTn statistics resets. The QM schedule is lossless under
    the all-ones quantizer, so the decoded pixels (and the closed-form
    DuckDB oracle) are IDENTICAL to the baseline query's. Arbitrary-
    image arithmetic==baseline equality (the adaptive AC machinery the
    DC-only fixtures can't reach) is pinned by pytest. The progressive
    arithmetic process (SOF10) has its own registered query
    (:func:`multimodal_jpeg_prog_arith_decode`) and the lossless
    process its own (:func:`multimodal_jpeg_lossless_decode`,
    which since round 13 also carries the SOF11 lossless-arithmetic
    twin); the remaining JPEG boundary is the differential/
    hierarchical process family — loud NotImplementedError, pinned
    in SURVEY §2.12."""
    return _jpeg_decode_query(
        spark, sf_dir, progressive=False, arithmetic=True
    )


def multimodal_jpeg_prog_arith_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL progressive ARITHMETIC-coded JPEG decode (round 12 — the
    SOF10 process, closing the second half of the arithmetic
    boundary): the same fixtures as :func:`multimodal_jpeg_decode`,
    encoded over the classic six-scan progressive schedule with the
    QM coder per T.81 G.1.3 (per-scan coder + statistics reset,
    fixed-bin DC refinement, band-limited sequential model for AC
    first scans, history-conditioned G.1.3.3 refinement — arithmetic
    progressive has no EOB runs) and decoded through the general
    multi-scan marker walk. The schedule reconstructs coefficients
    exactly, so pixels (and the shared closed-form oracle) equal the
    baseline query's. Remaining JPEG boundary after round 13: only
    the differential/hierarchical processes."""
    return _jpeg_decode_query(
        spark, sf_dir, progressive=True, arithmetic=True
    )


def multimodal_jpeg_lossless_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL lossless JPEG decode (round 12 — the SOF3 predictive
    process, T.81 Annex H): no DCT or quantizer; per-sample
    differences from a neighborhood predictor (selector 1..7 — the
    fixtures rotate planar/average/gradient selectors across the
    gray / 4:4:4 / 4:2:0 variants) Huffman coded with the DC
    category + magnitude-bits mechanism, arithmetic modulo 65536,
    point transform honored, per-component non-interleaved scans,
    RSTn prediction resets. Round 13 folds the SOF11 process into the
    same query: each fixture ALSO decodes as a lossless ARITHMETIC
    stream ('<mode>_a11' variants) — the Annex-H predictor front end
    with the QM coder's 2-D conditioned DC model (T.81 H.1.2.3)
    replacing Huffman. Both processes are sample-exact by
    construction, so the decoded pixels — and the closed-form oracle
    (baseline rows plus their '_a11' twins) — equal the baseline
    query's on the blockwise-constant fixtures, while pytest pins
    exact round-trips of arbitrary random images under every
    predictor for both coders. The only JPEG processes left are the
    differential/hierarchical ones — loud NotImplementedError,
    permanently pinned in SURVEY §2.12."""
    return _jpeg_decode_query(spark, sf_dir, progressive=False, lossless=True)


def _jpeg_decode_query(
    spark: SparkSession,
    sf_dir: str,
    progressive: bool,
    precision: int = 8,
    arithmetic: bool = False,
    lossless: bool = False,
) -> DataFrame:
    build, parse, _, _, _, _, _ = make_jpeg_codec()

    def decode(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {
                "media_id": [],
                "variant": [],
                "mean_r": [],
                "mean_g": [],
                "mean_b": [],
                "top_row_sum": [],
            }
            # the lossless query carries BOTH entropy coders: each
            # fixture mode decodes as Huffman SOF3 and as QM-coded
            # SOF11 ('<mode>_a11'), so the arithmetic process is
            # driver-attested through the same oracle (round 13 —
            # the last pure-math JPEG process)
            coders = (
                [(False, ""), (True, "_a11")]
                if lossless
                else [(arithmetic, "")]
            )
            for did in pdf["doc_id"]:
                for mode in ("gray", "c444", "c420"):
                    for arith_c, suffix in coders:
                        img = parse(
                            build(
                                int(did),
                                mode,
                                progressive=progressive,
                                precision=precision,
                                arithmetic=arith_c,
                                lossless=lossless,
                            )
                        )
                        rgb = img["rgb"]
                        if rgb is None:
                            rgb = np.repeat(
                                img["gray"][:, :, None], 3, axis=2
                            )
                        npx = img["width"] * img["height"]
                        rows["media_id"].append(int(did))
                        rows["variant"].append(mode + suffix)
                        rows["mean_r"].append(
                            float(np.sum(rgb[:, :, 0])) / npx
                        )
                        rows["mean_g"].append(
                            float(np.sum(rgb[:, :, 1])) / npx
                        )
                        rows["mean_b"].append(
                            float(np.sum(rgb[:, :, 2])) / npx
                        )
                        rows["top_row_sum"].append(int(np.sum(rgb[0])))
            yield pd.DataFrame(rows)

    d = _spread(load_table(spark, sf_dir, "documents").select("doc_id"))
    out = d.mapInPandas(
        decode,
        schema=(
            "media_id long, variant string, mean_r double, "
            "mean_g double, mean_b double, top_row_sum long"
        ),
    )
    from mpi_mapreduce_spark.functions import exact as ex

    return out.select(
        "media_id",
        "variant",
        ex.quantize(F.col("mean_r"), 6).alias("mean_r"),
        ex.quantize(F.col("mean_g"), 6).alias("mean_g"),
        ex.quantize(F.col("mean_b"), 6).alias("mean_b"),
        "top_row_sum",
    )


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": frame_sample,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_energy": multimodal_frame_energy,
    "multimodal_wav_decode": multimodal_wav_decode,
    "multimodal_bmp_decode": multimodal_bmp_decode,
    "multimodal_png_decode": multimodal_png_decode,
    "multimodal_png_palette_alpha": multimodal_png_palette_alpha,
    "multimodal_png_interlaced_16bit": multimodal_png_interlaced_16bit,
    "multimodal_png_subbyte": multimodal_png_subbyte,
    "multimodal_jpeg_decode": multimodal_jpeg_decode,
    "multimodal_jpeg_progressive_decode": multimodal_jpeg_progressive_decode,
    "multimodal_jpeg12_decode": multimodal_jpeg12_decode,
    "multimodal_jpeg_arith_decode": multimodal_jpeg_arith_decode,
    "multimodal_jpeg_prog_arith_decode": multimodal_jpeg_prog_arith_decode,
    "multimodal_jpeg_lossless_decode": multimodal_jpeg_lossless_decode,
    "multimodal_audio_decimate": multimodal_audio_decimate,
    "multimodal_pixel_histogram": multimodal_pixel_histogram,
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
    # The WAV samples are a pure function of doc_id, so the oracle
    # re-derives them arithmetically; any header/layout/endianness bug
    # in the engine's encode→parse round trip shifts every decoded
    # sample and fails the hash.
    "multimodal_wav_decode": f"""
        WITH s AS (
          SELECT doc_id AS media_id,
                 ((doc_id * {WAV_MUL} + i * {WAV_INC}) % 65536) - 32768 AS v
          FROM documents,
               LATERAL (SELECT unnest(range({WAV_N})) AS i)
        )
        SELECT media_id,
               CAST({WAV_RATE} AS BIGINT) AS sample_rate,
               CAST(1 AS BIGINT) AS n_channels,
               CAST(16 AS BIGINT) AS bits,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(MAX(ABS(v)) AS BIGINT) AS peak,
               ROUND(sqrt(SUM(CAST(v AS DOUBLE) * v) / COUNT(*))
                     * 1000000.0) / 1000000.0 AS rms
        FROM s GROUP BY media_id
    """,
    # Decimation keeps samples with i % K == 0; the oracle re-derives
    # them from the generating formula, so a stride-start off-by-one
    # or a parse bug shifts the hash.
    "multimodal_audio_decimate": f"""
        WITH s AS (
          SELECT doc_id AS media_id, i,
                 ((doc_id * {WAV_MUL} + i * {WAV_INC}) % 65536) - 32768 AS v
          FROM documents,
               LATERAL (SELECT unnest(range({WAV_N})) AS i)
        )
        SELECT media_id,
               CAST(COUNT(*) AS BIGINT) AS n_in,
               CAST(SUM(CASE WHEN i % {DECIM_FACTOR} = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_out,
               CAST(MAX(CASE WHEN i % {DECIM_FACTOR} = 0 THEN ABS(v) END)
                    AS BIGINT) AS peak_out,
               ROUND(sqrt(SUM(CAST(v AS DOUBLE) * v) / COUNT(*))
                     * 1000000.0) / 1000000.0 AS rms_in,
               ROUND(sqrt(SUM(CASE WHEN i % {DECIM_FACTOR} = 0
                                   THEN CAST(v AS DOUBLE) * v ELSE 0 END)
                          / SUM(CASE WHEN i % {DECIM_FACTOR} = 0
                                     THEN 1 ELSE 0 END))
                     * 1000000.0) / 1000000.0 AS rms_out
        FROM s GROUP BY media_id
    """,
    # Same scheme for BMP; top_row_sum uses image y = 0 (the LAST
    # stored row under bottom-up order), pinning the parser's un-flip.
    "multimodal_bmp_decode": f"""
        WITH px AS (
          SELECT doc_id AS media_id, x, y,
                 (doc_id * 3 + x * 7 + y * 13) % 256 AS r,
                 (doc_id * 5 + x * 11 + y * 3) % 256 AS g,
                 (doc_id * 7 + x * 13 + y * 5) % 256 AS b
          FROM documents,
               LATERAL (SELECT unnest(range({BMP_W})) AS x),
               LATERAL (SELECT unnest(range({BMP_H})) AS y)
        )
        SELECT media_id,
               CAST({BMP_W} AS BIGINT) AS width,
               CAST({BMP_H} AS BIGINT) AS height,
               ROUND(CAST(SUM(r) AS DOUBLE) / {BMP_W * BMP_H}
                     * 1000000.0) / 1000000.0 AS mean_r,
               ROUND(CAST(SUM(g) AS DOUBLE) / {BMP_W * BMP_H}
                     * 1000000.0) / 1000000.0 AS mean_g,
               ROUND(CAST(SUM(b) AS DOUBLE) / {BMP_W * BMP_H}
                     * 1000000.0) / 1000000.0 AS mean_b,
               CAST(SUM(CASE WHEN y = 0 THEN r + g + b ELSE 0 END)
                    AS BIGINT) AS top_row_sum
        FROM px GROUP BY media_id
    """,
    # same checksum-mirror recipe as the BMP decode: the oracle
    # re-derives the stats from the PNG pixel formula — no decoder
    # oracle-side, so only a byte-exact engine decode can agree
    "multimodal_png_decode": f"""
        WITH px AS (
          SELECT doc_id AS media_id, x, y,
                 (doc_id * 11 + x * 5 + y * 17) % 256 AS r,
                 (doc_id * 13 + x * 3 + y * 7) % 256 AS g,
                 (doc_id * 17 + x * 19 + y * 11) % 256 AS b
          FROM documents,
               LATERAL (SELECT unnest(range({PNG_W})) AS x),
               LATERAL (SELECT unnest(range({PNG_H})) AS y)
        )
        SELECT media_id,
               CAST({PNG_W} AS BIGINT) AS width,
               CAST({PNG_H} AS BIGINT) AS height,
               ROUND(CAST(SUM(r) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_r,
               ROUND(CAST(SUM(g) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_g,
               ROUND(CAST(SUM(b) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_b,
               CAST(SUM(CASE WHEN y = 0 THEN r + g + b ELSE 0 END)
                    AS BIGINT) AS top_row_sum
        FROM px GROUP BY media_id
    """,
    # same recipe, palette/alpha color types: the oracle performs the
    # PLTE lookup and the short-tRNS default-255 rule in closed form
    # over the generating index formula — a decode that mis-indexed
    # the palette or defaulted the alpha tail wrong fails the hash
    "multimodal_png_palette_alpha": f"""
        WITH px AS (
          SELECT doc_id AS media_id, x, y,
                 (doc_id * 11 + x * 5 + y * 17) % 256 AS idx,
                 (doc_id * 13 + x * 3 + y * 7) % 256 AS g2,
                 (doc_id * 17 + x * 19 + y * 11) % 256 AS b2,
                 (doc_id * 7 + x * 13 + y * 3) % 256 AS av
          FROM documents,
               LATERAL (SELECT unnest(range({PNG_W})) AS x),
               LATERAL (SELECT unnest(range({PNG_H})) AS y)
        ), v AS (
          SELECT media_id, x, y, 3 AS color_type,
                 (idx * 29 + 1) % 256 AS r,
                 (idx * 31 + 2) % 256 AS g,
                 (idx * 37 + 3) % 256 AS b,
                 CASE WHEN idx < {PNG_TRNS_LEN}
                      THEN (idx * 41 + 5) % 256 ELSE 255 END AS a
          FROM px
          UNION ALL
          SELECT media_id, x, y, 4, idx, idx, idx, av FROM px
          UNION ALL
          SELECT media_id, x, y, 6, idx, g2, b2, av FROM px
        )
        SELECT media_id,
               CAST(color_type AS BIGINT) AS color_type,
               ROUND(CAST(SUM(r) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_r,
               ROUND(CAST(SUM(g) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_g,
               ROUND(CAST(SUM(b) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_b,
               ROUND(CAST(SUM(a) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_a,
               CAST(SUM(CASE WHEN y = 0 THEN r + g + b + a ELSE 0 END)
                    AS BIGINT) AS top_row_sum
        FROM v GROUP BY media_id, color_type
    """,
    # same recipe, transport variants: Adam7 is a pure permutation so
    # variant 'adam7' mirrors the truecolor formulas verbatim; the
    # 16-bit variants re-derive mod-65536 — a wrong pass geometry,
    # cross-pass filter prior, or byte-swapped sample pairing fails
    # the hash
    "multimodal_png_interlaced_16bit": f"""
        WITH px AS (
          SELECT doc_id AS media_id, x, y,
                 (doc_id * 11 + x * 5 + y * 17) % 256 AS r8,
                 (doc_id * 13 + x * 3 + y * 7) % 256 AS g8,
                 (doc_id * 17 + x * 19 + y * 11) % 256 AS b8,
                 (doc_id * 11 + x * 5 + y * 17) % 65536 AS v16,
                 (doc_id * 13 + x * 3 + y * 7) % 65536 AS g16,
                 (doc_id * 17 + x * 19 + y * 11) % 65536 AS b16,
                 (doc_id * 7 + x * 13 + y * 3) % 65536 AS a16
          FROM documents,
               LATERAL (SELECT unnest(range({PNG_W})) AS x),
               LATERAL (SELECT unnest(range({PNG_H})) AS y)
        ), v AS (
          SELECT media_id, x, y, 'adam7' AS variant,
                 r8 AS r, g8 AS g, b8 AS b, 0 AS a FROM px
          UNION ALL
          SELECT media_id, x, y, 'gray16', v16, v16, v16, 0 FROM px
          UNION ALL
          SELECT media_id, x, y, 'rgba16i', v16, g16, b16, a16 FROM px
        )
        SELECT media_id, variant,
               ROUND(CAST(SUM(r) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_r,
               ROUND(CAST(SUM(g) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_g,
               ROUND(CAST(SUM(b) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_b,
               ROUND(CAST(SUM(a) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_a,
               CAST(SUM(CASE WHEN y = 0 THEN r + g + b + a ELSE 0 END)
                    AS BIGINT) AS top_row_sum
        FROM v GROUP BY media_id, variant
    """,
    # sub-byte variants: values are the same generating formulas mod
    # 2^depth (bit packing is transport, like interlacing); pal4's
    # 16-entry palette and 8-entry tRNS mirror in closed form
    "multimodal_png_subbyte": f"""
        WITH px AS (
          SELECT doc_id AS media_id, x, y,
                 (doc_id * 11 + x * 5 + y * 17) % 2 AS v1,
                 (doc_id * 11 + x * 5 + y * 17) % 4 AS v2,
                 (doc_id * 11 + x * 5 + y * 17) % 16 AS v4
          FROM documents,
               LATERAL (SELECT unnest(range({PNG_W})) AS x),
               LATERAL (SELECT unnest(range({PNG_H})) AS y)
        ), v AS (
          SELECT media_id, x, y, 'gray1' AS variant,
                 v1 AS r, v1 AS g, v1 AS b, 0 AS a FROM px
          UNION ALL
          SELECT media_id, x, y, 'gray2i', v2, v2, v2, 0 FROM px
          UNION ALL
          SELECT media_id, x, y, 'gray4', v4, v4, v4, 0 FROM px
          UNION ALL
          SELECT media_id, x, y, 'pal4',
                 (v4 * 29 + 1) % 256,
                 (v4 * 31 + 2) % 256,
                 (v4 * 37 + 3) % 256,
                 CASE WHEN v4 < 8 THEN (v4 * 41 + 5) % 256
                      ELSE 255 END
          FROM px
        )
        SELECT media_id, variant,  -- subbyte stats
               ROUND(CAST(SUM(r) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_r,
               ROUND(CAST(SUM(g) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_g,
               ROUND(CAST(SUM(b) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_b,
               ROUND(CAST(SUM(a) AS DOUBLE) / {PNG_W * PNG_H}
                     * 1000000.0) / 1000000.0 AS mean_a,
               CAST(SUM(CASE WHEN y = 0 THEN r + g + b + a ELSE 0 END)
                    AS BIGINT) AS top_row_sum
        FROM v GROUP BY media_id, variant
    """,
    # baseline JPEG: blockwise-constant fixtures make the lossy
    # pipeline exact, so every decoded pixel has a closed form — the
    # JFIF YCbCr→RGB floor(x+0.5) rounding is mirrored verbatim
    "multimodal_jpeg_decode": f"""
        WITH px AS (
          SELECT doc_id AS media_id, x, y,
                 (doc_id * 7 + (x // 8) * 13 + (y // 8) * 29) % 256
                     AS yv,
                 (doc_id * 11 + (x // 8) * 17 + (y // 8) * 5) % 256
                     AS cb444,
                 (doc_id * 3 + (x // 8) * 23 + (y // 8) * 19) % 256
                     AS cr444,
                 (doc_id * 19 + (x // 16) * 7 + (y // 16) * 13) % 256
                     AS cb420,
                 (doc_id * 23 + (x // 16) * 29 + (y // 16) * 3) % 256
                     AS cr420
          FROM documents,
               LATERAL (SELECT unnest(range({JPEG_W})) AS x),
               LATERAL (SELECT unnest(range({JPEG_H})) AS y)
        ), v AS (
          SELECT media_id, x, y, 'gray' AS variant,
                 CAST(yv AS DOUBLE) AS r, CAST(yv AS DOUBLE) AS g,
                 CAST(yv AS DOUBLE) AS b
          FROM px
          UNION ALL
          SELECT media_id, x, y, 'c444',
                 LEAST(255, GREATEST(0,
                     FLOOR(yv + 1.402 * (cr444 - 128.0) + 0.5))),
                 LEAST(255, GREATEST(0,
                     FLOOR(yv - 0.344136 * (cb444 - 128.0)
                              - 0.714136 * (cr444 - 128.0) + 0.5))),
                 LEAST(255, GREATEST(0,
                     FLOOR(yv + 1.772 * (cb444 - 128.0) + 0.5)))
          FROM px
          UNION ALL
          SELECT media_id, x, y, 'c420',
                 LEAST(255, GREATEST(0,
                     FLOOR(yv + 1.402 * (cr420 - 128.0) + 0.5))),
                 LEAST(255, GREATEST(0,
                     FLOOR(yv - 0.344136 * (cb420 - 128.0)
                              - 0.714136 * (cr420 - 128.0) + 0.5))),
                 LEAST(255, GREATEST(0,
                     FLOOR(yv + 1.772 * (cb420 - 128.0) + 0.5)))
          FROM px
        )
        SELECT media_id, variant,
               ROUND(SUM(r) / {JPEG_W * JPEG_H}
                     * 1000000.0) / 1000000.0 AS mean_r,
               ROUND(SUM(g) / {JPEG_W * JPEG_H}
                     * 1000000.0) / 1000000.0 AS mean_g,
               ROUND(SUM(b) / {JPEG_W * JPEG_H}
                     * 1000000.0) / 1000000.0 AS mean_b,
               CAST(SUM(CASE WHEN y = 0 THEN r + g + b ELSE 0 END)
                    AS BIGINT) AS top_row_sum
        FROM v GROUP BY media_id, variant
    """,
    # integer-exact histogram: bins re-derived from the same pixel
    # formula, no decoder needed oracle-side
    "multimodal_pixel_histogram": f"""
        WITH px AS (
          SELECT doc_id AS media_id,
                 (doc_id * 3 + x * 7 + y * 13) % 256 AS r,
                 (doc_id * 5 + x * 11 + y * 3) % 256 AS g,
                 (doc_id * 7 + x * 13 + y * 5) % 256 AS b
          FROM documents,
               LATERAL (SELECT unnest(range({BMP_W})) AS x),
               LATERAL (SELECT unnest(range({BMP_H})) AS y)
        )
        SELECT media_id,
               CAST(((r + g + b) // 3) // 16 AS BIGINT) AS bin,
               count(*) AS n
        FROM px GROUP BY media_id, ((r + g + b) // 3) // 16
    """,
}

# the progressive schedule reconstructs coefficients exactly, so the
# decoded pixels equal the baseline decode of the same fixture planes
# — one closed-form oracle serves both queries
ORACLE["multimodal_jpeg_progressive_decode"] = ORACLE[
    "multimodal_jpeg_decode"
]

# the QM coder is lossless under the all-ones quantizer, so the
# arithmetic-coded fixtures decode to the same pixels too — in both
# the sequential (SOF9) and progressive (SOF10) processes
ORACLE["multimodal_jpeg_arith_decode"] = ORACLE["multimodal_jpeg_decode"]
ORACLE["multimodal_jpeg_prog_arith_decode"] = ORACLE[
    "multimodal_jpeg_decode"
]

# lossless decode is sample-exact and the fixtures are the same
# generating formulas, so the pixels (and the oracle) match too. The
# query decodes each fixture under BOTH entropy coders (SOF3 Huffman
# and, round 13, SOF11 QM arithmetic — also sample-exact), so the
# oracle doubles every row with the '_a11' variant suffix.
ORACLE["multimodal_jpeg_lossless_decode"] = f"""
    WITH base AS ({ORACLE["multimodal_jpeg_decode"]})
    SELECT * FROM base
    UNION ALL
    SELECT media_id, variant || '_a11' AS variant,
           mean_r, mean_g, mean_b, top_row_sum
    FROM base
"""

# the 12-bit fixtures use the SAME generating formulas and YCbCr
# matrix with the sample constants widened: mod 256 -> 4096, chroma
# center 128 -> 2048, clamp ceiling 255 -> 4095. Each substitution is
# asserted INDIVIDUALLY (ADVICE r12 low): a differs-from-original
# check passes when just one of the three applied, so a spelling
# drift in the baseline oracle would mint a silently wrong 12-bit
# oracle.
ORACLE["multimodal_jpeg12_decode"] = ORACLE["multimodal_jpeg_decode"]
for _pat, _sub in (
    ("% 256", "% 4096"),
    ("- 128.0)", "- 2048.0)"),
    ("LEAST(255,", "LEAST(4095,"),
):
    if _pat not in ORACLE["multimodal_jpeg12_decode"]:
        raise AssertionError(
            f"12-bit oracle rewrite: pattern {_pat!r} not found in the"
            " baseline oracle (spelling drift?)"
        )
    ORACLE["multimodal_jpeg12_decode"] = ORACLE[
        "multimodal_jpeg12_decode"
    ].replace(_pat, _sub)
del _pat, _sub
