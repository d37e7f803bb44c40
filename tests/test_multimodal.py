"""Multimodal plumbing: binary schema, Arrow batch shapes, stub
determinism."""

from __future__ import annotations

from mpi_mapreduce_spark.operators import multimodal as M


def test_media_table_schema(spark, sf_dir):
    media = M.media_table(spark, sf_dir)
    assert dict(media.dtypes)["payload"] == "binary"
    meta_type = dict(media.dtypes)["meta"]
    assert "mime" in meta_type and "n_bytes" in meta_type


def test_features_deterministic_and_dense(spark, sf_dir):
    f1 = M.multimodal_features(spark, sf_dir).collect()
    f2 = M.multimodal_features(spark, sf_dir).collect()
    assert sorted(map(tuple, f1)) == sorted(map(tuple, f2))
    n_media = M.media_table(spark, sf_dir).count()
    assert len(f1) == n_media * M.FEATURE_DIM


def test_resize_payload_byte_exact(spark, sf_dir):
    """The binary-out path really carries the resized payload: byte-for-
    byte equal to payload[::stride], with matching audit stats."""
    media = M.media_table(spark, sf_dir)
    resized = media.select("media_id", "payload").mapInPandas(
        M.make_resize(),
        schema=(
            "media_id long, payload_out binary, orig_bytes long, "
            "resized_bytes long, checksum long"
        ),
    )
    orig = {r.media_id: bytes(r.payload) for r in media.collect()}
    for r in resized.collect():
        want = orig[r.media_id][:: M.RESIZE_STRIDE]
        assert bytes(r.payload_out) == want
        assert r.resized_bytes == len(want)
        assert r.checksum == sum(want)


def test_frame_sampling_keeps_every_4th(spark, sf_dir):
    rows = M.frame_sample(spark, sf_dir).collect()
    for r in rows:
        assert r.n_sampled == (r.n_frames - 1) // 4 + 1 if r.n_frames else 1
        assert 0 < r.bytes_kept <= r.n_sampled * 64


def test_frame_energy_matches_numpy_recount(spark, sf_dir):
    """Per-frame RMS recomputed in plain python/numpy from the same
    payload bytes must match the operator exactly."""
    import math

    import mpi_mapreduce_spark.operators.multimodal as M

    media = {r.media_id: bytes(r.payload)
             for r in M.media_table(spark, sf_dir).collect()}
    got = {
        (r.media_id, r.frame_idx): (r.n_bytes, r.rms)
        for r in M.multimodal_frame_energy(spark, sf_dir).collect()
    }
    want = {}
    FR = M.ENERGY_FRAME_BYTES
    for mid, b in media.items():
        for f in range((len(b) + FR - 1) // FR):
            seg = b[f * FR : (f + 1) * FR]
            rms = math.sqrt(sum(x * x for x in seg) / len(seg))
            want[(mid, f)] = (len(seg), round(rms * 1e6) / 1e6)
    assert got == want
