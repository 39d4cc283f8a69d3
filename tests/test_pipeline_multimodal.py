"""Multimodal plumbing tests: schema, mapInPandas kernels, stub behavior."""

from __future__ import annotations

import numpy as np
import pytest

from neo4j_graph_algorithms_spark.pipeline.multimodal import (
    _decode_bytes,
    encode_fake_image,
    extract_features,
    frame_sample,
    resize,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=16, width=8, height=8)


def test_fake_codec_roundtrip():
    payload = encode_fake_image(5, 4, 3)
    arr = _decode_bytes(payload, "image/fake")
    assert arr.shape == (3, 4) and arr.dtype == np.uint8


def test_non_avi_video_is_stubbed():
    # AVI/MJPG is a real codec now (pipeline/avi.py, via video_features);
    # other video containers genuinely need absent libraries, and a
    # truncated JPEG is a payload error, not an unsupported codec
    with pytest.raises(NotImplementedError):
        _decode_bytes(b"\x00\x00\x00\x18ftypmp42", "video/mp4")
    with pytest.raises(ValueError, match="truncated"):
        _decode_bytes(b"\xff\xd8\xff", "image/jpeg")


def test_extract_features_matches_local_decode(spark, media):
    got = {r.media_id: r for r in extract_features(media).collect()}
    assert len(got) == 16
    for mid in range(16):
        arr = _decode_bytes(encode_fake_image(mid, 8, 8), "image/fake")
        assert got[mid].mean_intensity == int(arr.mean())
        assert got[mid].max_intensity == int(arr.max())


def test_resize_preserves_schema_and_shape(spark, media):
    out = resize(media, 4, 4)
    assert out.schema == media.schema
    rows = out.collect()
    for r in rows:
        arr = _decode_bytes(bytes(r.media), r.media_type)
        assert arr.shape == (4, 4)
        assert r.meta.width == 4 and r.meta.height == 4


def test_frame_sample_metadata(spark, media):
    out = frame_sample(media, every_n=2).collect()
    for r in out:
        assert r.meta.n_frames == 1  # ceil(1/2) = 1
    # same columns and types (nullability may tighten when rebuilding the struct)
    assert frame_sample(media, every_n=1).schema.simpleString() == media.schema.simpleString()


def test_feature_extraction_distributed(spark):
    """Kernel runs per Arrow batch across partitions (no driver collect)."""
    m = synthesize_media(spark, n=64).repartition(4)
    assert extract_features(m).count() == 64


def test_wav_roundtrip_real_codec(spark):
    """encode_wav produces a genuine RIFF container; decode_wav (stdlib
    wave) recovers the exact int16 samples."""
    import numpy as np

    from neo4j_graph_algorithms_spark.pipeline.multimodal import (
        decode_wav,
        encode_wav,
    )

    payload = encode_wav(7, n_samples=100, sample_rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    samples, sr = decode_wav(payload)
    assert sr == 8000 and len(samples) == 100
    t = np.arange(100, dtype=np.int64)
    want = (t * (7 % 17 + 3)) % 1024 - 512
    assert (samples.astype(np.int64) == want).all()


def test_audio_features_exact(spark):
    from neo4j_graph_algorithms_spark.pipeline.multimodal import (
        audio_features,
        synthesize_audio,
    )

    media = synthesize_audio(spark, n=4, n_samples=50, sample_rate=1000)
    rows = {r.media_id: r for r in audio_features(media).collect()}
    assert set(rows) == {0, 1, 2, 3}
    import numpy as np

    for mid, r in rows.items():
        t = np.arange(50, dtype=np.int64)
        s = (t * (mid % 17 + 3)) % 1024 - 512
        assert r.n_samples == 50 and r.sample_rate == 1000
        assert r.duration_ms == 50 * 1000 // 1000
        assert r.sum_sq == int((s * s).sum())
        nonneg = s >= 0
        assert r.zero_crossings == int((nonneg[1:] != nonneg[:-1]).sum())
