"""AVI/MJPG container codec (pipeline/avi.py) + video feature kernel."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from neo4j_graph_algorithms_spark.pipeline.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from neo4j_graph_algorithms_spark.pipeline.multimodal import video_frame_pixels


def _fixture_frames(media_id: int = 3, n: int = 6, w: int = 16, h: int = 16):
    return [video_frame_pixels(media_id, f, w, h) for f in range(n)]


def test_roundtrip_bit_exact():
    frames = _fixture_frames()
    out, info = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=4))
    assert info == {"width": 16, "height": 16, "n_frames": 6, "fps": 4}
    assert len(out) == 6
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_frame_sampling_decodes_subset():
    frames = _fixture_frames(n=5)
    out, info = decode_avi_mjpeg(encode_avi_mjpeg(frames), sample_every=2)
    assert info["n_frames"] == 5  # container count validated over ALL chunks
    assert len(out) == 3  # frames 0, 2, 4
    for a, b in zip(frames[::2], out):
        assert np.array_equal(a, b)


def test_lossy_roundtrip_arbitrary_pixels_bounded_error():
    # non-block-constant frames: the JPEG path is lossy but bounded
    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 256, (16, 16)).astype(np.uint8) for _ in range(2)]
    out, _ = decode_avi_mjpeg(encode_avi_mjpeg(frames))
    for a, b in zip(frames, out):
        assert np.abs(a.astype(int) - b.astype(int)).max() < 128


def test_corruption_probes():
    payload = encode_avi_mjpeg(_fixture_frames(n=2))
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(b"RIFX" + payload[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_avi_mjpeg(payload[:40])
    # flip strf biCompression (the SECOND 'MJPG': first is strh fccHandler)
    pos = payload.find(b"MJPG", payload.find(b"MJPG") + 1)
    bad = bytearray(payload)
    bad[pos : pos + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPG only"):
        decode_avi_mjpeg(bytes(bad))
    # lie about the frame count in avih (dwTotalFrames is the 5th dword
    # of the avih payload; avih starts right after hdrl's 'LIST....hdrl')
    avih_payload = payload.find(b"avih") + 8
    bad2 = bytearray(payload)
    struct.pack_into("<I", bad2, avih_payload + 16, 99)
    with pytest.raises(ValueError, match="frame count mismatch"):
        decode_avi_mjpeg(bytes(bad2))


def test_empty_and_mismatched_frames_rejected():
    with pytest.raises(ValueError, match="empty"):
        encode_avi_mjpeg([])
    with pytest.raises(ValueError, match="one shape"):
        encode_avi_mjpeg(
            [np.zeros((8, 8), np.uint8), np.zeros((16, 16), np.uint8)]
        )


def test_video_features_matches_local_decode(spark):
    from neo4j_graph_algorithms_spark.pipeline.multimodal import (
        synthesize_video_media,
        video_features,
    )

    media = synthesize_video_media(spark, n=6, width=16, height=16, n_frames=6)
    got = {r.media_id: r for r in video_features(media, every_n=2).collect()}
    assert set(got) == set(range(6))
    for m in range(6):
        sampled = [video_frame_pixels(m, f, 16, 16) for f in (0, 2, 4)]
        r = got[m]
        assert (r.n_frames, r.width, r.height, r.sampled_frames) == (6, 16, 16, 3)
        assert r.sum_mean_intensity == sum(int(a.mean()) for a in sampled)
        assert r.max_intensity == max(int(a.max()) for a in sampled)


def test_property_roundtrip_random_block_grids():
    """Random block-constant frames of varied sizes round-trip bit-exactly
    (pure-python property loop; the codec is deterministic so a seeded
    sweep is equivalent to a Hypothesis run without the JVM cost)."""
    rng = np.random.RandomState(11)
    for trial in range(12):
        w = int(rng.choice([8, 16, 24, 32]))
        h = int(rng.choice([8, 16, 24]))
        n = int(rng.randint(1, 5))
        frames = []
        for _ in range(n):
            blocks = rng.randint(0, 256, ((h + 7) // 8, (w + 7) // 8))
            frames.append(
                np.repeat(np.repeat(blocks, 8, 0), 8, 1)[:h, :w].astype(np.uint8)
            )
        out, info = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=2))
        assert (info["width"], info["height"], info["n_frames"]) == (w, h, n)
        for a, b in zip(frames, out):
            assert np.array_equal(a, b), (trial, w, h, n)


def test_zero_frame_avi_yields_zero_feature_row(spark):
    """A structurally valid zero-frame AVI (foreign writer) produces the
    zero row, not an Arrow-worker crash."""
    import struct

    from neo4j_graph_algorithms_spark.pipeline.avi import _chunk, _list
    from neo4j_graph_algorithms_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        video_features,
    )

    avih = _chunk(b"avih", struct.pack("<14I", 250000, 0, 0, 0x10, 0, 0, 1,
                                       0, 16, 16, 0, 0, 0, 0))
    strh = _chunk(b"strh", b"vidsMJPG" + struct.pack("<IHHIIIIIIIi4H",
                  0, 0, 0, 0, 1, 4, 0, 0, 0, 0, 0, 0, 0, 16, 16))
    strf = _chunk(b"strf", struct.pack("<IiiHH4sIiiII", 40, 16, 16, 1, 8,
                                       b"MJPG", 256, 0, 0, 0, 0))
    payload = _chunk(b"RIFF", b"AVI " + _list(b"hdrl", avih + _list(b"strl", strh + strf))
                     + _list(b"movi", b"") + _chunk(b"idx1", b""))
    media = spark.createDataFrame([(0, payload, "video/avi", (16, 16, 1, None, 0))],
                                  MEDIA_SCHEMA)
    r = video_features(media, every_n=2).collect()[0]
    assert (r.n_frames, r.sampled_frames, r.sum_mean_intensity, r.max_intensity) == (0, 0, 0, 0)
