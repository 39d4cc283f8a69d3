"""Real GIF codec: LZW round-trips, spec edges, kernel integration."""

import numpy as np
import pytest

from neo4j_graph_algorithms_spark.pipeline.gif import decode_gif, encode_gif


def test_round_trip_random_and_degenerate():
    rng = np.random.RandomState(0)
    for shape in [(1, 1), (3, 5), (8, 8), (64, 64), (100, 113)]:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        assert np.array_equal(decode_gif(encode_gif(px)), px)
    # constant image: KwKwK-heavy stream
    px = np.full((64, 64), 7, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_dictionary_reset_past_4096_entries():
    px = np.tile(np.arange(256, dtype=np.uint8), (256, 1))
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    with pytest.raises(ValueError):
        encode_gif(np.zeros((4, 4), dtype=np.int32))  # wrong dtype
    with pytest.raises(ValueError):
        encode_gif(np.zeros((4, 4, 3), dtype=np.uint8))  # encoder is grey-only


def test_extension_blocks_are_skipped():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    payload = bytearray(encode_gif(px))
    # splice a graphics-control extension right after the palette
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    insert_at = 13 + 3 * 256
    payload[insert_at:insert_at] = gce
    assert np.array_equal(decode_gif(bytes(payload)), px)


def test_gif_media_through_feature_kernel(spark):
    from neo4j_graph_algorithms_spark.pipeline.multimodal import (
        extract_features,
        png_pixels,
        synthesize_gif_media,
    )

    out = {r["media_id"]: r for r in
           extract_features(synthesize_gif_media(spark, n=8, width=8, height=8)).collect()}
    assert len(out) == 8
    for m in range(8):
        px = png_pixels(m, 8, 8).astype(np.int64)
        assert out[m]["mean_intensity"] == int(px.mean())
        assert out[m]["max_intensity"] == int(px.max())
