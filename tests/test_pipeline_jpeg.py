"""REAL baseline-JPEG codec tests: exact block-constant roundtrip (the
gate contract), bounded-error lossy roundtrips, marker/entropy edge cases,
honest unsupported-feature errors, and the Spark feature path over genuine
JPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from neo4j_graph_algorithms_spark.pipeline.jpeg import (
    DEFAULT_QTABLE,
    decode_jpeg,
    encode_jpeg,
    jpeg_block_pixels,
)
from neo4j_graph_algorithms_spark.pipeline.multimodal import (
    _decode_bytes,
    extract_features,
    synthesize_jpeg_media,
)


def _rand_img(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape).astype(np.uint8)


def test_block_constant_roundtrip_exact():
    # the oracle contract: constant 8x8 blocks survive the lossy codec
    # bit-exactly with the DC-8 default quantizer
    for m in (0, 1, 7, 31, 63):
        px = jpeg_block_pixels(m, 16, 16)
        out = decode_jpeg(encode_jpeg(px))
        assert out.dtype == np.uint8 and (out == px).all()


def test_arbitrary_image_near_lossless_default_table():
    img = _rand_img((24, 33), seed=0)  # non-multiple-of-8 dims (edge pad)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_coarse_quantizer_is_lossy_but_bounded():
    img = _rand_img((16, 16), seed=1)
    q = np.full(64, 16, dtype=np.int64)
    q[0] = 8
    out = decode_jpeg(encode_jpeg(img, qtable=q))
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert 0 < err < 128  # genuinely lossy, sane


def test_extreme_values_exercise_byte_stuffing():
    # constant 255/0/128 blocks hit long 1-runs in the entropy stream
    # (0xFF bytes -> 0x00 stuffing on write, unstuffing on read)
    for v in (0, 128, 255):
        img = np.full((8, 16), v, dtype=np.uint8)
        assert (decode_jpeg(encode_jpeg(img)) == img).all()


def test_dc_prediction_across_blocks():
    # 4 blocks with large DC swings: differential DC coding must track
    vals = np.array([[0, 255], [255, 0]], dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    assert (decode_jpeg(encode_jpeg(img)) == img).all()


def test_rejects_non_jpeg_and_truncation():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    blob = encode_jpeg(_rand_img((8, 8), seed=2))
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])


def test_honest_unsupported_features():
    blob = bytearray(encode_jpeg(_rand_img((8, 8), seed=3)))
    i = blob.find(b"\xff\xc0")
    prog = bytearray(blob)
    prog[i + 1] = 0xC2  # SOF2 progressive
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(prog))
    with pytest.raises(NotImplementedError, match="greyscale|component"):
        # patch component count 1 -> 3 in SOF0 (offset: marker+len+prec+h+w)
        colour = bytearray(blob)
        colour[i + 9] = 3
        decode_jpeg(bytes(colour))


def test_qtable_validation():
    with pytest.raises(ValueError, match="qtable"):
        encode_jpeg(_rand_img((8, 8), seed=4), qtable=np.zeros(64, dtype=np.int64))
    with pytest.raises(ValueError, match="greyscale"):
        encode_jpeg(_rand_img((8, 8, 3), seed=4))


def test_decode_bytes_routes_jpeg():
    px = jpeg_block_pixels(5, 16, 16)
    out = _decode_bytes(encode_jpeg(px), "image/jpeg")
    assert (out == px).all()


def test_spark_feature_path_matches_formula(spark):
    feats = {
        r["media_id"]: (r["mean_intensity"], r["max_intensity"], r["nonzero_frac_pct"])
        for r in extract_features(
            synthesize_jpeg_media(spark, n=8, width=16, height=16)
        ).collect()
    }
    for m in range(8):
        px = jpeg_block_pixels(m, 16, 16).astype(np.int64)
        want = (
            int(px.mean()),
            int(px.max()),
            int(100 * (px > 0).mean()),
        )
        assert feats[m] == want, (m, feats[m], want)
