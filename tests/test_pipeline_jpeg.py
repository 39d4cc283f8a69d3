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
    encode_jpeg_color,
    jpeg_block_pixels,
    jpeg_color_planes,
    ycbcr_to_rgb_fixed,
)
from neo4j_graph_algorithms_spark.pipeline.multimodal import (
    _decode_bytes,
    extract_features,
    synthesize_jpeg_color_media,
    synthesize_jpeg_media,
)


def _expected_color_rgb(m: int, w: int, h: int) -> np.ndarray:
    """Ground truth for the MCU-constant 4:2:0 fixture: replicate-upsample
    stored chroma, then the documented fixed-point transform."""
    y, cb, cr = jpeg_color_planes(m, w, h)
    cb_up = np.repeat(np.repeat(cb, 2, 0), 2, 1)[:h, :w]
    cr_up = np.repeat(np.repeat(cr, 2, 0), 2, 1)[:h, :w]
    return ycbcr_to_rgb_fixed(y, cb_up, cr_up)


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
    with pytest.raises(NotImplementedError, match="component"):
        # patch component count 1 -> 2 (CMYK-ish) in SOF0
        two = bytearray(blob)
        two[i + 9] = 2
        decode_jpeg(bytes(two))
    with pytest.raises(ValueError, match="truncated SOF"):
        # claim 3 components but the SOF payload only carries specs for 1
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


def test_color_420_mcu_constant_roundtrip_exact():
    # the colour-gate contract: MCU-constant YCbCr planes survive the
    # 4:2:0 codec (interleaved scan, two table ids, replicate upsampling)
    # bit-exactly through the fixed-point RGB transform
    for m in (0, 1, 7, 31, 63):
        y, cb, cr = jpeg_color_planes(m, 32, 32)
        rgb = decode_jpeg(encode_jpeg_color(y, cb, cr, subsample=True))
        assert rgb.shape == (32, 32, 3) and rgb.dtype == np.uint8
        assert (rgb == _expected_color_rgb(m, 32, 32)).all()


def test_color_444_near_lossless_and_odd_dims():
    rng = np.random.default_rng(5)
    y, cb, cr = (rng.integers(0, 256, (24, 33)).astype(np.uint8) for _ in range(3))
    rgb = decode_jpeg(encode_jpeg_color(y, cb, cr, subsample=False))
    assert rgb.shape == (24, 33, 3)
    # each plane is near-lossless (|err|<=2); the transform's worst-case
    # gain is ~2.3x on B, so a small integer bound holds end-to-end
    err = np.abs(rgb.astype(int) - ycbcr_to_rgb_fixed(y, cb, cr).astype(int)).max()
    assert err <= 6


def test_color_420_odd_dims_roundtrip():
    # non-multiple-of-16 luma: MCU padding + crop; chroma at ceil-half res
    m = 9
    y, cb, cr = jpeg_color_planes(m, 40, 24)
    rgb = decode_jpeg(encode_jpeg_color(y, cb, cr, subsample=True))
    assert (rgb == _expected_color_rgb(m, 40, 24)).all()


def test_color_chroma_shape_validation():
    y, cb, cr = jpeg_color_planes(0, 32, 32)
    with pytest.raises(ValueError, match="chroma"):
        encode_jpeg_color(y, cb[:-1], cr, subsample=True)
    with pytest.raises(ValueError, match="chroma"):
        encode_jpeg_color(y, cb, cr, subsample=False)  # 4:4:4 wants full res


def test_fixed_point_transform_matches_float_within_1lsb():
    # the documented integer coefficients track the real JFIF transform
    rng = np.random.default_rng(6)
    y, cb, cr = (rng.integers(0, 256, (64,)).astype(np.uint8) for _ in range(3))
    got = ycbcr_to_rgb_fixed(y[None, :], cb[None, :], cr[None, :]).astype(float)
    yf, cbf, crf = y.astype(float), cb.astype(float) - 128, cr.astype(float) - 128
    ref = np.stack(
        [yf + 1.402 * crf, yf - 0.344136 * cbf - 0.714136 * crf, yf + 1.772 * cbf],
        axis=-1,
    )[None, :, :].clip(0, 255)
    assert np.abs(got - ref).max() <= 1.0


def test_spark_color_feature_path_matches_formula(spark):
    feats = {
        r["media_id"]: (r["mean_intensity"], r["max_intensity"], r["nonzero_frac_pct"])
        for r in extract_features(
            synthesize_jpeg_color_media(spark, n=6, width=32, height=32)
        ).collect()
    }
    for m in range(6):
        px = _expected_color_rgb(m, 32, 32).astype(np.int64)
        want = (int(px.mean()), int(px.max()), int(100 * (px > 0).mean()))
        assert feats[m] == want, (m, feats[m], want)


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
