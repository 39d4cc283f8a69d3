"""REAL PNG codec tests: round-trips per filter, hand-computed filter
vectors from the spec, CRC verification, honest unsupported-feature errors,
and the Spark feature path over genuine PNG payloads."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from neo4j_graph_algorithms_spark.pipeline.multimodal import (
    _decode_bytes,
    extract_features,
    png_pixels,
    synthesize_png_media,
)
from neo4j_graph_algorithms_spark.pipeline.png import decode_png, encode_png


def _rand_img(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint16).astype(np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4, "mixed"])
def test_grey_roundtrip_every_filter(ftype):
    img = _rand_img((11, 7), seed=3)
    out = decode_png(encode_png(img, filter_type=ftype))
    assert out.dtype == np.uint8 and (out == img).all()


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4, "mixed"])
def test_rgb_roundtrip_every_filter(ftype):
    img = _rand_img((6, 5, 3), seed=9)
    out = decode_png(encode_png(img, filter_type=ftype))
    assert out.shape == (6, 5, 3) and (out == img).all()


def _idat_raw(payload: bytes) -> bytes:
    """Concatenate + decompress the IDAT stream of a PNG payload."""
    pos, idat = 8, b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        if typ == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
    return zlib.decompress(idat)


def test_filtered_scanlines_match_spec_hand_computed():
    """Forward filters verified against values computed by hand from the
    PNG spec (not by this codec), so a matched encoder/decoder bug can't
    cancel out in the round-trip tests.

    Image (grey, 3 wide): row0=[10,20,250], row1=[5,200,100].
      Sub   row0: [10, 20-10, 250-20]                      = [10,10,230]
      Up    row1: [5-10, 200-20, 100-250]          mod 256 = [251,180,106]
      Avg   row1: [5-(0+10)//2, 200-(5+20)//2, 100-(200+250)//2]
                                                   mod 256 = [0,188,131]
      Paeth row1: predictors (10,20,250) -> [251,180,106]
    """
    img = np.array([[10, 20, 250], [5, 200, 100]], dtype=np.uint8)

    raw = _idat_raw(encode_png(img, filter_type=1))  # Sub both rows
    assert list(raw[:4]) == [1, 10, 10, 230]
    assert list(raw[4:]) == [1, 5, 195, 156]  # row1 Sub: 5, 200-5, 100-200

    raw = _idat_raw(encode_png(img, filter_type=2))  # Up both rows
    assert list(raw[4:]) == [2, 251, 180, 106]

    raw = _idat_raw(encode_png(img, filter_type=3))  # Average
    assert list(raw[4:]) == [3, 0, 188, 131]

    raw = _idat_raw(encode_png(img, filter_type=4))  # Paeth
    assert list(raw[4:]) == [4, 251, 180, 106]


def test_crc_verified():
    payload = bytearray(encode_png(_rand_img((4, 4), seed=1)))
    # flip one byte inside the IDAT data region (after sig+IHDR chunk+len+type)
    payload[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX" + b"\x00" * 32)


def test_unsupported_features_raise_honestly():
    payload = bytearray(encode_png(_rand_img((4, 4), seed=2)))
    # IHDR data starts at offset 16; interlace byte is its 13th (offset 28)
    payload[16 + 12] = 1
    ihdr = bytes(payload[12:16]) + bytes(payload[16:29])
    payload[29:33] = struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(NotImplementedError, match="interlacing"):
        decode_png(bytes(payload))
    # 16-bit depth
    payload = bytearray(encode_png(_rand_img((4, 4), seed=2)))
    payload[16 + 8] = 16
    ihdr = bytes(payload[12:16]) + bytes(payload[16:29])
    payload[29:33] = struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(bytes(payload))


def test_ancillary_chunks_skipped_but_crc_checked():
    payload = encode_png(_rand_img((3, 3), seed=5))
    text = b"Comment\x00hi"
    chunk = (
        struct.pack(">I", len(text))
        + b"tEXt"
        + text
        + struct.pack(">I", zlib.crc32(b"tEXt" + text) & 0xFFFFFFFF)
    )
    # splice tEXt between IHDR and IDAT (IHDR chunk ends at offset 33)
    spliced = payload[:33] + chunk + payload[33:]
    assert (decode_png(spliced) == decode_png(payload)).all()


def test_decode_bytes_routes_png():
    img = png_pixels(3, 8, 8)
    assert (_decode_bytes(encode_png(img, "mixed"), "image/png") == img).all()


def test_png_features_spark_path(spark):
    """extract_features over genuine PNG payloads == formula-regenerated
    features (the image_png_features gate's local twin)."""
    media = synthesize_png_media(spark, n=16, width=8, height=8).repartition(4)
    got = {r.media_id: r for r in extract_features(media).collect()}
    assert len(got) == 16
    for mid in range(16):
        a = png_pixels(mid, 8, 8)
        assert got[mid].mean_intensity == int(a.mean())
        assert got[mid].max_intensity == int(a.max())
        assert got[mid].nonzero_frac_pct == int(100 * (a > 0).mean())
