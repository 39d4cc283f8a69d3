"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schemas, Arrow-batched
`mapInPandas` UDF signatures, partitioning, metadata propagation.  REAL
codecs, all pure stdlib+numpy: PNG (pipeline/png.py), GIF (pipeline/
gif.py), baseline JPEG (pipeline/jpeg.py), WAV (stdlib wave).  Video
frame extraction genuinely needs libraries absent from this environment,
so `_decode_bytes` raises NotImplementedError there; the deterministic
'fake' codec (payload = struct-packed pixel grid) keeps every downstream
stage exercised end-to-end regardless.

Schema convention for a multimodal row:
    media: binary            -- opaque payload
    media_type: string       -- 'image/fake', 'image/jpeg', 'audio/wav', ...
    meta: struct<width:int, height:int, channels:int, sample_rate:int,
                 n_frames:int>
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_FIELDS = [
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_frames", IntegerType()),
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_type", StringType()),
        StructField("meta", StructType(META_FIELDS)),
    ]
)

_FAKE_MAGIC = b"FAKE"


def encode_fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake payload: header + uint8 pixel grid derived from id."""
    rng = np.arange(width * height, dtype=np.uint64)
    pixels = ((rng * 2654435761 + media_id * 97) % 251).astype(np.uint8)
    return _FAKE_MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


def _decode_bytes(payload: bytes, media_type: str) -> np.ndarray:
    """Decode payload → HxW (grey) or HxWx3 (RGB) uint8 array.

    REAL codecs: image/png (stdlib-zlib decoder, pipeline/png.py),
    image/gif (pure-stdlib LZW, pipeline/gif.py), image/jpeg (pure-numpy
    baseline DCT/Huffman, pipeline/jpeg.py) and audio/wav (stdlib wave,
    decode_wav).  'image/fake' is the deterministic struct-packed fixture
    codec.  Video (multi-frame, so not a single HxW array) has its own
    REAL path: AVI/MJPG via pipeline/avi.py + `video_features` below;
    other video containers/codecs genuinely need libraries absent from
    this environment."""
    if media_type == "image/fake":
        if payload[:4] != _FAKE_MAGIC:
            raise ValueError("bad fake-image payload")
        w, h = struct.unpack("<II", payload[4:12])
        return np.frombuffer(payload[12:], dtype=np.uint8).reshape(h, w)
    if media_type == "image/png":
        from .png import decode_png

        return decode_png(payload)
    if media_type == "image/gif":
        from .gif import decode_gif

        return decode_gif(payload)
    if media_type == "image/jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        f"codec for {media_type!r} requires media libraries not present "
        "in this environment; REAL paths: 'image/png' (stdlib-zlib decoder), "
        "'image/gif' (pure-stdlib LZW decoder), 'image/jpeg' (pure-numpy "
        "baseline DCT/Huffman decoder), 'audio/wav' (stdlib wave) and "
        "'video/avi' MJPG (pipeline/avi.py, via video_features — multi-frame, "
        "so not dispatched through this single-image helper); "
        "plumbing fixture: 'image/fake'"
    )


# -- REAL codec: PCM WAV via the stdlib wave module ---------------------------


def encode_wav(media_id: int, n_samples: int = 800, sample_rate: int = 8000) -> bytes:
    """Deterministic mono PCM16 WAV: sample t of media m =
    ((t·(m%17+3)) % 1024) − 512 — an integer sawtooth whose features any SQL
    engine regenerates exactly (the audio_features oracle).  The RIFF
    container is produced by the real stdlib `wave` writer."""
    import io
    import wave as _wave

    k = media_id % 17 + 3
    t = np.arange(n_samples, dtype=np.int64)
    samples = ((t * k) % 1024 - 512).astype(np.int16)
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL WAV decode (stdlib wave): payload → (int16 samples, rate)."""
    import io
    import wave as _wave

    with _wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("only mono PCM16 supported")
        sr = w.getframerate()
        data = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    return data, sr


def synthesize_audio(
    spark: SparkSession, n: int = 64, n_samples: int = 800, sample_rate: int = 8000
) -> DataFrame:
    """Deterministic audio table in MEDIA_SCHEMA (media_type='audio/wav',
    payloads are genuine RIFF/WAV files)."""
    rows = [
        (
            i,
            encode_wav(i, n_samples, sample_rate),
            "audio/wav",
            (None, None, 1, sample_rate, n_samples),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def png_pixels(media_id: int, width: int, height: int) -> np.ndarray:
    """Deterministic greyscale grid whose value any SQL engine regenerates:
    pixel (y, x) of media m = (7x + 13y + 31m) % 256."""
    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    return ((7 * x[None, :] + 13 * y[:, None] + 31 * media_id) % 256).astype(np.uint8)


def synthesize_png_media(
    spark: SparkSession, n: int = 64, width: int = 8, height: int = 8
) -> DataFrame:
    """Deterministic media table whose payloads are genuine PNG files
    (media_type='image/png', stdlib-zlib encoder, mixed scanline filters so
    decode exercises every inverse-filter path)."""
    from .png import encode_png

    rows = [
        (
            i,
            encode_png(png_pixels(i, width, height), filter_type="mixed"),
            "image/png",
            (width, height, 1, None, 1),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthesize_gif_media(
    spark: SparkSession, n: int = 64, width: int = 8, height: int = 8
) -> DataFrame:
    """Deterministic media table whose payloads are genuine GIF89a files
    (media_type='image/gif', pure-stdlib variable-width LZW encoder) over
    the same formula grid as the PNG fixture — so the two real image codecs
    share one SQL oracle."""
    from .gif import encode_gif

    rows = [
        (
            i,
            encode_gif(png_pixels(i, width, height)),
            "image/gif",
            (width, height, 1, None, 1),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthesize_jpeg_media(
    spark: SparkSession, n: int = 64, width: int = 16, height: int = 16
) -> DataFrame:
    """Deterministic media table whose payloads are genuine baseline JPEG
    files (media_type='image/jpeg', pure-numpy DCT + canonical-Huffman
    encoder).  Pixels are BLOCK-CONSTANT (jpeg_block_pixels) so the lossy
    codec round-trips EXACTLY and a SQL oracle can regenerate them by
    formula — see pipeline/jpeg.py's module docstring."""
    from .jpeg import encode_jpeg, jpeg_block_pixels

    rows = [
        (
            i,
            encode_jpeg(jpeg_block_pixels(i, width, height)),
            "image/jpeg",
            (width, height, 1, None, 1),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthesize_jpeg_color_media(
    spark: SparkSession, n: int = 64, width: int = 32, height: int = 32
) -> DataFrame:
    """Deterministic media table whose payloads are genuine 3-component
    YCbCr 4:2:0 baseline JPEGs (media_type='image/jpeg', two quant/Huffman
    table ids, interleaved MCU scan).  Planes are MCU-CONSTANT
    (jpeg_color_planes) so the lossy codec + replicate chroma upsampling
    round-trip EXACTLY, and the decoder's fixed-point YCbCr→RGB transform
    is a pure integer formula a SQL oracle regenerates — see
    pipeline/jpeg.py's module docstring."""
    from .jpeg import encode_jpeg_color, jpeg_color_planes

    rows = [
        (
            i,
            encode_jpeg_color(*jpeg_color_planes(i, width, height), subsample=True),
            "image/jpeg",
            (width, height, 3, None, 1),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthesize_media(
    spark: SparkSession, n: int = 64, width: int = 8, height: int = 8
) -> DataFrame:
    """Deterministic media table in MEDIA_SCHEMA (the test fixture source)."""
    rows = [
        (
            i,
            encode_fake_image(i, width, height),
            "image/fake",
            (width, height, 1, None, 1),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# -- kernels: all Arrow-batched mapInPandas, never per-row Python UDFs ---------

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mean_intensity", IntegerType()),
        StructField("max_intensity", IntegerType()),
        StructField("nonzero_frac_pct", IntegerType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """[media_id, mean/max intensity, nonzero fraction] per payload.

    mapInPandas: each Arrow batch is decoded vectorized (one numpy op per
    batch column, not per row) — the shape every real decode kernel uses.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [_decode_bytes(p, t) for p, t in zip(pdf["media"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "mean_intensity": [int(a.mean()) for a in arrs],
                    "max_intensity": [int(a.max()) for a in arrs],
                    "nonzero_frac_pct": [int(100 * (a > 0).mean()) for a in arrs],
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("sum_sq", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """[media_id, n_samples, sample_rate, duration_ms, sum_sq,
    zero_crossings] per WAV payload — the REAL-codec feature kernel:
    every batch runs the stdlib wave decoder, numpy does the math.

    Features are all exact integers (sum of squares instead of fp RMS), so
    the oracle parity is hash-exact."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, srs, durs, sqs, zcs = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                s, sr = decode_wav(payload)
                n = len(s)
                s64 = s.astype(np.int64)
                ids.append(mid)
                ns.append(n)
                srs.append(sr)
                durs.append(n * 1000 // sr)
                sqs.append(int((s64 * s64).sum()))
                # sign change between consecutive samples (>=0 vs <0)
                nonneg = s64 >= 0
                zcs.append(int((nonneg[1:] != nonneg[:-1]).sum()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_samples": ns,
                    "sample_rate": srs,
                    "duration_ms": durs,
                    "sum_sq": sqs,
                    "zero_crossings": zcs,
                }
            )

    return media.mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)


def resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize preserving MEDIA_SCHEMA (fake codec only)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for p, t in zip(pdf["media"], pdf["media_type"]):
                a = _decode_bytes(p, t)
                ys = (np.arange(out_h) * a.shape[0] // out_h).astype(int)
                xs = (np.arange(out_w) * a.shape[1] // out_w).astype(int)
                r = a[np.ix_(ys, xs)]
                out_payloads.append(
                    _FAKE_MAGIC + struct.pack("<II", out_w, out_h) + r.tobytes()
                )
            meta = pd.DataFrame(
                {
                    "width": out_w,
                    "height": out_h,
                    "channels": 1,
                    "sample_rate": None,
                    "n_frames": 1,
                },
                index=pdf.index,
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media": out_payloads,
                    "media_type": pdf["media_type"].values,
                    "meta": meta.to_dict("records"),
                }
            )

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Metadata-only frame sampling: n_frames → ceil(n_frames/every_n).

    Pure column expressions (no decode needed) — the planner-side half of a
    video pipeline; payload slicing would plug into the same stub."""
    new_frames = F.ceil(F.col("meta.n_frames") / F.lit(every_n)).cast("int")
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.channels").alias("channels"),
            F.col("meta.sample_rate").alias("sample_rate"),
            new_frames.alias("n_frames"),
        ),
    )


# -- REAL codec: AVI/MJPG video (pipeline/avi.py) ------------------------------


def video_frame_pixels(
    media_id: int, frame: int, width: int, height: int
) -> "np.ndarray":
    """Deterministic BLOCK-CONSTANT frame grid (exact-JPEG-roundtrip, like
    jpeg_block_pixels): pixel (y,x) of frame f of media m =
    (17·(x//8) + 29·(y//8) + 31·m + 41·f) % 256."""
    bx = np.arange(width, dtype=np.int64) // 8
    by = np.arange(height, dtype=np.int64) // 8
    return (
        (17 * bx[None, :] + 29 * by[:, None] + 31 * media_id + 41 * frame) % 256
    ).astype(np.uint8)


def synthesize_video_media(
    spark: SparkSession,
    n: int = 48,
    width: int = 16,
    height: int = 16,
    n_frames: int = 6,
    fps: int = 4,
) -> DataFrame:
    """Deterministic media table whose payloads are genuine AVI/MJPG files
    (media_type='video/avi'): every frame is a real baseline JPEG inside a
    real RIFF container (pipeline/avi.py).  Block-constant frames round-trip
    the lossy codec exactly, so a SQL oracle regenerates pixels by formula."""
    from .avi import encode_avi_mjpeg

    rows = [
        (
            i,
            encode_avi_mjpeg(
                [video_frame_pixels(i, f, width, height) for f in range(n_frames)],
                fps=fps,
            ),
            "video/avi",
            (width, height, 1, None, n_frames),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


VIDEO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sampled_frames", IntegerType()),
        StructField("sum_mean_intensity", LongType()),
        StructField("max_intensity", IntegerType()),
    ]
)


def video_features(media: DataFrame, every_n: int = 2) -> DataFrame:
    """[media_id, n_frames, width, height, sampled_frames,
    sum_mean_intensity, max_intensity] per AVI/MJPG payload.

    The video analogue of extract_features: each Arrow batch walks the RIFF
    container and Huffman-decodes only the SAMPLED frames (f % every_n == 0
    — frame sampling bounds decode cost, the knob a 100 TB video corpus
    actually turns).  All features are exact integers: per-frame
    floor(mean) summed across sampled frames, max over sampled pixels."""
    from .avi import decode_avi_mjpeg

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfs, ws, hs, sfs, sums, maxs = [], [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                sampled, info = decode_avi_mjpeg(payload, sample_every=every_n)
                ids.append(mid)
                nfs.append(info["n_frames"])
                ws.append(info["width"])
                hs.append(info["height"])
                sfs.append(len(sampled))
                # a structurally valid zero-frame AVI yields the zero row,
                # not an opaque max()-of-empty crash inside the Arrow worker
                sums.append(sum(int(a.mean()) for a in sampled))
                maxs.append(max((int(a.max()) for a in sampled), default=0))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_frames": nfs,
                    "width": ws,
                    "height": hs,
                    "sampled_frames": sfs,
                    "sum_mean_intensity": sums,
                    "max_intensity": maxs,
                }
            )

    return media.mapInPandas(kernel, VIDEO_FEATURE_SCHEMA)
