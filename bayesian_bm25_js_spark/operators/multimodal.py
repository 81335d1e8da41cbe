"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched `mapInPandas` stages. Real decoding dispatches on the
payload's container format: binary PPM (P6) images, RIFF/WAVE PCM16
audio, and YUV4MPEG2 (Y4M) video have built-in pure-NumPy decoders
(runnable in this container — no image/audio/video libs needed);
PNG/JPEG/etc. use PIL when importable (checked executor-side with a
clear error naming pillow); compressed audio (librosa) and compressed
video (av) decoders are NOT integrated and raise per-row. The default deterministic fake decoder hashes the
payload into a fixed-shape feature vector so the Spark-side plumbing —
schema, batch shape, partitioning — is testable independent of codecs.

Schema contract:
  media (doc_id long, modality string, data binary,
         meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import hashlib
import importlib.util
from typing import Iterator

# Real decoders are OPTIONAL dependencies: decode="real" works when PIL
# is importable (image rows), and degrades to a clear error naming the
# missing library otherwise. The deterministic "fake" decoder remains
# the default either way.
HAS_PIL = importlib.util.find_spec("PIL") is not None

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("data", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255). Trivial container
    format every image tool reads; lets the real-decode path run
    without PIL."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) pixels, got {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Pure NumPy: header tokens
    (whitespace-separated, # comments) then raw RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    # tokenize header: magic, width, height, maxval; a single
    # whitespace byte follows maxval, then raw pixel data
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3 and i < n:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < n and payload[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    need = w * h * 3
    raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=i)
    return raw.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 PCM samples -> minimal RIFF/WAVE (mono, 16-bit)."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE PCM16 -> int16 sample array (channels interleaved).
    Pure NumPy chunk walk; 16-bit PCM only."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    bits = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            if bits not in (None, 16):
                raise ValueError(f"only 16-bit PCM supported, got {bits}-bit")
            return np.frombuffer(body[: len(body) - len(body) % 2], dtype="<i2")
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    raise ValueError("WAVE payload has no data chunk")


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n_frames, h, w) uint8 luma -> YUV4MPEG2 (Cmono). The simplest
    uncompressed video container (mpv/ffmpeg read it); completes the
    image(PPM)/audio(WAV)/video(Y4M) pure-NumPy decoder triple so the
    real media path is executable per-modality without av/ffmpeg."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError(f"expected (n_frames, h, w) luma frames, got {arr.shape}")
    n, h, w = arr.shape
    head = b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 Cmono\n" % (w, h, fps)
    return head + b"".join(b"FRAME\n" + arr[i].tobytes() for i in range(n))


def decode_y4m(payload: bytes) -> np.ndarray:
    """YUV4MPEG2 -> (n_frames, h, w) uint8 luma planes. Pure NumPy
    stream walk; Cmono and C420* (luma plane read, chroma skipped)
    supported — the colorspaces ffmpeg emits by default."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    chroma = b"420"
    for tok in payload[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            chroma = tok[1:]
    if not w or not h:
        raise ValueError("YUV4MPEG2 header missing W/H")
    if chroma.startswith(b"mono"):
        frame_bytes, luma_bytes = w * h, w * h
    elif chroma.startswith(b"420"):
        frame_bytes, luma_bytes = w * h + 2 * ((w // 2) * (h // 2)), w * h
    elif chroma.startswith(b"444"):
        frame_bytes, luma_bytes = 3 * w * h, w * h
    else:
        raise ValueError(f"unsupported Y4M colorspace C{chroma.decode()}")
    frames, pos, n = [], nl + 1, len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M FRAME marker")
        start = fnl + 1
        if start + frame_bytes > n:
            raise ValueError("truncated Y4M frame data")
        luma = np.frombuffer(payload, dtype=np.uint8, count=luma_bytes, offset=start)
        frames.append(luma.reshape(h, w))
        pos = start + frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w), dtype=np.uint8)


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded feature
    vector in [-1, 1]. Replaces image/audio lib output in this container."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 8) // len(digest) + 1))[: dim * 8], dtype=np.uint64)
    return (raw.astype(np.float64) / np.float64(2**64)) * 2.0 - 1.0


def extract_features(
    media: DataFrame, decode: str = "fake", batch_size_hint: int = 256
) -> DataFrame:
    """media -> (doc_id, modality, feature array<double>[FEATURE_DIM]).

    decode="real" dispatches per row on the payload's container
    format: binary PPM (P6) images and RIFF/WAVE PCM16 audio decode
    with the built-in pure-NumPy decoders (no optional dependency —
    the path runs in this container); other image formats (PNG/JPEG/…)
    need PIL and raise a clear NotImplementedError naming pillow when
    it is absent (checked on the EXECUTOR, where the decode actually
    runs); YUV4MPEG2 video decodes with the built-in pure-NumPy Y4M
    reader; compressed audio/video decoders (librosa/av) are not
    integrated and raise per-row. Features: images -> FEATURE_DIM-bin
    normalized grayscale histogram (integer ITU-R 601-2 luma, matching
    PIL convert("L")); audio -> FEATURE_DIM-bin normalized amplitude
    histogram over the int16 range; video -> FEATURE_DIM-bin normalized
    luma histogram pooled over all frames."""
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                feats = [
                    _real_decode_features(bytes(b), m)
                    for b, m in zip(pdf["data"], pdf["modality"])
                ]
            else:
                feats = [
                    _fake_decode_features(bytes(b)).tolist() for b in pdf["data"]
                ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def _hist_features(hist256: np.ndarray, dim: int):
    binned = hist256.astype(np.float64).reshape(dim, 256 // dim).sum(axis=1)
    total = binned.sum()
    return (binned / total if total > 0 else binned).tolist()


def _real_decode_features(payload: bytes, modality: str, dim: int = FEATURE_DIM):
    """Format-sniffing real decoders. Runs inside the Arrow batch, one
    decode per row. PPM/WAV decode natively (pure NumPy); other image
    formats fall back to PIL with an executor-side dependency check."""
    if modality == "image":
        if payload[:2] == b"P6":
            rgb = decode_ppm(bytes(payload)).astype(np.uint32)
            # integer ITU-R 601-2 luma — bit-identical to PIL .convert("L")
            luma = (
                rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114
            ) // 1000
            return _hist_features(np.bincount(luma.ravel(), minlength=256), dim)
        import io

        try:
            from PIL import Image
        except ImportError as e:
            # Executor-side twin of the driver-env HAS_PIL probe: on a
            # cluster whose executors lack pillow, fail with the same
            # clear message instead of a raw ImportError in the task.
            raise NotImplementedError(
                "decode='real' for non-PPM images requires PIL (pillow) "
                "on the EXECUTORS — install pillow cluster-wide, "
                "re-encode as binary PPM (P6), or use decode='fake'"
            ) from e

        img = Image.open(io.BytesIO(payload)).convert("L")
        return _hist_features(np.asarray(img.histogram()), dim)
    if modality == "audio":
        if payload[:4] == b"RIFF":
            samples = decode_wav(bytes(payload)).astype(np.int64)
            bins = ((samples + 32768) * 256) // 65536  # int16 -> 256 bins
            return _hist_features(np.bincount(bins, minlength=256), dim)
        raise NotImplementedError(
            "real decode for compressed audio is not integrated "
            "(librosa); RIFF/WAVE PCM16 payloads only"
        )
    if modality == "video":
        if payload[:9] == b"YUV4MPEG2":
            frames = decode_y4m(bytes(payload))
            hist = np.bincount(frames.ravel(), minlength=256)[:256]
            return _hist_features(hist, dim)
        raise NotImplementedError(
            "real decode for compressed video is not integrated (av); "
            "YUV4MPEG2 payloads only"
        )
    raise NotImplementedError(
        f"real decode for modality {modality!r} is not integrated"
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index,
    derived from meta.n_frames — pure Catalyst (explode over sequence);
    actual frame decode plugs into extract_features."""
    return media.filter(F.col("modality") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def synthesize_media(spark, n_rows: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload = sha2 of id."""
    df = spark.range(n_rows)
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.col("id").alias("doc_id"),
        modality.alias("modality"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("data"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(48).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.col("id"), F.lit(50)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def synthesize_real_media(spark, n_rows: int = 48) -> DataFrame:
    """Deterministic DECODABLE media table: binary PPM images, RIFF/WAVE
    PCM16 audio and YUV4MPEG2 video whose pixel/sample/luma arrays are
    pure integer functions of doc_id — so an independent NumPy mirror
    (tools/make_golden.py) can recompute the expected real-decode
    features without running any of this module's codecs."""
    rows = []
    for i in range(n_rows):
        m = i % 3
        if m == 0:
            y, x, c = np.ogrid[0:6, 0:8, 0:3]
            rgb = ((i * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)
            rows.append((i, "image", bytearray(encode_ppm(rgb)), (8, 6, 0, 0)))
        elif m == 1:
            j = np.arange(128)
            samples = (((i * 97 + j * 53) % 65536) - 32768).astype(np.int16)
            rows.append((i, "audio", bytearray(encode_wav(samples)), (0, 0, 16000, 0)))
        else:
            f, y, x = np.ogrid[0:2, 0:6, 0:4]
            luma = ((i * 13 + f * 29 + y * 5 + x * 17) % 256).astype(np.uint8)
            rows.append((i, "video", bytearray(encode_y4m(luma)), (4, 6, 0, 2)))
    return spark.createDataFrame(
        rows,
        "doc_id long, modality string, data binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    decode: str = "fake",
) -> DataFrame:
    """Image resize stage: media -> media with image payloads replaced
    by the resized encoding and meta.width/height updated (non-image
    rows pass through untouched).

    decode="real" resamples per payload format: binary PPM (P6)
    resizes nearest-neighbor in pure NumPy and re-encodes as PPM (no
    optional dependency); other formats resample with PIL (executor-
    side check raises a clear NotImplementedError naming pillow when
    absent) and re-encode as PNG. The default deterministic fake
    derives the new payload as sha256(original ++ "WxH"), so the
    plumbing a real kernel needs — mapInPandas over arrow batches,
    binary-in/binary-out, metadata rewrite, modality passthrough — is
    exercised end-to-end and the output is stable for oracle
    comparison.
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    if width < 1 or height < 1:
        raise ValueError(f"target size must be positive, got {width}x{height}")

    tag = f"{width}x{height}".encode()

    def _real_resize(payload: bytes) -> bytes:
        if payload[:2] == b"P6":
            rgb = decode_ppm(payload)
            h0, w0 = rgb.shape[:2]
            # nearest-neighbor index maps (PIL NEAREST convention:
            # src = floor((dst + 0.5) * scale))
            ys = np.minimum(
                ((np.arange(height) + 0.5) * (h0 / height)).astype(np.int64), h0 - 1
            )
            xs = np.minimum(
                ((np.arange(width) + 0.5) * (w0 / width)).astype(np.int64), w0 - 1
            )
            return encode_ppm(rgb[ys][:, xs])
        import io

        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "decode='real' for non-PPM images requires PIL (pillow) "
                "on the EXECUTORS — install pillow cluster-wide, "
                "re-encode as binary PPM (P6), or use decode='fake'"
            ) from e

        img = Image.open(io.BytesIO(payload))
        out = io.BytesIO()
        img.resize((width, height)).save(out, format="PNG")
        return out.getvalue()

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["modality"] == "image"
            data = pdf["data"].tolist()
            meta = pdf["meta"].tolist()
            for i in np.nonzero(is_img.to_numpy())[0]:
                if decode == "real":
                    data[i] = _real_resize(bytes(data[i]))
                else:
                    data[i] = hashlib.sha256(bytes(data[i]) + tag).digest()
                m = dict(meta[i])
                m["width"], m["height"] = width, height
                meta[i] = m
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "data": data,
                    "meta": meta,
                }
            )

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)
