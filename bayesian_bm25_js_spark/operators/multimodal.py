"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched `mapInPandas` stages. The decode step is STUBBED in this
container (no image/audio libs): `decode=\"real\"` raises
NotImplementedError at the call site, while the default deterministic
fake decoder hashes the payload into a fixed-shape feature vector so
the Spark-side plumbing — schema, batch shape, partitioning — is real
and tested end-to-end.

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

    decode="real" runs actual decoders where the optional libraries are
    importable: PIL for image rows (FEATURE_DIM-bin grayscale
    histogram). Audio/video decoders (librosa/av) are not integrated
    yet; real-mode rows of those modalities raise inside the task. With
    PIL absent, decode="real" raises at plan time naming the missing
    dependency."""
    if decode == "real" and not HAS_PIL:
        raise NotImplementedError(
            "decode='real' requires PIL (pillow), which is not "
            "installed; use decode='fake' for the deterministic stub"
        )
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


def _real_decode_features(payload: bytes, modality: str, dim: int = FEATURE_DIM):
    """PIL-backed image features: dim-bin normalized grayscale
    histogram. Runs inside the Arrow batch, one decode per row."""
    if modality != "image":
        raise NotImplementedError(
            f"real decode for modality {modality!r} is not integrated "
            "(librosa/av); image rows only"
        )
    import io

    try:
        from PIL import Image
    except ImportError as e:
        # Executor-side twin of the driver's plan-time HAS_PIL gate:
        # on a cluster whose executors lack pillow the plan-time check
        # (driver env) passes, so fail here with the same clear message
        # instead of a raw ImportError inside the task.
        raise NotImplementedError(
            "decode='real' requires PIL (pillow) on the EXECUTORS; the "
            "driver has it but this executor does not — install pillow "
            "cluster-wide or use decode='fake'"
        ) from e

    img = Image.open(io.BytesIO(payload)).convert("L")
    hist = np.asarray(img.histogram(), dtype=np.float64)  # 256 bins
    binned = hist.reshape(dim, 256 // dim).sum(axis=1)
    total = binned.sum()
    return (binned / total if total > 0 else binned).tolist()


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


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    decode: str = "fake",
) -> DataFrame:
    """Image resize stage: media -> media with image payloads replaced
    by the resized encoding and meta.width/height updated (non-image
    rows pass through untouched).

    decode="real" resamples with PIL (optional dependency: raises at
    plan time naming it when absent) and re-encodes as PNG. The default
    deterministic fake derives the new payload as
    sha256(original ++ "WxH"), so the plumbing a real kernel needs —
    mapInPandas over arrow batches, binary-in/binary-out, metadata
    rewrite, modality passthrough — is exercised end-to-end and the
    output is stable for oracle comparison.
    """
    if decode == "real" and not HAS_PIL:
        raise NotImplementedError(
            "decode='real' requires PIL (pillow), which is not "
            "installed; use decode='fake' for the deterministic stub"
        )
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    if width < 1 or height < 1:
        raise ValueError(f"target size must be positive, got {width}x{height}")

    tag = f"{width}x{height}".encode()

    def _real_resize(payload: bytes) -> bytes:
        import io

        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "decode='real' requires PIL (pillow) on the EXECUTORS; "
                "the driver has it but this executor does not — install "
                "pillow cluster-wide or use decode='fake'"
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
