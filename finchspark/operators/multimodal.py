"""Multimodal columns: binary payloads with typed metadata.

Images/audio/video ride as opaque `binary` columns next to a typed metadata
struct; decode / feature-extraction runs as Arrow-batched `mapInPandas` so
the Spark-side plumbing (schema, partitioning, batch shape) is real and
tested even though the actual codecs are STUBBED in this container (no
image/audio libraries available — see `decode_image`).

At scale: binary payloads dominate row size — the stage repartitions by
payload size (same length-bucketing rationale as the signature stage) and
`spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("magic", T.StringType()),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """payload → uint8 pixel array (h, w, c).

    PNG decodes for real via the pure-stdlib codec (`kernels/png.py`: zlib
    inflate + the five scanline filters, numpy reconstruction). Other
    formats (JPEG/GIF/WebP) genuinely need a codec library this container
    doesn't have and raise NotImplementedError — swap in PIL/libvips for
    them in a real deployment."""
    raw = bytes(payload)
    if raw.startswith(b"\x89PNG"):
        from ..kernels.png import decode_png

        return decode_png(raw)
    raise NotImplementedError(
        "only PNG decodes without a codec library; got magic "
        f"{raw[:4].hex() if raw else '<empty>'}"
    )


def _entropy(arr: np.ndarray) -> float:
    if len(arr) == 0:
        return 0.0
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    p = counts[counts > 0] / len(arr)
    return float(-(p * np.log2(p)).sum())


_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"fLaC", "flac"),
    (b"\x1a\x45\xdf\xa3", "matroska"),
]


def extract_media_features(
    df: DataFrame,
    payload_col: str = "payload",
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """payload binary → deterministic byte-level features + metadata struct.

    Everything computable without codecs is real (size, sha256, byte entropy,
    magic sniffing); pixel/sample-level features route through the stubbed
    decoder and are omitted here by design.
    """
    schema = T.StructType(
        [df.schema[c] for c in key_cols] + [T.StructField("meta", MEDIA_META_SCHEMA)]
    )
    n_key = len(key_cols)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf.iloc[:, n_key]
            metas = []
            for p in payloads:
                raw = bytes(p) if p is not None else b""
                arr = np.frombuffer(raw, dtype=np.uint8)
                magic = next((name for sig, name in _MAGIC if raw.startswith(sig)), "unknown")
                metas.append(
                    {
                        "media_type": magic,
                        "n_bytes": len(raw),
                        "sha256": hashlib.sha256(raw).hexdigest(),
                        "byte_entropy": _entropy(arr),
                        "magic": raw[:4].hex(),
                    }
                )
            out = pdf.iloc[:, :n_key].copy()
            out["meta"] = metas
            yield out

    sel = df.select(*key_cols, F.col(payload_col))
    return sel.mapInPandas(compute, schema)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("std_pixel", T.DoubleType()),
        T.StructField("channel_means", T.ArrayType(T.DoubleType())),
        T.StructField("decode_error", T.StringType()),
    ]
)


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Decoded pixel-level features per image payload (PNG path is real;
    undecodable payloads surface their error as a column instead of failing
    the batch — at web scale a poisoned payload must never kill the job).

    Output: key cols + (height, width, channels, mean_pixel, std_pixel,
    channel_means, decode_error).
    """
    schema = T.StructType(
        [df.schema[c] for c in key_cols] + list(IMAGE_FEATURES_SCHEMA.fields)
    )
    n_key = len(key_cols)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = {name: [] for name in (f.name for f in IMAGE_FEATURES_SCHEMA)}
            for p in pdf.iloc[:, n_key]:
                try:
                    img = decode_image(bytes(p) if p is not None else b"")
                    px = img.astype(np.float64)
                    feats["height"].append(img.shape[0])
                    feats["width"].append(img.shape[1])
                    feats["channels"].append(img.shape[2])
                    feats["mean_pixel"].append(float(px.mean()))
                    feats["std_pixel"].append(float(px.std()))
                    feats["channel_means"].append(
                        [float(m) for m in px.mean(axis=(0, 1))]
                    )
                    feats["decode_error"].append(None)
                except Exception as exc:  # noqa: BLE001 — poisoned payloads become rows
                    for name in (
                        "height",
                        "width",
                        "channels",
                        "mean_pixel",
                        "std_pixel",
                        "channel_means",
                    ):
                        feats[name].append(None)
                    feats["decode_error"].append(f"{type(exc).__name__}: {exc}")
            out = pdf.iloc[:, :n_key].copy()
            for name, vals in feats.items():
                out[name] = vals
            yield out

    sel = df.select(*key_cols, F.col(payload_col))
    return sel.mapInPandas(compute, schema)
