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
    """STUB — image decoding needs a codec library not present in this
    container. The call signature and the `extract_media_features` plumbing
    around it are the real, tested interface; swap this body for
    PIL/libvips/ffmpeg in a real deployment."""
    raise NotImplementedError(
        "image decode is stubbed: no codec libraries in this environment"
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
