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
    """payload → uint8 pixel array (h, w) or (h, w, c).

    The four dominant web formats decode for REAL via pure-stdlib/numpy
    codecs: PNG (`kernels/png.py`: zlib inflate + the five scanline
    filters), baseline JPEG (`kernels/jpeg.py`: Huffman entropy decode,
    vectorized IDCT, 4:2:0/4:2:2 upsampling, restart intervals;
    progressive/arithmetic still raise), GIF (`kernels/gif.py`:
    variable-width LZW, interlacing, transparency — first composited
    frame; `decode_gif_frames` for animations), and lossless WebP
    (`kernels/webp.py`: full VP8L — prefix codes, color cache, LZ77 with
    the 2D distance map, all four transforms; differentially validated
    against libwebp). Lossy WebP (VP8) genuinely needs a video-codec-grade
    library and raises NotImplementedError — swap in PIL/libvips for it in
    a real deployment."""
    raw = bytes(payload)
    if raw.startswith(b"\x89PNG"):
        from ..kernels.png import decode_png

        return decode_png(raw)
    if raw.startswith(b"\xff\xd8"):
        from ..kernels.jpeg import decode_jpeg

        return decode_jpeg(raw)
    if raw.startswith(b"GIF8"):
        from ..kernels.gif import decode_gif

        return decode_gif(raw)
    if raw.startswith(b"RIFF") and raw[8:12] == b"WEBP":
        from ..kernels.webp import decode_webp

        return decode_webp(raw)
    raise NotImplementedError(
        "only PNG, baseline JPEG, GIF, and lossless WebP decode without a "
        f"codec library; got magic {raw[:4].hex() if raw else '<empty>'}"
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
                if magic == "riff":  # RIFF is a container: name the payload
                    form = raw[8:12]
                    magic = {b"WEBP": "webp", b"WAVE": "wav"}.get(form, "riff")
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
                    if img.ndim == 2:  # grayscale decoders return (h, w)
                        img = img[:, :, None]
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


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def decode_audio(payload: bytes) -> tuple["np.ndarray", int]:
    """payload → (float64 samples in [-1, 1] shaped (n, channels), rate).

    WAV PCM decodes for real (stdlib `wave` + numpy: 8/16/32-bit int PCM).
    Compressed codecs (FLAC/MP3/OGG/AAC) genuinely need a decoder library
    this container doesn't have and raise NotImplementedError — swap in
    soundfile/ffmpeg in a real deployment."""
    import io
    import wave

    raw = bytes(payload)
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        with wave.open(io.BytesIO(raw)) as w:
            rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
            frames = w.readframes(w.getnframes())
        if width == 1:  # unsigned 8-bit
            samples = (np.frombuffer(frames, np.uint8).astype(np.float64) - 128) / 128
        elif width == 2:
            samples = np.frombuffer(frames, "<i2").astype(np.float64) / 32768
        elif width == 4:
            samples = np.frombuffer(frames, "<i4").astype(np.float64) / 2147483648
        else:
            raise NotImplementedError(f"unsupported PCM width {width}")
        return samples.reshape(-1, nch), rate
    raise NotImplementedError(
        "only WAV PCM decodes without a codec library; got magic "
        f"{raw[:4].hex() if raw else '<empty>'}"
    )


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Sample-level audio features per payload (WAV path is real; poisoned
    or compressed payloads surface decode_error as a column, never fail the
    batch). Output: key cols + AUDIO_FEATURES_SCHEMA."""
    schema = T.StructType(
        [df.schema[c] for c in key_cols] + list(AUDIO_FEATURES_SCHEMA.fields)
    )
    n_key = len(key_cols)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in AUDIO_FEATURES_SCHEMA]
        for pdf in batches:
            feats = {name: [] for name in names}
            for p in pdf.iloc[:, n_key]:
                try:
                    samples, rate = decode_audio(bytes(p) if p is not None else b"")
                    mono = samples.mean(axis=1)
                    feats["sample_rate"].append(rate)
                    feats["n_channels"].append(samples.shape[1])
                    feats["n_samples"].append(samples.shape[0])
                    feats["duration_sec"].append(
                        samples.shape[0] / rate if rate else 0.0
                    )
                    feats["rms"].append(float(np.sqrt((mono**2).mean())) if len(mono) else 0.0)
                    feats["peak"].append(float(np.abs(mono).max()) if len(mono) else 0.0)
                    feats["zero_crossing_rate"].append(
                        float((np.diff(np.signbit(mono)) != 0).mean())
                        if len(mono) > 1
                        else 0.0
                    )
                    feats["decode_error"].append(None)
                except Exception as exc:  # noqa: BLE001 — poisoned payloads become rows
                    for name in names[:-1]:
                        feats[name].append(None)
                    feats["decode_error"].append(f"{type(exc).__name__}: {exc}")
            out = pdf.iloc[:, :n_key].copy()
            for name, vals in feats.items():
                out[name] = vals
            yield out

    return df.select(*key_cols, F.col(payload_col)).mapInPandas(compute, schema)


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("container", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("timescale", T.LongType()),
        T.StructField("top_boxes", T.ArrayType(T.StringType())),
        T.StructField("parse_error", T.StringType()),
    ]
)


def parse_video_metadata(payload: bytes) -> dict:
    """Container-level metadata WITHOUT a codec: a minimal ISO-BMFF (MP4)
    box walk — top-level box types, ftyp major brand, and duration from
    moov/mvhd (version 0 and 1 layouts). Matroska/WebM is identified by
    magic only. Frame DECODE (sample_video_frames) genuinely needs a codec
    and stays stubbed."""
    raw = bytes(payload)
    if raw[:4] == b"\x1a\x45\xdf\xa3":
        return {"container": "matroska", "brand": None, "duration_sec": None,
                "timescale": None, "top_boxes": []}
    boxes, brand, dur, ts = [], None, None, None
    off, n = 0, len(raw)
    while off + 8 <= n:
        size = int.from_bytes(raw[off : off + 4], "big")
        btype = raw[off + 4 : off + 8].decode("latin1")
        if size == 1:  # 64-bit largesize
            if off + 16 > n:
                break
            size = int.from_bytes(raw[off + 8 : off + 16], "big")
        if size < 8 or off + size > n:
            break
        boxes.append(btype)
        if btype == "ftyp":
            brand = raw[off + 8 : off + 12].decode("latin1")
        if btype == "moov":
            moov = raw[off + 8 : off + size]
            moff = 0
            while moff + 8 <= len(moov):
                msize = int.from_bytes(moov[moff : moff + 4], "big")
                mtype = moov[moff + 4 : moff + 8]
                if msize < 8 or moff + msize > len(moov):
                    break
                if mtype == b"mvhd":
                    body = moov[moff + 8 : moff + msize]
                    ver = body[0]
                    if ver == 1:
                        ts = int.from_bytes(body[20:24], "big")
                        dur = int.from_bytes(body[24:32], "big")
                    else:
                        ts = int.from_bytes(body[12:16], "big")
                        dur = int.from_bytes(body[16:20], "big")
                    break
                moff += msize
        off += size
    if not boxes:
        raise ValueError("not an ISO-BMFF or Matroska payload")
    return {
        "container": "mp4",
        "brand": brand,
        "duration_sec": (dur / ts) if (dur is not None and ts) else None,
        "timescale": ts,
        "top_boxes": boxes,
    }


def extract_video_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Container metadata per video payload — real MP4 box walk, no codec
    needed; unparseable payloads surface parse_error as a column."""
    schema = T.StructType(
        [df.schema[c] for c in key_cols] + list(VIDEO_META_SCHEMA.fields)
    )
    n_key = len(key_cols)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in VIDEO_META_SCHEMA]
        for pdf in batches:
            feats = {name: [] for name in names}
            for p in pdf.iloc[:, n_key]:
                try:
                    meta = parse_video_metadata(bytes(p) if p is not None else b"")
                    for name in names[:-1]:
                        feats[name].append(meta[name])
                    feats["parse_error"].append(None)
                except Exception as exc:  # noqa: BLE001
                    for name in names[:-1]:
                        feats[name].append(None)
                    feats["parse_error"].append(f"{type(exc).__name__}: {exc}")
            out = pdf.iloc[:, :n_key].copy()
            for name, vals in feats.items():
                out[name] = vals
            yield out

    return df.select(*key_cols, F.col(payload_col)).mapInPandas(compute, schema)


def sample_video_frames(payload: bytes, every_n: int = 30) -> "np.ndarray":
    """Frame sampling STUB: decoding video frames requires a codec library
    (ffmpeg/pyav) that this container doesn't have. The Spark-side plumbing
    for frame pipelines is `extract_video_metadata` + a mapInPandas of this
    shape; swap this function for a real decoder in deployment."""
    raise NotImplementedError(
        "video frame decode requires a codec library (ffmpeg/pyav)"
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("payload_resized", T.BinaryType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    method: str = "bilinear",
    payload_col: str = "payload",
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """decode → resize → re-encode per image payload, all real in this
    container for PNG, baseline JPEG, GIF, and lossless WebP (pure
    stdlib/numpy codecs + vectorized resampling, `kernels/imageops.py`);
    undecodable payloads (e.g. lossy VP8) surface decode_error and a NULL
    payload instead of failing the batch.

    Output: key cols + (payload_resized PNG bytes, height, width,
    decode_error)."""
    from ..kernels.imageops import resize_bilinear, resize_nearest
    from ..kernels.png import encode_png

    resample = {"bilinear": resize_bilinear, "nearest": resize_nearest}[method]
    schema = T.StructType(
        [df.schema[c] for c in key_cols] + list(RESIZE_SCHEMA.fields)
    )
    n_key = len(key_cols)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, errs = [], []
            for p in pdf.iloc[:, n_key]:
                try:
                    img = decode_image(bytes(p) if p is not None else b"")
                    payloads.append(encode_png(resample(img, height, width)))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001
                    payloads.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            out = pdf.iloc[:, :n_key].copy()
            out["payload_resized"] = payloads
            out["height"] = height
            out["width"] = width
            out["decode_error"] = errs
            yield out

    return df.select(*key_cols, F.col(payload_col)).mapInPandas(compute, schema)
