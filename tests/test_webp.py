"""Lossless WebP (VP8L) codec tests.

Two layers: self-contained round-trips through the fixture encoder (always
run), and DIFFERENTIAL validation against the system libwebp when present —
real-encoder streams decoded byte-exactly, every predictor mode forced
through both decoders, and the 120-entry distance-map table re-derived
empirically from libwebp's behavior (the module's copy documents this
derivation)."""
import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from finchspark.kernels.webp import (
    _DIST_MAP,
    decode_webp,
    encode_webp_lossless,
    length_prefix,
)


def _load_libwebp():
    for cand in (
        ctypes.util.find_library("webp"),
        "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
        "libwebp.so.7",
    ):
        if not cand:
            continue
        try:
            lib = ctypes.CDLL(cand)
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            return lib
        except OSError:
            continue
    return None


_LIB = _load_libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None, reason="no system libwebp")


def _ref_decode(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    out = (
        np.ctypeslib.as_array(p, (w.value * h.value * 4,))
        .copy()
        .reshape(h.value, w.value, 4)
    )
    _LIB.WebPFree(p)
    return out


def _ref_encode(rgba: np.ndarray) -> bytes:
    h, w, _ = rgba.shape
    buf = ctypes.POINTER(ctypes.c_ubyte)()
    n = _LIB.WebPEncodeLosslessRGBA(
        np.ascontiguousarray(rgba, np.uint8).tobytes(), w, h, w * 4,
        ctypes.byref(buf),
    )
    assert n > 0
    out = bytes(bytearray(buf[i] for i in range(n)))
    _LIB.WebPFree(buf)
    return out


def _img(shape, seed=0):
    rng = np.random.default_rng(seed)
    out = rng.integers(0, 256, (*shape, 4), dtype=np.uint8)
    out[..., 3] |= 1  # avoid encoder transparent-pixel squash ambiguity
    return out


# ---------------------------------------------------------------- self tests
@pytest.mark.parametrize("shape", [(1, 1), (3, 7), (8, 8), (13, 5), (20, 33)])
def test_roundtrip_literal(shape):
    img = _img(shape, seed=shape[0])
    assert (decode_webp(encode_webp_lossless(img)) == img).all()


def test_roundtrip_subtract_green():
    img = _img((9, 11), 3)
    assert (decode_webp(encode_webp_lossless(img, subtract_green=True)) == img).all()


@pytest.mark.parametrize("mode", range(14))
def test_roundtrip_every_predictor_mode(mode):
    img = _img((9, 11), 4)
    data = encode_webp_lossless(img, predictor_mode=mode)
    assert (decode_webp(data) == img).all()


@pytest.mark.parametrize("cte", [(0, 0, 0), (10, -20, 33), (-128, 127, -1)])
def test_roundtrip_cross_color(cte):
    img = _img((9, 11), 5)
    assert (decode_webp(encode_webp_lossless(img, color_cte=cte)) == img).all()


@pytest.mark.parametrize("ncol", [1, 2, 3, 4, 9, 16, 17, 200])
def test_roundtrip_palette_bundling(ncol):
    """Every pixel-bundling width: 8/4/2/1 indices per coded pixel."""
    rng = np.random.default_rng(ncol)
    cols = np.unique(
        rng.integers(0, 256, (ncol, 4), np.uint8) | np.array([0, 0, 0, 1], np.uint8),
        axis=0,
    )
    img = cols[rng.integers(0, len(cols), (10, 13))]
    assert (decode_webp(encode_webp_lossless(img, palette=True)) == img).all()


def test_roundtrip_backrefs_mapped_and_plain():
    img = _img((8, 17), 6)
    flat = img.reshape(-1, 4)
    for pos, length, code in [(30, 5, 130), (50, 10, 121), (120, 3, 1), (100, 4, 17)]:
        data = encode_webp_lossless(img, backrefs={pos: (length, code)})
        got = decode_webp(data).reshape(-1, 4)
        # the backref overwrites [pos, pos+length) with the mapped source
        if code > 120:
            dist = code - 120
        else:
            dx, dy = _DIST_MAP[code - 1]
            dist = max(1, dy * 17 + dx)
        want = flat.copy()
        for i in range(length):
            want[pos + i] = want[pos + i - dist]
        assert (got == want).all(), (pos, length, code)


def test_invalid_backref_rejected():
    img = _img((8, 17), 7)
    # code 120 -> (8,7) -> distance 127 > position 120: before image start
    data = encode_webp_lossless(img, backrefs={120: (7, 120)})
    with pytest.raises(ValueError, match="backward reference"):
        decode_webp(data)


def test_lossy_vp8_honestly_stubbed():
    fake = b"RIFF" + (12).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (0).to_bytes(4, "little")
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(fake)


def test_garbage_fails_loudly():
    with pytest.raises(ValueError):
        decode_webp(b"not a webp")
    img = _img((6, 6), 8)
    data = encode_webp_lossless(img)
    with pytest.raises(ValueError):
        decode_webp(data[: len(data) - 6])  # truncated mid-stream
    with pytest.raises((ValueError, NotImplementedError)):
        decode_webp(data[:12] + b"VP8L" + (40).to_bytes(4, "little") + bytes(40))


def test_decode_image_dispatch():
    from finchspark.operators.multimodal import decode_image

    img = _img((5, 9), 9)
    out = decode_image(encode_webp_lossless(img))
    assert out.shape == (5, 9, 4)
    assert (out == img).all()


# -------------------------------------------------------- differential tests
@needs_libwebp
def test_distance_map_matches_libwebp():
    """Re-derive the 120-entry distance map from libwebp's decoder: one
    crafted single-backref stream per code, observing which pixel each
    copies. This is the provenance check for the module's table."""
    W, H = 17, 12
    P = 8 * W + 8
    base = np.zeros((H, W, 4), np.uint8)
    idx = np.arange(H * W, dtype=np.uint32)
    base.reshape(-1, 4)[:, 0] = idx & 0xFF
    base.reshape(-1, 4)[:, 1] = (idx >> 8) & 0xFF
    base.reshape(-1, 4)[:, 3] = 255
    derived = []
    for code in range(1, 121):
        data = encode_webp_lossless(base, backrefs={P: (1, code)})
        got = _ref_decode(data)
        assert got is not None, f"libwebp rejected stream for code {code}"
        v = got.reshape(-1, 4)[P]
        d = P - (int(v[0]) | (int(v[1]) << 8))
        y = (d + 8) // W
        derived.append((d - W * y, y))
    assert derived == _DIST_MAP


@needs_libwebp
def test_decoder_matches_libwebp_on_real_streams():
    """Streams produced by the REAL encoder (which picks transforms, color
    cache, meta codes, and LZ77 on its own) decode byte-exactly."""
    rng = np.random.default_rng(42)
    imgs = []
    for h, w in [(16, 16), (31, 17), (64, 48)]:
        yy, xx = np.mgrid[0:h, 0:w]
        imgs.append(_img((h, w), int(h * w)))  # noise
        imgs.append(np.full((h, w, 4), 77, np.uint8))  # flat
        imgs.append(
            np.stack(
                [(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256, np.full((h, w), 255)],
                -1,
            ).astype(np.uint8)
        )  # gradient
        pal = rng.integers(0, 256, (5, 4), np.uint8) | [0, 0, 0, 1]
        imgs.append(pal[rng.integers(0, 5, (h, w))])  # palette-ish
        base = rng.integers(0, 256, (h // 4 + 1, w // 4 + 1, 4), np.uint8)
        photo = (
            np.kron(base, np.ones((4, 4, 1), np.uint8))[:h, :w]
            + rng.integers(0, 8, (h, w, 4), np.uint8)
        ).astype(np.uint8)
        photo[..., 3] |= 1
        imgs.append(photo)  # photo-ish
    for i, img in enumerate(imgs):
        data = _ref_encode(img)
        want = _ref_decode(data)
        got = decode_webp(data)
        assert (got == want).all(), f"image family {i} diverged"


@needs_libwebp
@pytest.mark.parametrize("mode", range(14))
def test_forced_predictor_mode_matches_libwebp(mode):
    img = _img((9, 11), mode)
    data = encode_webp_lossless(img, predictor_mode=mode)
    ref = _ref_decode(data)
    assert ref is not None and (ref == img).all()
    assert (decode_webp(data) == ref).all()


@needs_libwebp
def test_fixture_encoder_accepted_by_libwebp():
    """Every fixture-encoder feature combination parses in libwebp and
    round-trips — the encoder is spec-valid, not merely self-consistent."""
    img = _img((10, 13), 11)
    variants = [
        encode_webp_lossless(img),
        encode_webp_lossless(img, subtract_green=True),
        encode_webp_lossless(img, color_cte=(7, -9, 20)),
        encode_webp_lossless(img, predictor_mode=11),
    ]
    pal = np.unique(img.reshape(-1, 4)[:12], axis=0)
    pimg = pal[np.random.default_rng(0).integers(0, len(pal), (10, 13))]
    variants.append(encode_webp_lossless(pimg, palette=True))
    for i, data in enumerate(variants[:-1]):
        ref = _ref_decode(data)
        assert ref is not None and (ref == img).all(), f"variant {i}"
    ref = _ref_decode(variants[-1])
    assert ref is not None and (ref == pimg).all()
    # the backref variant rewrites pixels by design: libwebp and this
    # decoder must agree on the rewritten image
    data = encode_webp_lossless(img, backrefs={30: (5, 130)})
    ref = _ref_decode(data)
    assert ref is not None and (decode_webp(data) == ref).all()


def test_length_prefix_roundtrip():
    from finchspark.kernels.webp import _BitReader, _prefix_value

    for v in list(range(1, 200)) + [4096, 100000]:
        sym, extra, bits = length_prefix(v)
        br = _BitReader(extra.to_bytes(4, "little"))
        assert _prefix_value(sym, br) == v


def test_webp_through_spark_image_features(spark):
    """The VP8L decoder wired through the Spark multimodal path: decode +
    feature extraction inside the Arrow-batched operator, plus the honest
    lossy-VP8 decode_error capture on the same run."""
    from finchspark.operators.multimodal import extract_image_features

    img = _img((7, 9), 12)
    lossy = b"RIFF" + (12).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (0).to_bytes(4, "little")
    df = spark.createDataFrame(
        [(1, bytearray(encode_webp_lossless(img))), (2, bytearray(lossy))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_image_features(df).collect()}
    ok = rows[1]
    assert (ok["height"], ok["width"], ok["channels"]) == (7, 9, 4)
    assert ok["decode_error"] is None
    assert abs(ok["mean_pixel"] - img.astype(float).mean()) < 1e-9
    assert rows[2]["decode_error"] is not None  # lossy VP8: honest stub


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_corruption_never_hangs_or_balloons(seed):
    """Random truncations and byte corruptions of a valid stream must
    either decode to SOME image or raise ValueError/NotImplementedError —
    never hang, crash the interpreter, or allocate unboundedly (the decoder
    validates dimensions, code completeness, and backref bounds)."""
    rng = np.random.default_rng(seed)
    img = _img((12, 15), 100 + seed)
    data = bytearray(encode_webp_lossless(img, backrefs={40: (6, 121)}))
    for trial in range(60):
        mutated = bytearray(data)
        if trial % 3 == 0:
            mutated = mutated[: int(rng.integers(12, len(data)))]
        else:
            for _ in range(int(rng.integers(1, 4))):
                mutated[int(rng.integers(12, len(mutated)))] = int(rng.integers(256))
        try:
            out = decode_webp(bytes(mutated))
            assert out.nbytes < 50_000_000
        except (ValueError, NotImplementedError, struct.error):
            pass


def test_dimension_bomb_guard():
    """A ~20-byte stream claiming 16383x16383 must be rejected BEFORE the
    ~1 GB pixel buffer is allocated (max_pixels guard)."""
    from finchspark.kernels.webp import _BitWriter

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(16382, 14)
    bw.write(16382, 14)
    bw.write(0, 4)
    payload = bw.tobytes() + bytes(8)
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    data = b"RIFF" + (len(chunk) + 4).to_bytes(4, "little") + b"WEBP" + chunk
    with pytest.raises(ValueError, match="max_pixels"):
        decode_webp(data)
    # an explicit higher cap is the trusted-input escape hatch (the decode
    # itself then fails on the truncated bitstream, not the guard)
    with pytest.raises(ValueError, match="(?!.*max_pixels)"):
        decode_webp(data, max_pixels=1 << 30)
