"""Baseline JPEG codec (`kernels/jpeg.py`): layered verification without a
reference codec in the container.

Layer 1 — transform: the DCT matrix is orthogonal (IDCT(DCT(x)) == x to
float precision), so the only loss in the pipeline is quantization.
Layer 2 — entropy coding, BIT-EXACT: `decode_jpeg_blocks` must return
exactly the quantized coefficients an independent `fdct_quant` of the
source computes — pins the Huffman tables, bit packing, byte stuffing,
restart handling, and DC prediction with zero tolerance.
Layer 3 — full decode: roundtrip within quantization-derived bounds
(exact-ish at quality 100 where every quant step is 1), across 4:4:4,
4:2:0, grayscale, restart intervals, odd sizes, and hypothesis-fuzzed
random images.
"""
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from finchspark.kernels.jpeg import (
    _A,
    _quality_tables,
    decode_jpeg,
    decode_jpeg_blocks,
    encode_jpeg,
    fdct_quant,
)


def test_dct_matrix_orthogonal():
    assert np.allclose(_A @ _A.T, np.eye(8), atol=1e-12)
    x = np.random.default_rng(0).uniform(-128, 127, (8, 8))
    assert np.abs(_A.T @ (_A @ x @ _A.T) @ _A - x).max() < 1e-10


def _rgb_planes(img):
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = 128 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
    cr = 128 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
    return y, cb, cr


@pytest.mark.parametrize("restart", [0, 2])
def test_entropy_layer_bit_exact(restart):
    """Decoded quantized coefficients == an independently computed
    FDCT+quantize of the source planes (4:4:4 so no resampling intervenes),
    with and without restart markers."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (21, 34, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=80, restart_interval=restart)
    _, planes = decode_jpeg_blocks(data)
    ql, qc = _quality_tables(80)
    for p, qt, got in zip(_rgb_planes(img), [ql, qc, qc], planes):
        want = fdct_quant(p, qt)
        assert np.array_equal(want, got[: want.shape[0], : want.shape[1]])


def test_roundtrip_quality_100_near_exact():
    """All quant steps are 1 at quality 100: the only loss is coefficient
    rounding (<=0.5 each) + colorspace rounding — max error is tiny even on
    pure noise."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
    g = rng.integers(0, 256, (13, 29), dtype=np.uint8)
    outg = decode_jpeg(encode_jpeg(g, quality=100))
    assert outg.shape == g.shape
    assert np.abs(outg.astype(int) - g.astype(int)).max() <= 2


def test_roundtrip_subsampled_and_restarts_smooth():
    h, w = 37, 53
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], -1
    ).astype(np.uint8)
    for q, sub, ri in [(95, False, 0), (75, True, 0), (90, False, 3), (85, True, 2)]:
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub, restart_interval=ri))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_uniform_image_exact():
    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=50, subsample=True))
    assert np.abs(out.astype(int) - 77).max() <= 2


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 33),
    st.integers(1, 33),
    st.booleans(),
    st.booleans(),
    st.integers(0, 3),
    st.integers(0, 2**32 - 1),
)
def test_fuzz_roundtrip(h, w, gray, sub, restart, seed):
    rng = np.random.default_rng(seed)
    if gray:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100, restart_interval=restart))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    else:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = encode_jpeg(
            img, quality=100, subsample=sub, restart_interval=restart
        )
        out = decode_jpeg(data)
        assert out.shape == img.shape
        if not sub:  # 4:2:0 chroma is genuinely lossy on noise
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_progressive_rejected_honestly():
    """SOF2 (progressive) must raise NotImplementedError, not mis-decode."""
    img = np.full((8, 8), 50, dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=90))
    i = data.find(b"\xff\xc0")
    assert i > 0
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(data))


def test_truncated_and_garbage_fail_loudly():
    img = np.full((8, 8), 50, dtype=np.uint8)
    data = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff" + bytes(32))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


def test_16bit_dqt_precision_parsed():
    """A DQT written with Pq=1 (16-bit entries) parses and decodes: rewrite
    the encoder's 8-bit luma table as 16-bit in-place."""
    img = np.full((8, 8), 90, dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=90))
    i = data.find(b"\xff\xdb")
    length = struct.unpack(">H", data[i + 2 : i + 4])[0]
    assert length == 67
    q8 = bytes(data[i + 5 : i + 69])
    wide = b"".join(struct.pack(">H", b) for b in q8)
    new_seg = struct.pack(">H", 2 + 1 + 128) + bytes([0x10]) + wide
    data[i + 2 : i + 4 + 65] = new_seg
    out = decode_jpeg(bytes(data))
    assert np.abs(out.astype(int) - 90).max() <= 2


def test_fill_bytes_and_tem_marker_tolerated():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker,
    and TEM (0xFF01) is a standalone marker with no length-bearing body —
    both spec-legal streams must parse (round-5 ADVICE)."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = encode_jpeg(img, quality=95)
    want = decode_jpeg(data)
    i = data.find(b"\xff\xdb")  # first DQT
    assert i > 0
    padded = data[:i] + b"\xff\xff\xff" + data[i:]  # fill bytes before DQT
    assert (decode_jpeg(padded) == want).all()
    with_tem = data[:i] + b"\xff\x01" + data[i:]  # standalone TEM marker
    assert (decode_jpeg(with_tem) == want).all()
    both = data[:i] + b"\xff\xff\x01\xff\xff" + data[i:]
    assert (decode_jpeg(both) == want).all()
