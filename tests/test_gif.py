"""GIF codec (`kernels/gif.py`): LZW layer fuzzed standalone, whole-file
roundtrips incl. interlace, hand-built transparency / animation /
disposal cases, loud failures on malformed streams."""
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from finchspark.kernels.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


@settings(max_examples=150, deadline=None)
@given(st.integers(2, 8), st.data())
def test_lzw_roundtrip_fuzz(mcs, data):
    seq = data.draw(st.lists(st.integers(0, (1 << mcs) - 1), max_size=1200))
    assert _lzw_decode(mcs, _lzw_encode(mcs, seq)) == seq


def test_lzw_kwkwk_case():
    # "abababab..." forces the code==len(table) (KwKwK) path
    seq = [0, 1] * 200
    assert _lzw_decode(2, _lzw_encode(2, seq)) == seq


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 32),
    st.integers(1, 32),
    st.integers(1, 16),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_gif_roundtrip_fuzz(h, w, ncol, interlace, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, (h, w))]
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert out.shape == img.shape and (out == img).all()


def test_gif_256_colors_width_growth():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    img = np.stack([g, g, g], -1)
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_transparency_returns_rgba():
    """Hand-built GCE with a transparent index: un-painted pixels get
    alpha 0."""
    img = np.array([[[255, 0, 0], [0, 255, 0]]], np.uint8)
    data = bytearray(encode_gif(img))
    # indices in the (sorted-unique) palette: green=(0,255,0) sorts first
    # insert a graphic-control extension before the image descriptor (0x2C)
    i = data.index(0x2C, 6)
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])  # transparent idx 0
    data[i:i] = gce
    out = decode_gif(bytes(data))
    assert out.shape == (1, 2, 4)
    # exactly one pixel transparent (the one whose palette index is 0)
    assert sorted(out[0, :, 3].tolist()) == [0, 255]


def test_gif_animation_composite_and_disposal():
    """Two frames: frame 2 is a 1x1 patch over frame 1; with
    restore-to-background disposal on frame 1 the patch region resets."""
    base = np.array([[[10, 10, 10], [20, 20, 20]]], np.uint8)
    patch = np.array([[[200, 0, 0]]], np.uint8)
    f1 = encode_gif(base)
    f2 = encode_gif(patch)
    # splice: header+LSD+palette of f1, image block of f1, image block of
    # f2 re-targeted at (left=1, top=0), trailer
    def image_block(b):
        i = b.index(0x2C, 6)
        return b[i:-1]  # up to (not incl.) trailer

    hdr1 = f1[: f1.index(0x2C, 6)]
    # frame 2 must carry its own palette as a LOCAL color table (its
    # indices refer to f2's palette, not f1's global one)
    pal_bits2 = (f2[10] & 7) + 1
    pal2 = f2[13 : 13 + 3 * (1 << pal_bits2)]
    raw2 = image_block(f2)
    desc2 = bytearray(raw2[:10])
    struct.pack_into("<HH", desc2, 1, 1, 0)  # left=1, top=0
    desc2[9] |= 0x80 | (pal_bits2 - 1)  # local color table flag + size
    blk2 = bytes(desc2) + pal2 + raw2[10:]
    anim = hdr1 + image_block(f1) + blk2 + b"\x3b"
    frames, screen = decode_gif_frames(anim)
    assert screen == (1, 2)
    assert len(frames) == 2
    assert (frames[0]["rgb"] == base).all()
    want2 = base.copy()
    want2[0, 1] = (200, 0, 0)
    assert (frames[1]["rgb"] == want2).all()


def test_gif_malformed_fails_loudly():
    img = np.array([[[1, 2, 3]]], np.uint8)
    data = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + bytes(20))
    with pytest.raises((ValueError, IndexError, struct.error)):
        decode_gif(data[: len(data) - 4])  # truncated mid-stream
    rng = np.random.default_rng(9)
    many = rng.integers(0, 256, (25, 25, 3), dtype=np.uint8)  # ~625 colors
    with pytest.raises(ValueError, match="> 256"):
        encode_gif(many)


def test_gif_through_decode_image_and_features(spark):
    from finchspark.operators.multimodal import extract_image_features

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 5, (7, 9))]
    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(img)))], "doc_id long, payload binary"
    )
    r = extract_image_features(df).collect()[0]
    assert (r["height"], r["width"], r["channels"]) == (7, 9, 3)
    assert r["decode_error"] is None
    assert abs(r["mean_pixel"] - img.astype(float).mean()) < 1e-9


def _descriptor_offset(data: bytes) -> int:
    """Offset of the 0x2C image descriptor, walked structurally (searching
    bytes would false-positive inside the palette)."""
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 7))
    while data[pos] == 0x21:  # extensions: label + sub-blocks
        pos += 2
        while data[pos] != 0:
            pos += 1 + data[pos]
        pos += 1
    assert data[pos] == 0x2C
    return pos


def test_frame_rect_past_screen_is_value_error():
    """A descriptor whose rect extends past the logical screen must raise a
    ValueError up front, not a raw numpy IndexError from the paint slice
    (round-5 ADVICE)."""
    img = np.zeros((4, 4, 3), np.uint8)
    data = bytearray(encode_gif(img))
    pos = _descriptor_offset(bytes(data))
    struct.pack_into("<H", data, pos + 1, 2)  # left=2, so left+iw=6 > w=4
    with pytest.raises(ValueError, match="exceeds logical screen"):
        decode_gif(bytes(data))
    data = bytearray(encode_gif(img))
    struct.pack_into("<H", data, pos + 3, 3)  # top=3, so top+ih=7 > h=4
    with pytest.raises(ValueError, match="exceeds logical screen"):
        decode_gif(bytes(data))


def test_lzw_bomb_capped_by_max_pixels():
    """A tiny crafted payload whose KwKwK chain balloons quadratically must
    stop expanding at max_pixels instead of materializing the whole bomb
    (round-5 ADVICE)."""
    mcs = 2
    clear, width0 = 1 << mcs, mcs + 1

    def pack(codes):
        # mirrors the decoder's table/width bookkeeping exactly: the table
        # grows one entry per code starting from the SECOND code after a
        # clear, and the width bumps when the table fills the current width
        acc = nbits = 0
        out = bytearray()
        width = width0
        table_len = clear + 2
        have_prev = False
        for c in codes:
            acc |= c << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
            if c == clear:
                width, table_len, have_prev = width0, clear + 2, False
            else:
                if have_prev and table_len < 4096:
                    table_len += 1
                if table_len == (1 << width) and width < 12:
                    width += 1
                have_prev = True
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    # clear, 0, then 400x the KwKwK code (== len(table)): entry k has
    # length k+1, so full expansion is ~400^2/2 = 80k pixels from ~600 bytes
    codes = [clear, 0]
    table_len = clear + 2
    for _ in range(400):
        codes.append(table_len)
        table_len += 1
    payload = pack(codes)
    full = _lzw_decode(mcs, payload)
    assert len(full) > 80_000
    capped = _lzw_decode(mcs, payload, max_pixels=1_000)
    assert 1_000 <= len(capped) < 1_100  # stops within one entry of the cap
