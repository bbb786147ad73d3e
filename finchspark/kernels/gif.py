"""Pure-stdlib GIF codec: the decode path for GIF image payloads.

Written from the public GIF89a specification (GIF87a accepted): logical
screen descriptor, global/local color tables, image descriptors,
graphic-control extensions (transparency), interlacing, and variable-width
LSB-first LZW decompression (clear/EOI codes, 12-bit dictionary cap,
deferred-clear tolerated). Animation is supported at the container level:
`decode_gif_frames` yields every frame composited per the disposal rules'
common cases (replace/keep); `decode_gif` returns the first composited
frame as (h, w, 3) uint8 RGB (or (h, w, 4) RGBA when a frame declares a
transparent index).

The per-code LZW loop is necessarily sequential Python (each code's width
depends on the dictionary size); pixel assembly, palette lookup,
de-interlacing, and compositing are numpy. Fixture-scale honest; at corpus
scale image decode belongs in a codec library — the point here is that the
engine's multimodal decode column is REAL for the three dominant web
formats (PNG, JPEG, GIF) with WebP the remaining honest stub.

`encode_gif` (single frame, global palette, optional interlace) exists so
tests round-trip without binary fixtures.
"""
from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(
    min_code_size: int, data: bytes, max_pixels: int | None = None
) -> list[int]:
    """Variable-width LSB-first LZW per GIF89a appendix F.

    `max_pixels` caps the output length (the frame's iw*ih): decoding stops
    as soon as enough indices are produced, so a small crafted payload whose
    dictionary entries balloon (decompression bomb) cannot expand past the
    frame's own pixel budget before the size check."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dict_init = [[i] for i in range(clear)] + [None, None]
    table = list(dict_init)
    out: list[int] = []
    prev: list[int] | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return out  # data exhausted without EOI: tolerate (common)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(dict_init)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError("LZW: first code not in initial table")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"LZW: code {code} out of range")
        out.extend(entry)
        if max_pixels is not None and len(out) >= max_pixels:
            return out
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry


def _lzw_encode(min_code_size: int, indices) -> bytes:
    """LZW compressor emitting clear at start and EOI at end."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    seq: tuple[int, ...] = ()
    for px in indices:
        cand = seq + (int(px),)
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (int(px),)
    if seq:
        emit(table[seq])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(data: bytes):
    """-> (frames, screen): frames = list of dicts with keys
    ``rgb`` (h, w, 3 uint8, composited onto the accumulated canvas),
    ``alpha`` (h, w uint8, 0 where the CURRENT frame left the canvas
    untouched and no prior frame painted it), ``delay_cs``; screen =
    (height, width)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        global_pal = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(
            n, 3
        )
        pos += 3 * n

    canvas = np.zeros((h, w, 3), np.uint8)
    painted = np.zeros((h, w), bool)
    frames = []
    transparent = None
    delay_cs = 0
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                gpacked, delay_cs = struct.unpack_from("<BH", data, pos + 1)
                t_idx = data[pos + 4]
                transparent = t_idx if gpacked & 1 else None
                disposal = (gpacked >> 2) & 7
                pos += 1 + size
            else:  # comment/app/plain-text: skip sub-blocks
                pass
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos - 1}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        # reject rects past the logical screen up front: numpy would
        # silently clip the canvas slice to a smaller region than the
        # (ih, iw) mask and raise a raw IndexError deep in the paint
        if left + iw > w or top + ih > h:
            raise ValueError(
                f"GIF frame rect {iw}x{ih}+{left}+{top} exceeds logical "
                f"screen {w}x{h}"
            )
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            pal = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code, bytes(lzw), max_pixels=iw * ih)
        if len(idx) < iw * ih:
            raise ValueError(
                f"GIF frame decoded {len(idx)} pixels, needs {iw * ih}"
            )
        grid = np.array(idx[: iw * ih], np.int32).reshape(ih, iw)
        if ipacked & 0x40:
            grid = _deinterlace(grid)
        if grid.max(initial=0) >= len(pal):
            raise ValueError("GIF pixel index outside color table")
        rgbs = pal[grid]
        opaque = (
            np.ones((ih, iw), bool)
            if transparent is None
            else grid != transparent
        )
        prev_canvas = canvas.copy()
        prev_painted = painted.copy()
        region = canvas[top : top + ih, left : left + iw]
        region[opaque] = rgbs[opaque]
        painted[top : top + ih, left : left + iw] |= opaque
        frames.append(
            {
                "rgb": canvas.copy(),
                "alpha": (painted * np.uint8(255)),
                "delay_cs": delay_cs,
            }
        )
        if disposal == 3:  # restore-to-previous
            canvas = prev_canvas
            painted = prev_painted
        elif disposal == 2:  # restore-to-background: clear the frame rect
            canvas[top : top + ih, left : left + iw] = 0
            painted[top : top + ih, left : left + iw] = False
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, (h, w)


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame: (h, w, 3) uint8 RGB, or (h, w, 4) RGBA when
    any pixel of the first frame is un-painted (transparent)."""
    frames, _ = decode_gif_frames(data)
    f = frames[0]
    if (f["alpha"] == 255).all():
        return f["rgb"]
    return np.dstack([f["rgb"], f["alpha"]])


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 (h, w, 3) RGB with <=256 distinct colors -> single-frame
    GIF89a with a global palette. Test-fixture generator."""
    img = np.asarray(img, np.uint8)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    pal, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"{len(pal)} distinct colors > 256; quantize first")
    pal_bits = max(int(np.ceil(np.log2(max(len(pal), 2)))), 1)
    pal_n = 1 << pal_bits
    pal_full = np.zeros((pal_n, 3), np.uint8)
    pal_full[: len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal_full.tobytes()
    ipacked = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    grid = inverse.reshape(h, w)
    if interlace:
        order = np.concatenate(
            [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
        )
        grid = grid[order]
    min_code = max(pal_bits, 2)
    out.append(min_code)
    lzw = _lzw_encode(min_code, grid.ravel())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
