"""Pure-stdlib PNG codec (zlib + numpy): the decode path for multimodal
image columns.

No codec libraries exist in this container, but PNG needs none: a PNG is
zlib-deflated scanlines, each prefixed by one of five filter bytes
(RFC 2083 §6). Decoding is therefore `zlib.decompress` + filter
reconstruction, which this module implements with numpy:

- filters 0 (None) and 2 (Up) are whole-row vectorized;
- filter 1 (Sub) is a per-channel-lane `np.add.accumulate` with uint8
  wraparound (prefix sums mod 256 ARE the reconstruction);
- filters 3 (Average) and 4 (Paeth) depend on the reconstructed left
  neighbor, so they walk pixels left-to-right with numpy ops across the
  channel lanes (width iterations per row, not per-byte Python).

Scope: 8-bit depth, color types 0/2/3/4/6, non-interlaced — the common
web-corpus case. Other depths/interlacing raise NotImplementedError (decode
completeness is a codec-library job in a real deployment; this kernel makes
the multimodal decode column first-class rather than a stub).

`encode_png` (filter type selectable) exists so tests can round-trip every
filter path without fixtures.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(body) != length or len(crc) != 4:
            raise ValueError("truncated PNG chunk")
        if struct.unpack(">I", crc)[0] != zlib.crc32(ctype + body) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND chunk")


def _reconstruct(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    if len(raw) != height * (1 + stride):
        raise ValueError("decompressed size mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
    ftypes = arr[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(ftypes[y])
        cur = arr[y, 1:]
        prior = out[y - 1] if y else zero_row
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: prefix sums mod 256 per channel lane
            for c in range(bpp):
                out[y, c::bpp] = np.add.accumulate(cur[c::bpp], dtype=np.uint8)
        elif f == 2:  # Up
            out[y] = cur + prior  # uint8 wraparound is the mod-256 add
        elif f == 3:  # Average: left-dependent, walk pixels across lanes
            row = out[y]
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(0, stride, bpp):
                up = prior[x : x + bpp].astype(np.uint16)
                row[x : x + bpp] = cur[x : x + bpp] + ((left + up) >> 1).astype(
                    np.uint8
                )
                left = row[x : x + bpp].astype(np.uint16)
        elif f == 4:  # Paeth
            row = out[y]
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x in range(0, stride, bpp):
                up = prior[x : x + bpp].astype(np.int32)
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                )
                row[x : x + bpp] = cur[x : x + bpp] + pred.astype(np.uint8)
                ul = up
                left = row[x : x + bpp].astype(np.int32)
        else:
            raise ValueError(f"unknown PNG filter type {f}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Palette images (color type 3) are expanded through PLTE to RGB.
    """
    if not data.startswith(_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("invalid compression/filter method")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNGs supported (depth={depth}, "
            f"interlace={interlace})"
        )
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid color type {color_type}")
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    out = _reconstruct(raw, height, stride, bpp).reshape(height, width, bpp)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE chunk")
        out = palette[out[:, :, 0]]
    return out


def _filter_scanlines(img: np.ndarray, filter_type: int, bpp: int) -> bytes:
    h, stride = img.shape
    bpp_img = img
    lines = bytearray()
    prior = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = bpp_img[y].astype(np.int16)
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prior
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            filt = cur - ((left + prior) >> 1)
        elif filter_type == 4:
            left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int16), prior[:-bpp]])
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul))
            filt = cur - pred
        else:
            raise ValueError(filter_type)
        lines.append(filter_type)
        lines.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prior = cur
    return bytes(lines)



def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w) or (h, w, c) array → PNG bytes using one filter type for
    every scanline (test/fixture path; a production encoder picks per-row)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = _filter_scanlines(img.reshape(h, w * c), filter_type, c)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
