"""Pure-numpy baseline JPEG (JFIF/DCT) codec: the decode path for the most
common image format in a web corpus.

Written from the public specs only (ITU-T T.81 / ISO 10918-1 for the DCT,
Huffman entropy coding, and marker structure; JFIF 1.02 for the YCbCr
color model). Scope — the baseline process:

- SOF0 (baseline sequential DCT, 8-bit samples), 1 or 3 components,
  sampling factors 1 or 2 (4:4:4, 4:2:2, 4:2:0);
- Huffman entropy coding with byte stuffing (FF 00) and DRI/RSTn restart
  intervals;
- DQT (8- and 16-bit precision), multiple DHT segments, APPn/COM skipped.

Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical modes
raise NotImplementedError — same honesty rule as `kernels/png.py`.

Decoding is block-vectorized: the per-symbol Huffman walk is necessarily
sequential (each code's length depends on the previous bits), but
everything after entropy decode — de-zigzag, dequantize, the 2-D IDCT
(one `A.T @ blocks @ A` einsum over ALL blocks of a component), level
shift, chroma upsampling, YCbCr→RGB — is whole-array numpy.

`encode_jpeg` (baseline, Annex K tables, optional 4:2:0 and restart
intervals) exists so tests can round-trip every decode path without
binary fixtures; `decode_jpeg_blocks` exposes the quantized coefficients
so the entropy layer is testable BIT-EXACTLY against an independently
computed FDCT+quantize of the source image (the lossy step is then only
the documented quantization, covered by tolerance tests).
"""
from __future__ import annotations

import struct

import numpy as np

# zigzag scan order (T.81 Figure A.6): _ZIGZAG[i] = raster index of the
# i-th zigzag position
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 quantization tables (luminance, chrominance)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[16], values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """A[u, x] = c(u)/2 · cos((2x+1)uπ/16): spatial = A.T @ coeff @ A."""
    u = np.arange(8).reshape(-1, 1)
    x = np.arange(8).reshape(1, -1)
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[0] /= np.sqrt(2)
    return a


_A = _dct_matrix()


def _build_decode_table(bits, values):
    """(length, code) -> symbol per T.81 Annex C code assignment."""
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _build_encode_table(bits, values):
    """symbol -> (code, length)."""
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return lut


class _BitReader:
    """MSB-first reader over an entropy-coded segment with FF00 stuffing
    already removed."""

    def __init__(self, data: bytes):
        self._bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def bit(self) -> int:
        if self.pos >= len(self._bits):
            raise ValueError("entropy data exhausted mid-block")
        v = int(self._bits[self.pos])
        self.pos += 1
        return v

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_symbol(r: _BitReader, lut) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s-bit magnitude to signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


class _Frame:
    def __init__(self):
        self.qt: dict[int, np.ndarray] = {}  # id -> 64 zigzag-order values
        self.huff: dict[tuple[int, int], dict] = {}  # (class, id) -> lut
        self.width = self.height = 0
        self.comps: list[dict] = []  # {id, h, v, tq, td, ta}
        self.restart_interval = 0


def _parse(data: bytes) -> tuple[_Frame, bytes]:
    """Walk markers up to SOS; return (frame, entropy-coded bytes)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    f = _Frame()
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        # (the marker code is the first non-0xFF byte after a run of 0xFF)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        # SOI / RSTn / TEM (0x01): standalone markers, no length-bearing body
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        if length < 2:
            raise ValueError(f"malformed marker 0x{marker:02x} (length {length})")
        body = data[pos + 2 : pos + length]
        if len(body) != length - 2:
            raise ValueError(f"truncated marker segment 0x{marker:02x}")
        pos += length
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq:  # 16-bit precision
                    f.qt[tq] = np.frombuffer(
                        body[i : i + 128], ">u2"
                    ).astype(np.int64)
                    i += 128
                else:
                    f.qt[tq] = np.frombuffer(
                        body[i : i + 64], np.uint8
                    ).astype(np.int64)
                    i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                if len(values) != n:
                    raise ValueError("truncated DHT segment")
                f.huff[(tc, th)] = _build_decode_table(bits, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG")
            f.height, f.width = struct.unpack(">HH", body[1:5])
            n_comp = body[5]
            for c in range(n_comp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                f.comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x}: progressive/"
                "arithmetic/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            (f.restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in f.comps if x["id"] == cs)
                comp["td"], comp["ta"] = tdta >> 4, tdta & 0xF
            return f, data[pos:]
        # APPn / COM / others: skipped
    raise ValueError("no SOS marker found")


def _split_entropy(data: bytes):
    """Split the post-SOS stream into restart segments with FF00 stuffing
    removed; stop at EOI or any non-RST marker."""
    segs = []
    cur = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < len(data) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next marker
            break
    segs.append(bytes(cur))
    return segs


def decode_jpeg_blocks(data: bytes):
    """Entropy-decode only: -> (frame, [per-component (by, bx, 64) int32
    arrays of QUANTIZED coefficients in zigzag order]). The layer a
    bit-exact test can pin without touching the lossy IDCT."""
    f, entropy = _parse(data)
    hmax = max(c["h"] for c in f.comps)
    vmax = max(c["v"] for c in f.comps)
    mcus_x = -(-f.width // (8 * hmax))
    mcus_y = -(-f.height // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
        for c in f.comps
    ]
    segs = _split_entropy(entropy)
    n_mcus = mcus_x * mcus_y
    per_seg = f.restart_interval or n_mcus
    mcu = 0
    for seg in segs:
        if mcu >= n_mcus:
            break
        r = _BitReader(seg)
        pred = [0] * len(f.comps)  # DC predictors reset at each restart
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for ci, c in enumerate(f.comps):
                dc_lut = f.huff[(0, c["td"])]
                ac_lut = f.huff[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, np.int32)
                        s = _decode_symbol(r, dc_lut)
                        pred[ci] += _extend(r.read(s), s)
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(r, ac_lut)
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflows block")
                            blk[k] = _extend(r.read(size), size)
                            k += 1
                        planes[ci][my * c["v"] + by, mx * c["h"] + bx] = blk
            mcu += 1
    if mcu != n_mcus:
        raise ValueError(f"decoded {mcu}/{n_mcus} MCUs before data ran out")
    return f, planes


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 (h, w) grayscale or (h, w, 3) RGB."""
    f, planes = decode_jpeg_blocks(data)
    hmax = max(c["h"] for c in f.comps)
    vmax = max(c["v"] for c in f.comps)
    out_planes = []
    for c, zz in zip(f.comps, planes):
        q = f.qt[c["tq"]]
        by, bx, _ = zz.shape
        deq = (zz.astype(np.float64) * q)  # dequantize in zigzag order
        raster = np.zeros_like(deq)
        raster[:, :, _ZIGZAG] = deq  # de-zigzag
        blocks = raster.reshape(by, bx, 8, 8)
        # one einsum IDCTs every block of the component
        spatial = np.einsum("ux,mnuv,vy->mnxy", _A, blocks, _A)
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        # crop to this component's true extent, then upsample to full size
        ch = -(-f.height * c["v"] // vmax)
        cw = -(-f.width * c["h"] // hmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )[: f.height, : f.width]
        out_planes.append(plane)
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (tests' fixture generator; baseline, Annex K tables)
# ---------------------------------------------------------------------------

def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg's public quality scaling of the Annex K tables."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((code >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        while self._n:
            self.write(1, 1)  # pad with 1-bits per spec


def _mag(v: int) -> tuple[int, int]:
    """signed value -> (size, magnitude bits) per F.1.2.1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(h, w) float plane (already level-shifted NOT required; done here) ->
    (by, bx, 64) quantized zigzag coefficients. Public so tests can compute
    the EXPECTED coefficients independently of the bitstream writer."""
    h, w = plane.shape
    by, bx = -(-h // 8), -(-w // 8)
    padded = np.empty((by * 8, bx * 8), np.float64)
    padded[:h, :w] = plane
    padded[h:] = padded[h - 1 : h]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = (
        padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    )
    coeff = np.einsum("ux,mnxy,vy->mnuv", _A, blocks, _A)
    zz = coeff.reshape(by, bx, 64)[:, :, _ZIGZAG]  # zz[i] = raster[ZIGZAG[i]]
    return np.round(zz / q).astype(np.int32)


def _encode_block(w: _BitWriter, blk, pred: int, dc_enc, ac_enc) -> int:
    diff = int(blk[0]) - pred
    s, bits = _mag(diff)
    code, length = dc_enc[s]
    w.write(code, length)
    if s:
        w.write(bits, s)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]
            w.write(code, length)
            run -= 16
        s, bits = _mag(v)
        code, length = ac_enc[(run << 4) | s]
        w.write(code, length)
        w.write(bits, s)
        run = 0
    if last < 63:
        code, length = ac_enc[0x00]
        w.write(code, length)
    return int(blk[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) or (h, w, 3) RGB -> baseline JFIF bytes. `subsample`
    writes 4:2:0 chroma; `restart_interval` writes DRI + RSTn markers."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        if subsample:
            # pad to even dims, box-average 2x2
            ph, pw = h + (h & 1), w + (w & 1)
            def _down(p):
                pp = np.empty((ph, pw))
                pp[:h, :w] = p
                pp[h:] = pp[h - 1 : h]
                pp[:, w:] = pp[:, w - 1 : w]
                return pp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes = [y, _down(cb), _down(cr)]
        else:
            planes = [y, cb, cr]

    samp = [(2, 2), (1, 1), (1, 1)] if (subsample and not gray) else None
    comps = []
    for i, p in enumerate(planes):
        hv = samp[i] if samp else (1, 1)
        comps.append(
            {
                "id": i + 1,
                "h": hv[0],
                "v": hv[1],
                "tq": 0 if i == 0 else 1,
                "zz": fdct_quant(p, ql if i == 0 else qc),
            }
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, ql),) + (() if gray else ((1, qc),)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(x) for x in q
        )
    # SOF0
    n = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * n, 8, h, w, n)
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    # DHT (luma always; chroma tables only for color)
    tables = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if not gray:
        tables += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for tc, th, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * n, n)
    for c in comps:
        td = ta = 0 if c["id"] == 1 else 1
        if gray:
            td = ta = 0
        out += bytes([c["id"], (td << 4) | ta])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    dc_l, ac_l = _build_encode_table(*_DC_LUMA), _build_encode_table(*_AC_LUMA)
    dc_c, ac_c = _build_encode_table(*_DC_CHROMA), _build_encode_table(*_AC_CHROMA)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    bw = _BitWriter()
    pred = [0] * len(comps)
    rst = 0
    since_restart = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and since_restart == restart_interval:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
            pred = [0] * len(comps)
            since_restart = 0
        my, mx = divmod(mcu, mcus_x)
        for ci, c in enumerate(comps):
            enc_dc = dc_l if ci == 0 or gray else dc_c
            enc_ac = ac_l if ci == 0 or gray else ac_c
            zz = c["zz"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    yy = min(my * c["v"] + by, zz.shape[0] - 1)
                    xx = min(mx * c["h"] + bx, zz.shape[1] - 1)
                    pred[ci] = _encode_block(
                        bw, zz[yy, xx], pred[ci], enc_dc, enc_ac
                    )
        since_restart += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
