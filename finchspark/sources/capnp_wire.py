"""Minimal Cap'n Proto wire-format machinery (shared by the .bsk and .msh
codecs — see `bsk.py` for the derivation from the public encoding spec).

Writer: single exactly-sized segment, no far pointers. Reader: multi-segment
with single- and double-word far-pointer landing pads, bounds-checked.
"""
from __future__ import annotations

import struct as _struct
from dataclasses import dataclass

_WORD = 8

# element-size codes (list pointers)
_SZ_BYTE = 2
_SZ_COMPOSITE = 7


class _Seg:
    def __init__(self) -> None:
        self.buf = bytearray()

    def alloc(self, n_words: int) -> int:
        off = len(self.buf) // _WORD
        self.buf.extend(b"\x00" * (n_words * _WORD))
        return off

    def put_u64(self, word_off: int, value: int) -> None:
        _struct.pack_into("<Q", self.buf, word_off * _WORD, value & 0xFFFFFFFFFFFFFFFF)

    def put_bytes(self, word_off: int, data: bytes) -> None:
        self.buf[word_off * _WORD : word_off * _WORD + len(data)] = data


def _struct_ptr(ptr_word: int, target_word: int, data_words: int, ptr_words: int) -> int:
    off = target_word - (ptr_word + 1)
    return ((off & 0x3FFFFFFF) << 2) | (data_words << 32) | (ptr_words << 48)


def _list_ptr(ptr_word: int, target_word: int, elem_size: int, count: int) -> int:
    off = target_word - (ptr_word + 1)
    return 1 | ((off & 0x3FFFFFFF) << 2) | (elem_size << 32) | (count << 35)


def _write_blob(seg: _Seg, ptr_word: int, data: bytes, is_text: bool) -> None:
    if data is None:
        return  # null pointer = absent field
    n = len(data) + (1 if is_text else 0)  # Text includes the NUL
    target = seg.alloc((n + _WORD - 1) // _WORD)
    seg.put_bytes(target, data)
    seg.put_u64(ptr_word, _list_ptr(ptr_word, target, _SZ_BYTE, n))




# --------------------------------------------------------------------------
# reader: multi-segment + far pointers
# --------------------------------------------------------------------------


@dataclass
class _Loc:
    seg: int
    word: int


class _Reader:
    def __init__(self, data: bytes) -> None:
        if len(data) < 8:
            raise ValueError("truncated capnp message")
        (n_minus_1,) = _struct.unpack_from("<I", data, 0)
        n = n_minus_1 + 1
        sizes = _struct.unpack_from(f"<{n}I", data, 4)
        header = 4 * (n + 1)
        header += (-header) % _WORD
        self.segs: list[memoryview] = []
        pos = header
        for s in sizes:
            end = pos + s * _WORD
            if end > len(data):
                raise ValueError("segment table overruns message")
            self.segs.append(memoryview(data)[pos:end])
            pos = end

    def word(self, loc: _Loc) -> int:
        seg = self.segs[loc.seg]
        off = loc.word * _WORD
        if off + 8 > len(seg):
            raise ValueError("pointer outside segment")
        return _struct.unpack_from("<Q", seg, off)[0]

    def _resolve(self, loc: _Loc) -> tuple[_Loc, int]:
        """Follow far pointers; return (pointer location, pointer word)."""
        ptr = self.word(loc)
        if ptr & 3 != 2:
            return loc, ptr
        two_word = (ptr >> 2) & 1
        pad = _Loc((ptr >> 32) & 0xFFFFFFFF, (ptr >> 3) & 0x1FFFFFFF)
        if not two_word:
            return pad, self.word(pad)
        # double-far: pad word 0 = far ptr (B=0) at the object; word 1 = tag
        far2 = self.word(pad)
        if far2 & 7 != 2:
            raise ValueError("malformed double-far landing pad")
        obj = _Loc((far2 >> 32) & 0xFFFFFFFF, (far2 >> 3) & 0x1FFFFFFF)
        tag = self.word(_Loc(pad.seg, pad.word + 1))
        # tag's offset is ignored; synthesize a pointer located just before
        # the object so offset 0 resolves to it
        synth = tag & 0xFFFFFFFF00000003  # keep kind + size bits, offset 0
        return _Loc(obj.seg, obj.word - 1), synth

    def struct_at(self, loc: _Loc) -> tuple[_Loc, int, int] | None:
        ploc, ptr = self._resolve(loc)
        if ptr == 0:
            return None
        if ptr & 3 != 0:
            raise ValueError(f"expected struct pointer, got kind {ptr & 3}")
        off = _sign30((ptr >> 2) & 0x3FFFFFFF)
        data_words = (ptr >> 32) & 0xFFFF
        ptr_words = (ptr >> 48) & 0xFFFF
        return _Loc(ploc.seg, ploc.word + 1 + off), data_words, ptr_words

    def list_at(self, loc: _Loc) -> tuple[_Loc, int, int] | None:
        ploc, ptr = self._resolve(loc)
        if ptr == 0:
            return None
        if ptr & 3 != 1:
            raise ValueError(f"expected list pointer, got kind {ptr & 3}")
        off = _sign30((ptr >> 2) & 0x3FFFFFFF)
        elem_size = (ptr >> 32) & 7
        count = (ptr >> 35) & 0x1FFFFFFF
        return _Loc(ploc.seg, ploc.word + 1 + off), elem_size, count

    def blob(self, loc: _Loc, is_text: bool) -> bytes | None:
        lst = self.list_at(loc)
        if lst is None:
            return None
        start, elem_size, count = lst
        if elem_size != _SZ_BYTE:
            raise ValueError("expected byte list")
        seg = self.segs[start.seg]
        raw = bytes(seg[start.word * _WORD : start.word * _WORD + count])
        return raw[:-1] if (is_text and raw) else raw

    def composite(self, loc: _Loc) -> tuple[list[_Loc], int, int]:
        lst = self.list_at(loc)
        if lst is None:
            return [], 0, 0
        start, elem_size, _total_words = lst
        if elem_size != _SZ_COMPOSITE:
            raise ValueError("expected composite list")
        tag = self.word(start)
        n = (tag >> 2) & 0x3FFFFFFF
        data_words = (tag >> 32) & 0xFFFF
        ptr_words = (tag >> 48) & 0xFFFF
        stride = data_words + ptr_words
        elems = [
            _Loc(start.seg, start.word + 1 + i * stride) for i in range(n)
        ]
        return elems, data_words, ptr_words


def _sign30(v: int) -> int:
    return v - (1 << 30) if v & (1 << 29) else v




# primitive list support (element sizes 4 = 4-byte, 5 = 8-byte)
_SZ_4BYTE = 4
_SZ_8BYTE = 5


def _write_prim_list(seg: _Seg, ptr_word: int, values, elem_bytes: int) -> None:
    n = len(values)
    elem_size = _SZ_4BYTE if elem_bytes == 4 else _SZ_8BYTE
    target = seg.alloc((n * elem_bytes + _WORD - 1) // _WORD)
    fmt = "<%d%s" % (n, "I" if elem_bytes == 4 else "Q")
    seg.put_bytes(target, _struct.pack(fmt, *[int(v) & ((1 << (8 * elem_bytes)) - 1) for v in values]))
    seg.put_u64(ptr_word, _list_ptr(ptr_word, target, elem_size, n))


def _read_prim_list(r: _Reader, loc: _Loc, elem_bytes: int) -> list[int]:
    lst = r.list_at(loc)
    if lst is None:
        return []
    start, elem_size, count = lst
    want = _SZ_4BYTE if elem_bytes == 4 else _SZ_8BYTE
    if count == 0:
        return []
    if elem_size != want:
        raise ValueError(f"expected element size {want}, got {elem_size}")
    seg = r.segs[start.seg]
    off = start.word * _WORD
    fmt = "<%d%s" % (count, "I" if elem_bytes == 4 else "Q")
    return list(_struct.unpack_from(fmt, seg, off))
