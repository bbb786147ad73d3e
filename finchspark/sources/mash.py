"""`.msh` (mash binary sketch) interop — S6, `lib/src/serialization/mash.rs`.

Same hand-rolled Cap'n Proto wire layer as the `.bsk` codec (`capnp_wire`),
specialized to the mash schema (`lib/src/serialization/mash.capnp`). The
reference writes: top-level MinHash params, the NEW `referenceList` (@11)
with per-sketch name/comment/length64/numValidKmers/hashes64/counts32, and
leaves `referenceListOld`/`locusList`/`sequence`/`quality`/`hashes32` null
(`mash.rs:12-58`). Reads fall back to `referenceListOld` and to count=1
when counts32 is absent, reconstructing extra_count = count/2 — exactly the
reference's read semantics (`mash.rs:60-132`).

Field offsets (capnp first-fit over ordinal order; mash ordinals are NOT in
declaration order):

MinHash (data 3 words, 4 ptrs):
  @0 kmerSize u32 w0[0:32)   @1 windowSize u32 w0[32:64)
  @2 minHashesPerWindow u32 w1[0:32)   @3 concatenated bool w1 bit 32
  @4 referenceListOld ptr0   @5 locusList ptr1
  @6 error f32 w2[0:32)      @7 noncanonical bool w1 bit 33
  @8 alphabet Text ptr2      @9 preserveCase bool w1 bit 34
  @10 hashSeed u32 w2[32:64) DEFAULT 42 (stored XOR 42)
  @11 referenceList ptr3

Reference (data 3 words, 7 ptrs):
  @0 sequence ptr0  @1 quality ptr1  @2 length u32 w0[0:32)
  @3 name ptr2      @4 comment ptr3  @5 hashes32 ptr4
  @6 hashes64 ptr5  @7 length64 u64 w1  @8 counts32 ptr6
  @9 numValidKmers u64 w2

ReferenceList / LocusList: 0 data words, 1 pointer.

These offsets are additionally verified against a mechanical first-fit
derivation from the reference's own `mash.capnp` by an independent
schema-driven decoder (`tests/capnp_schema.py`,
`test_msh_decodes_under_reference_schema`) — including the
out-of-declaration-order ordinals and the hashSeed=42 XOR default. Parity
against a mash/finch-written binary remains untestable in-sandbox (no
toolchain/network); residual risk is spec-interpretation only.
"""
from __future__ import annotations

import struct as _struct

import numpy as np

from ..api import Sketch
from ..kernels import KmerCounts, SketchParams
from .capnp_wire import (
    _Loc,
    _Reader,
    _Seg,
    _list_ptr,
    _read_prim_list,
    _struct_ptr,
    _write_blob,
    _write_prim_list,
    _SZ_COMPOSITE,
)

_HASH_SEED_DEFAULT = 42  # schema default — XOR-encoded on the wire


def write_msh_bytes(sketches: list[Sketch]) -> bytes:
    if not sketches:
        raise ValueError("no sketches")
    params = sketches[0].params
    seg = _Seg()
    root_ptr = seg.alloc(1)
    mh = seg.alloc(3 + 4)  # MinHash: 3 data words + 4 pointers
    seg.put_u64(root_ptr, _struct_ptr(root_ptr, mh, 3, 4))

    largest = max((len(s.hashes) for s in sketches), default=1) or 1
    k = params.kmer_length
    seg.put_u64(mh + 0, (k & 0xFFFFFFFF) | ((k & 0xFFFFFFFF) << 32))  # kmerSize, windowSize=k
    # minHashesPerWindow | concatenated=true (bit 32); noncanonical/preserveCase false
    seg.put_u64(mh + 1, (largest & 0xFFFFFFFF) | (1 << 32))
    # error f32 = 0.0 | hashSeed XOR default
    seed_wire = (params.hash_seed & 0xFFFFFFFF) ^ _HASH_SEED_DEFAULT
    seg.put_u64(mh + 2, _struct.unpack("<I", _struct.pack("<f", 0.0))[0] | (seed_wire << 32))
    ptrs = mh + 3
    # ptr0 referenceListOld / ptr1 locusList stay null (as the reference writes)
    _write_blob(seg, ptrs + 2, b"ACGT", is_text=True)  # alphabet

    # referenceList -> struct(0 data, 1 ptr) -> composite list of Reference
    rl = seg.alloc(1)
    seg.put_u64(ptrs + 3, _struct_ptr(ptrs + 3, rl, 0, 1))
    REF_DATA, REF_PTRS = 3, 7
    n = len(sketches)
    refs = seg.alloc(1 + n * (REF_DATA + REF_PTRS))
    seg.put_u64(rl, _list_ptr(rl, refs, _SZ_COMPOSITE, n * (REF_DATA + REF_PTRS)))
    seg.put_u64(refs, (n << 2) | (REF_DATA << 32) | (REF_PTRS << 48))
    for i, sk in enumerate(sketches):
        base = refs + 1 + i * (REF_DATA + REF_PTRS)
        # length (u32) left 0 (reference sets only length64); w1 = length64
        seg.put_u64(base + 1, sk.seq_length)
        seg.put_u64(base + 2, sk.num_valid_kmers)
        p = base + REF_DATA
        _write_blob(seg, p + 2, sk.name.encode(), is_text=True)
        _write_blob(seg, p + 3, b"", is_text=True)  # comment
        _write_prim_list(seg, p + 5, [int(h) for h in sk.hashes.hashes], 8)
        _write_prim_list(
            seg, p + 6, [min(int(c), 0xFFFFFFFF) for c in sk.hashes.counts], 4
        )
    n_words = len(seg.buf) // 8
    return _struct.pack("<II", 0, n_words) + bytes(seg.buf)


def read_msh_bytes(data: bytes) -> list[Sketch]:
    r = _Reader(data)
    root = r.struct_at(_Loc(0, 0))
    if root is None:
        return []
    base, dwords, pwords = root

    def dword(i: int) -> int:
        return r.word(_Loc(base.seg, base.word + i)) if i < dwords else 0

    kmer_size = dword(0) & 0xFFFFFFFF
    seed = ((dword(2) >> 32) & 0xFFFFFFFF) ^ _HASH_SEED_DEFAULT
    params = SketchParams(
        sketch_type="mash",
        kmers_to_sketch=0,
        final_size=0,
        no_strict=True,
        hash_seed=seed,
        kmer_length=kmer_size,
    )
    pbase = _Loc(base.seg, base.word + dwords)

    def ref_elems(ptr_idx: int):
        if ptr_idx >= pwords:
            return []
        st = r.struct_at(_Loc(pbase.seg, pbase.word + ptr_idx))
        if st is None:
            return []
        lb, ld, lp = st
        if lp < 1:
            return []
        return r.composite(_Loc(lb.seg, lb.word + ld))[0:2]

    elems = ref_elems(3)  # referenceList @11
    refs, ref_data = (elems[0], elems[1]) if elems else ([], 0)
    if not refs:
        elems = ref_elems(0)  # referenceListOld @4 fallback (mash.rs:85-89)
        refs, ref_data = (elems[0], elems[1]) if elems else ([], 0)

    out: list[Sketch] = []
    for rb in refs:
        def rword(i: int, _rb=rb) -> int:
            return r.word(_Loc(_rb.seg, _rb.word + i)) if i < ref_data else 0

        p = _Loc(rb.seg, rb.word + ref_data)
        name = (r.blob(_Loc(p.seg, p.word + 2), is_text=True) or b"").decode()
        hashes = np.array(
            _read_prim_list(r, _Loc(p.seg, p.word + 5), 8), dtype=np.uint64
        )
        counts32 = _read_prim_list(r, _Loc(p.seg, p.word + 6), 4)
        if counts32:
            counts = np.array(counts32, dtype=np.int64)
            extras = counts // 2  # mash.rs:117 (extra_count = count / 2)
        else:
            counts = np.ones(len(hashes), dtype=np.int64)
            extras = np.zeros(len(hashes), dtype=np.int64)
        out.append(
            Sketch(
                name,
                KmerCounts(hashes, counts, extras),
                params,
                seq_length=rword(1),
                num_valid_kmers=rword(2),
            )
        )
    return out


def write_msh(path: str, sketches: list[Sketch]) -> None:
    with open(path, "wb") as f:
        f.write(write_msh_bytes(sketches))


def read_msh(path: str) -> list[Sketch]:
    with open(path, "rb") as f:
        return read_msh_bytes(f.read())
