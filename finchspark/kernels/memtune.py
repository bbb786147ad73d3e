"""glibc malloc tuning for Arrow-batch numpy kernels.

The batch kernels allocate O(batch bytes) of large temporary arrays per
Arrow batch (shingle hashes, sort scratch, rank levels). glibc serves
allocations above the mmap threshold with fresh anonymous mmaps and gives
them straight back to the kernel on free, so EVERY batch re-pays first-touch
page faults for its whole working set — and concurrent Python workers then
contend on the kernel's mm locks, which is how a worker fleet can run
*slower* at higher parallelism. Measured on the dev box (10k-doc batch,
single process): steady-state 5.4-6.0 s/batch untuned vs 2.4 s tuned, with
untuned spikes to 22 s when the fault path is slow.

`tune()` raises the mmap/trim thresholds via mallopt(3) so large blocks stay
on the heap free-lists and are reused across batches. The cost is that each
worker process retains its high-water mark of arena memory (standard
allocator behavior under jemalloc/mimalloc too); with byte-bounded
sub-batching (operators/signature.py MAX_CHUNK_BYTES) that is a bounded,
predictable per-worker footprint. Disable with FINCHSPARK_NO_MALLOC_TUNE=1.

Runs in-process (ctypes), so it works inside Spark's forked Python workers
without any spark.executorEnv plumbing; non-glibc platforms no-op.
"""
from __future__ import annotations

import ctypes
import os

# mallopt(3) parameter constants (glibc malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4

_done = False

# optional heap prefault per worker process, MiB (FINCHSPARK_PREFAULT_MB
# overrides). Default OFF: with the mallopt reuse above, first-touch faults
# are paid once per worker at the high-water mark, incrementally and
# overlapped with productive work; a big up-front memset pays the same
# fault bytes serially BEFORE any work (measured: 384 MiB added ~14 s to
# every worker's first task on the dev VM, where the cold-fault path runs
# at tens of MB/s). Enable only on hosts whose fault path is fast but whose
# compaction benefits from one sequential pass.
_PREFAULT_MB = 0


def tune() -> bool:
    """Apply the tuning once per process; True if mallopt calls succeeded."""
    global _done
    if _done:
        return True
    if os.environ.get("FINCHSPARK_NO_MALLOC_TUNE"):
        return False
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        mallopt = libc.mallopt
        mallopt.argtypes = (ctypes.c_int, ctypes.c_int)
        mallopt.restype = ctypes.c_int
    except (OSError, AttributeError):
        return False  # musl / non-glibc: nothing to tune
    ok = True
    # keep every allocation the kernels make on the heap (mallopt caps the
    # threshold internally at 32 MiB on 64-bit, hence also M_MMAP_MAX=0),
    # and never trim the heap top back to the kernel mid-run
    ok &= bool(mallopt(_M_MMAP_THRESHOLD, 0x2000000))
    ok &= bool(mallopt(_M_MMAP_MAX, 0))
    ok &= bool(mallopt(_M_TRIM_THRESHOLD, 0x7FFFFFFF))
    if ok:
        try:
            mb = int(os.environ.get("FINCHSPARK_PREFAULT_MB", _PREFAULT_MB))
        except ValueError:
            mb = _PREFAULT_MB
        if mb > 0:
            _prefault(libc, mb << 20)
    _done = ok
    return ok


def _prefault(libc, size: int) -> None:
    """Touch `size` bytes of heap once (sequential memset) and free them back
    to the malloc free-lists, so later kernel allocations land on
    already-faulted pages. MADV_HUGEPAGE first: with THP in madvise mode the
    region compacts to 2 MiB pages (numpy madvises its own >=4 MiB buffers
    the same way, so reused blocks keep matching behavior)."""
    try:
        libc.malloc.restype = ctypes.c_void_p
        libc.malloc.argtypes = (ctypes.c_size_t,)
        libc.free.argtypes = (ctypes.c_void_p,)
        libc.madvise.argtypes = (ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int)
        ptr = libc.malloc(size)
        if not ptr:
            return
        two_mb = 2 << 20
        aligned = (ptr + two_mb - 1) & ~(two_mb - 1)
        if size > aligned - ptr:
            libc.madvise(aligned, size - (aligned - ptr), 14)  # MADV_HUGEPAGE
        ctypes.memset(ptr, 0, size)
        libc.free(ptr)
    except (OSError, AttributeError, ValueError):
        pass
