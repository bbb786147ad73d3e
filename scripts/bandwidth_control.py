"""No-Spark scaling control: N independent OS processes running the pure
numpy murmur3 shingle kernel (no JVM, no shuffles, no shared state beyond
the machine itself).

If N -> 4N independent processes do not scale, the ceiling is the box (fixed
memory bandwidth / VM throttling), not the job — this is the normalization
baseline the scaling report cites. Prints one JSON line:
  {"procs": [...], "shingles_per_sec": {...}, "efficiency_n_to_4n": ...}

Usage: python scripts/bandwidth_control.py [N] [repeats]
"""
from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _work(seed: int) -> int:
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import numpy as np

    from finchspark.kernels.murmur3 import murmur3_sliding_low64

    rng = np.random.default_rng(seed)
    blob = rng.integers(32, 127, 4 << 20).astype(np.uint8)  # 4 MiB text-ish
    total = 0
    for _ in range(8):
        h = murmur3_sliding_low64(blob, 21, 0)
        total += len(h)
    return total


def measure(procs: int) -> float:
    with mp.Pool(procs) as pool:
        t0 = time.perf_counter()
        counts = pool.map(_work, range(procs))
        dt = time.perf_counter() - t0
    return sum(counts) / dt


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    levels = [1, n, 4 * n]
    best: dict[int, float] = {p: 0.0 for p in levels}
    for _ in range(repeats):
        for p in levels:
            best[p] = max(best[p], measure(p))
    eff = (best[4 * n] / best[n]) / 4.0
    print(
        json.dumps(
            {
                "procs": levels,
                "shingles_per_sec": {str(p): round(best[p] / 1e6, 1) for p in levels},
                "unit": "Mshingles/s (best-of-%d)" % repeats,
                "efficiency_n_to_4n": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
