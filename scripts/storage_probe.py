#!/usr/bin/env python3
"""Aggregate parallel write bandwidth of a directory (default /dev/shm).

Round-2 lesson: the original probe wrote 2 GiB per writer, so the
24-writer level pushed a ~50 GiB instantaneous footprint through page
allocation + zeroing and measured *memory reclaim*, not steady write
bandwidth — producing the "flat 6.6 GB/s, one memory bus" conclusion.
At a realistic per-writer footprint (512 MiB) the same tmpfs scales
~0.75-0.9 from 6 to 24 writers (measured 8.5-11 -> ~32 GB/s), so the
e2e replay is NOT storage-bandwidth-bound on this host; see
BASELINE.md "Scaling evidence".

Usage: python scripts/storage_probe.py [dir] [writers ...]
Prints one JSON line: {"dir": ..., "levels": {n: mb_s}, "size_mb": ...}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SZ_MB = int(os.environ.get("STORAGE_PROBE_MB", "512"))
REPS = int(os.environ.get("STORAGE_PROBE_REPS", "2"))


def bandwidth(target: str, n: int) -> float:
    """Best-of-REPS aggregate MB/s of n concurrent dd writers."""
    best = 0.0
    for rep in range(REPS):
        t0 = time.time()
        procs = [
            subprocess.Popen(
                ["dd", "if=/dev/zero", f"of={target}/probe_{n}_{i}",
                 "bs=1M", f"count={SZ_MB}", "conv=fdatasync"],
                stderr=subprocess.DEVNULL,
            )
            for i in range(n)
        ]
        for p in procs:
            p.wait()
        secs = time.time() - t0
        for i in range(n):
            try:
                os.remove(f"{target}/probe_{n}_{i}")
            except FileNotFoundError:
                pass
        best = max(best, n * SZ_MB / secs)
    return round(best, 0)


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm"
    levels = [int(x) for x in sys.argv[2:]] or [6, 24]
    out = {str(n): bandwidth(target, n) for n in levels}
    lo, hi = levels[0], levels[-1]
    eff = round((out[str(hi)] / out[str(lo)]) / (hi / lo), 3)
    print(json.dumps({
        "dir": target, "size_mb_per_writer": SZ_MB, "reps": REPS,
        "mb_s": out, "bw_efficiency": eff,
    }))


if __name__ == "__main__":
    main()
