"""Quick host-state probe: resident DRAM bandwidth + fresh-page-fault rate.

Round-5 finding: this host has two independent noisy-neighbor failure modes —
(a) resident-memory bandwidth swings 2.9–20 GB/s (seen since r2), and
(b) fresh-page allocation (first-touch fault + zeroing) can collapse to
~25 MB/s (seen 2026-08-18 00:40, ~40 us per 4 KiB page), which poisons any
JVM-heavy benchmark regardless of (a).  Run this before trusting a wall-clock
number; a healthy window shows copy >= ~8 GB/s AND fill <= ~0.3 s.

Usage: python bench/host_probe.py   -> one JSON line on stdout.
"""

import json
import time

import numpy as np


def probe() -> dict:
    a = np.ones(1 << 27, dtype=np.uint8)
    b = np.ones(1 << 27, dtype=np.uint8)  # pre-touched target
    t0 = time.time()
    b[:] = a
    resident_copy_s = time.time() - t0

    t0 = time.time()
    c = np.empty(1 << 27, dtype=np.uint8)
    c[:] = 1  # first touch: faults 32Ki fresh pages
    fresh_fill_s = time.time() - t0

    x = np.arange(1 << 22)
    t0 = time.time()
    s = 0
    for _ in range(10):
        s += int((x * 3 + 1).sum())
    scalar10_s = time.time() - t0

    return {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "resident_copy_gbps": round((1 << 27) / max(resident_copy_s, 1e-9) / 1e9, 2),
        "fresh_fill_128mib_s": round(fresh_fill_s, 3),
        "scalar10_s": round(scalar10_s, 3),
        "healthy": resident_copy_s < 0.017 and fresh_fill_s < 0.3,
        "_s": s % 97,
    }


if __name__ == "__main__":
    print(json.dumps(probe()))
