"""Measure this machine's EFFECTIVE parallel CPU capacity.

A pure-CPU burn (no IPC, no GIL contention — each worker is a separate
process spinning on integer arithmetic) run at increasing worker counts.
The aggregate ops/sec plateau is the ceiling any multi-core benchmark on
this box can reach: if 32 workers deliver only ~21 workers' worth of
ops/sec, an 8-vs-32-thread comparison can measure at most 21/8 = 2.6x,
not 4x — which is why BENCH/BASELINE.md's N->4N criterion uses 4 vs 16
(both inside the ceiling) and reports 8-vs-32 against the measured
ceiling rather than against a nominal 4x.

Usage: python tools/cpu_capacity.py [spin_secs_per_point]
Writes /tmp/cpu_capacity.json
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _noop(_i: int) -> None:
    return None


def _burn(seconds: float) -> int:
    end = time.perf_counter() + seconds
    x, n = 1, 0
    while time.perf_counter() < end:
        for _ in range(10_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 10_000
    return n


def main() -> None:
    spin = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    out = {"spin_secs": spin, "points": []}
    base = None
    for workers in (1, 4, 8, 16, 32):
        with mp.get_context("spawn").Pool(workers) as pool:
            # warm the pool BEFORE timing: spawn workers boot interpreters
            # lazily, and including that ramp in the window biases the
            # high-worker points low — the exact quantity being measured
            pool.map(_noop, range(workers))
            t0 = time.perf_counter()
            ops = sum(pool.map(_burn, [spin] * workers))
            wall = time.perf_counter() - t0
        rate = ops / wall
        if base is None:
            base = rate
        out["points"].append(
            {
                "workers": workers,
                "mops_per_sec": round(rate / 1e6, 1),
                "speedup_vs_1": round(rate / base, 2),
            }
        )
        print(json.dumps(out["points"][-1]), flush=True)
    # the PLATEAU maximum, not the last point: oversubscription can make
    # 32 workers slower than 16, and the ceiling the scaling analysis
    # calibrates against is the best the box ever delivers
    out["effective_capacity"] = max(p["speedup_vs_1"] for p in out["points"])
    with open("/tmp/cpu_capacity.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
