"""Measure this machine's EFFECTIVE parallel MEMORY BANDWIDTH.

The pure-CPU spin burn (tools/cpu_capacity.py) measures arithmetic
throughput, but a Spark build is memcpy-heavy — Arrow batches, tmpfs
shuffle files, parquet encode all stream memory.  On a shared bus, 8
fast cores can already saturate bandwidth, in which case 8->32 shows no
speedup on memory-bound stages no matter how good the software is.  This
burn measures that ceiling directly: each worker is a separate process
streaming a STREAM-triad-like numpy kernel (a = b*s + c) over arrays far
larger than L2, at increasing worker counts.  Aggregate GB/s plateau =
the bandwidth any multi-core benchmark on this box can reach.

Usage: python tools/membw_capacity.py [secs_per_point] [mb_per_worker]
Writes /tmp/membw_capacity.json
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _noop(_i: int) -> None:
    return None


def _stream(args: tuple[float, int]) -> float:
    """Return bytes moved by a triad a = b*s + c over `mb` MB arrays."""
    seconds, mb = args
    import numpy as np

    n = mb * 1024 * 1024 // 8
    b = np.ones(n)
    c = np.ones(n)
    a = np.empty(n)
    end = time.perf_counter() + seconds
    iters = 0
    while time.perf_counter() < end:
        np.multiply(b, 1.000001, out=a)
        a += c
        iters += 1
    # the TWO-op numpy form streams 5 array-touches per iteration:
    # multiply = read b + write a; += = read a + read c + write a.
    # (A fused single-op triad would be 3; counting 3 here would
    # under-report actual traffic by 40%.)  Write-allocate RFO traffic
    # is ignored, as STREAM convention does.
    return float(iters * 5 * n * 8)


def main() -> None:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = {"secs": secs, "mb_per_worker": mb, "points": []}
    base = None
    for workers in (1, 4, 8, 16, 32):
        with mp.get_context("spawn").Pool(workers) as pool:
            pool.map(_noop, range(workers))  # boot interpreters untimed
            t0 = time.perf_counter()
            moved = sum(pool.map(_stream, [(secs, mb)] * workers))
            wall = time.perf_counter() - t0
        rate = moved / wall
        if base is None:
            base = rate
        out["points"].append(
            {
                "workers": workers,
                "gb_per_sec": round(rate / 1e9, 2),
                "speedup_vs_1": round(rate / base, 2),
            }
        )
        print(json.dumps(out["points"][-1]), flush=True)
    out["effective_capacity"] = max(p["speedup_vs_1"] for p in out["points"])
    with open("/tmp/membw_capacity.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()


