"""Compose the canonical BENCH/scaling_interleaved.json for round 5.

Pools the r5 interleaved sweeps (8/32 and 4/16, 5 trials each) with the
bracketing same-window hardware burns and the oversubscription probe
into the single JSON bench.py attaches as the `scaling` block.
"""

from __future__ import annotations

import json
import os

B = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")


def load(name):
    with open(os.path.join(B, name)) as f:
        return json.load(f)


def main() -> None:
    import statistics

    s832 = load("scaling_interleaved_8_32_r5.json")
    s416 = load("scaling_interleaved_4_16_r5.json")
    runs416 = list(s416["runs"])
    try:
        runs416 += load("scaling_interleaved_4_16_r5b.json")["runs"]
    except OSError:
        pass
    med = {
        c: statistics.median(
            r["docs_per_sec"] for r in runs416 if r["cores"] == c
        )
        for c in (4, 16)
    }
    s416 = dict(
        s416,
        median_docs_per_sec_4=round(med[4], 1),
        median_docs_per_sec_16=round(med[16], 1),
        build_efficiency=round((med[16] / med[4]) / 4, 3),
    )
    burns = {}
    for run in ("run1", "run2", "run3", "run4", "run5"):
        try:
            c = load(f"cpu_capacity_r5_{run}.json")
            pts = {p["workers"]: p["speedup_vs_1"] for p in c["points"]}
            burns[run] = {
                "ceil_8_32": round(pts[32] / pts[8], 3),
                "ceil_4_16": round(pts[16] / pts[4], 3),
            }
        except OSError:
            pass
    try:
        ovs = load("oversub_probe_r5.json")
        ovs.pop("runs", None)
    except OSError:
        ovs = None
    out = {
        "round": 5,
        "n_docs": 50000,
        "levels": [4, 16],
        "pooled_trials_4_16": len(runs416) // 2,
        "median_docs_per_sec_4": s416["median_docs_per_sec_4"],
        "median_docs_per_sec_16": s416["median_docs_per_sec_16"],
        "build_efficiency": s416["build_efficiency"],
        "query_speedup": s416["query_speedup"],
        "hardware_ceiling_4_16": round(
            sum(b["ceil_4_16"] for b in burns.values()) / len(burns) / 4, 3
        ),
        "levels_8_32": {
            "median_docs_per_sec_8": s832["median_docs_per_sec_8"],
            "median_docs_per_sec_32": s832["median_docs_per_sec_32"],
            "build_efficiency": s832["build_efficiency"],
            "hardware_ceiling_8_32": round(
                sum(b["ceil_8_32"] for b in burns.values()) / len(burns) / 4, 3
            ),
        },
        "cpu_burn_ceilings": burns,
        "oversubscription_probe": ovs,
        "note": (
            "round 5: two 5-trial interleaved sweeps bracketed by pure-CPU "
            "burns in the same windows.  The 4->16 protocol is primary: "
            "local[N] runs N JVM task threads AND up to N python workers "
            "(2N hot threads), so local[32] oversubscribes this ~24-28-"
            "effective-core box ~2.3x while the burn (N independent "
            "single-thread processes) does not — the oversubscription "
            "probe quantifies the resulting 32-thread throughput cap "
            "directly.  On a real cluster executors are sized to cores "
            "and the 2N-thread pattern never oversubscribes; 4->16 is "
            "the faithful single-box N->4N measurement.  The box also "
            "drifts phases mid-sweep (membw burn fell 12.3 -> 4.3 GB/s "
            "single-worker across the campaign), which the interleaving "
            "partially cancels."
        ),
    }
    with open(os.path.join(B, "scaling_interleaved.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
