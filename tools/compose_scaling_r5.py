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
    for run in ("run1", "run2", "run3", "run4", "run5", "run6", "run7", "run8"):
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
    try:
        s28 = load("scaling_interleaved_2_8_r5.json")
        runs28 = list(s28["runs"])
        try:
            runs28 += load("scaling_interleaved_2_8_r5b.json")["runs"]
        except OSError:
            pass
        med28 = {
            c: statistics.median(
                r["docs_per_sec"] for r in runs28 if r["cores"] == c
            )
            for c in (2, 8)
        }
        s28 = dict(
            s28,
            median_docs_per_sec_2=round(med28[2], 1),
            median_docs_per_sec_8=round(med28[8], 1),
            build_efficiency=round((med28[8] / med28[2]) / 4, 3),
            pooled_trials=len(runs28) // 2,
        )
    except OSError:
        s28 = None
    out = {
        "round": 5,
        "n_docs": 50000,
        "levels": [2, 8] if s28 else [4, 16],
        "cpu_burn_ceilings": burns,
        "oversubscription_probe": ovs,
    }
    if s28:
        out.update(
            {
                "pooled_trials_2_8": s28.get("pooled_trials", 5),
                "median_docs_per_sec_2": s28["median_docs_per_sec_2"],
                "median_docs_per_sec_8": s28["median_docs_per_sec_8"],
                "build_efficiency": s28["build_efficiency"],
                "query_speedup": s28["query_speedup"],
                # Amdahl at p=4: s = (1/eff - 1)/3 — eff 0.71 implies
                # ~13.6% serial (job-dispatch floor x ~15 build jobs +
                # snapshot commits)
                "serial_fraction_amdahl": round(
                    max(0.0, (1.0 / s28["build_efficiency"] - 1.0) / 3.0), 3
                ),
            }
        )
    out["levels_4_16"] = {
        "pooled_trials": len(runs416) // 2,
        "median_docs_per_sec_4": s416["median_docs_per_sec_4"],
        "median_docs_per_sec_16": s416["median_docs_per_sec_16"],
        "build_efficiency": s416["build_efficiency"],
        "hardware_ceiling_4_16": round(
            sum(b["ceil_4_16"] for b in burns.values()) / len(burns) / 4, 3
        ),
    }
    out["levels_8_32"] = {
        "median_docs_per_sec_8": s832["median_docs_per_sec_8"],
        "median_docs_per_sec_32": s832["median_docs_per_sec_32"],
        "build_efficiency": s832["build_efficiency"],
        "hardware_ceiling_8_32": round(
            sum(b["ceil_8_32"] for b in burns.values()) / len(burns) / 4, 3
        ),
    }
    out["note"] = (
        "round 5: three 5-trial interleaved sweeps (2/8, 4/16 x2 pooled, "
        "8/32) bracketed by pure-CPU burns in the same windows.  local[N] "
        "runs N JVM task threads AND up to N python workers (2N hot "
        "threads): the NEW oversubscription probe measures build "
        "throughput PEAKING at local[24] (2117 docs/s) and FALLING at "
        "local[32] (1884) on this ~24-28-effective-core box, so 8->32 "
        "ratios are capped by oversubscription (a local-mode artifact: "
        "real clusters size executors to cores) and even local[16]'s 32 "
        "hot threads brush capacity.  The within-capacity N->4N numbers: "
        "2->8 = 0.71 raw (tightest series, ceiling ~0.95+), 4->16 = "
        "0.64 pooled vs a 0.97 burn ceiling.  The residual vs linear is "
        "a ~13% serial fraction — the local job-dispatch floor (~0.3-0.5 "
        "s/job x ~15 jobs per build) plus snapshot commits, which on a "
        "real cluster amortizes over executor-parallel work that is "
        "orders of magnitude larger per job.  The box also drifts phases "
        "mid-sweep (membw burn fell 12.3 -> 4.3 GB/s single-worker "
        "across one campaign); interleaving cancels pairwise drift, not "
        "monotone slides."
    )
    with open(os.path.join(B, "scaling_interleaved.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
