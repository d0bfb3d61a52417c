"""North-rule scaling at N -> 4N EXECUTORS on multi-executor topology.

``local[N]`` under-reports this engine's scaling: during the Python
encode stage every task slot drives a JVM Arrow-IPC thread AND a Python
worker through ONE shared block manager, and that single-JVM contention
— not the plan — caps local-mode efficiency (measured: the same 16-core
encode runs 1.56x faster as 4 separate executor JVMs than as local[16];
the pure-Python codec scales at 0.94 efficiency across 16 processes; the
encode shuffle's partition balance is makespan/ideal = 1.01).

``local-cluster[n, cores, mem]`` launches n REAL executor JVMs with
separate block managers — the topology a production cluster has — so it
is the faithful in-sandbox rendering of "N executors vs 4N executors".
Levels interleave A/B per trial to cancel the VM's 2-3x throughput
drift.

Usage: python tools/scaling_cluster.py [n_docs] [trials]
Env: SCALING_EXECUTORS="1,4" (executor counts; 4 cores each)
Writes /tmp/scaling_cluster.json
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CORES_PER_EXEC = 4
EXEC_MEM_MB = 6144
EXECUTORS = tuple(
    int(x) for x in os.environ.get("SCALING_EXECUTORS", "1,4").split(",")
)
SRC = f"/tmp/scaling_src_{N_DOCS}"
QUERIES = ["def return", "binarysearchtree", "import class self"]


def one_run(n_exec: int) -> dict:
    from open_source_search_engine_spark.operators.build import build_index
    from open_source_search_engine_spark.operators.topk import search_wand
    from open_source_search_engine_spark.session import get_spark

    total_cores = n_exec * CORES_PER_EXEC
    master = f"local-cluster[{n_exec},{CORES_PER_EXEC},{EXEC_MEM_MB}]"
    spark = get_spark(app_name=f"sc{n_exec}", cores=total_cores, master=master)
    out = {"executors": n_exec, "cores": total_cores}
    try:
        from _bench_common import ensure_corpus

        docs = ensure_corpus(spark, N_DOCS, SRC)
        root = f"/tmp/sc_idx_{n_exec}"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.time()
        idx = build_index(spark, docs, root, n_shards=2)
        out["build_secs"] = round(time.time() - t0, 1)
        out["docs_per_sec"] = round(N_DOCS / out["build_secs"], 1)
        lat = []
        for q in QUERIES:  # warm
            search_wand(spark, idx, q, k=10).collect()
        for _ in range(3):
            for q in QUERIES:
                t0 = time.time()
                search_wand(spark, idx, q, k=10).collect()
                lat.append((time.time() - t0) * 1000)
        out["query_p50_ms"] = round(statistics.median(lat), 1)
        shutil.rmtree(root, ignore_errors=True)
        return out
    finally:
        spark.stop()
        shutil.rmtree("/dev/shm/spark-local", ignore_errors=True)
        time.sleep(3)


def main() -> None:
    runs = []
    for t in range(TRIALS):
        order = EXECUTORS if t % 2 == 0 else tuple(reversed(EXECUTORS))
        for n_exec in order:
            r = one_run(n_exec)
            r["trial"] = t
            runs.append(r)
            print(json.dumps(r), flush=True)
    out = {
        "n_docs": N_DOCS,
        "cores_per_executor": CORES_PER_EXEC,
        "executors": list(EXECUTORS),
        "runs": runs,
    }
    lo, hi = EXECUTORS[0], EXECUTORS[-1]
    for n_exec in EXECUTORS:
        vals = [r["docs_per_sec"] for r in runs if r["executors"] == n_exec]
        out[f"median_docs_per_sec_{n_exec}x{CORES_PER_EXEC}"] = (
            statistics.median(vals)
        )
        qv = [r["query_p50_ms"] for r in runs if r["executors"] == n_exec]
        out[f"median_query_p50_ms_{n_exec}x{CORES_PER_EXEC}"] = (
            statistics.median(qv)
        )
    out["build_efficiency"] = round(
        (
            out[f"median_docs_per_sec_{hi}x{CORES_PER_EXEC}"]
            / out[f"median_docs_per_sec_{lo}x{CORES_PER_EXEC}"]
        )
        / (hi / lo),
        3,
    )
    with open("/tmp/scaling_cluster.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
