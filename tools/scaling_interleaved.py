"""Definitive scaling measurement for BENCH/BASELINE.md.

This sandbox VM's throughput drifts ~2.5x over minutes, so single-shot
level comparisons are meaningless.  This harness interleaves the two
parallelism levels (A B A B A B) on the identical input and reports the
per-level MEDIAN build throughput and warm query latency.

Usage: python tools/scaling_interleaved.py [n_docs] [trials]
Writes /tmp/scaling_interleaved.json
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
# N and 4N parallelism levels.  Default 4->16: both ends sit INSIDE this
# VM's ~21-effective-CPU capacity ceiling (tools/cpu_capacity.py), so a
# true 4x of hardware is actually available — 8->32 spans the ceiling and
# caps the measurable ratio at ~21/8 = 2.6x regardless of the code.
LEVELS = tuple(
    int(x) for x in os.environ.get("SCALING_LEVELS", "4,16").split(",")
)
SRC = f"/tmp/scaling_src_{N_DOCS}"
QUERIES = ["def return", "binarysearchtree", "import class self"]


def one_run(cores: int) -> dict:
    from _bench_common import ensure_corpus
    from open_source_search_engine_spark.operators.build import build_index
    from open_source_search_engine_spark.operators.topk import search_wand
    from open_source_search_engine_spark.plans.exec import (
        _COLL_CACHE,
        _TERM_CACHE,
    )
    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(app_name=f"scale{cores}", cores=cores)
    try:
        docs = ensure_corpus(spark, N_DOCS, SRC)
        root = "/tmp/scaling_idx"
        shutil.rmtree(root, ignore_errors=True)
        _COLL_CACHE.clear()
        _TERM_CACHE.clear()
        t0 = time.time()
        idx = build_index(spark, docs, root, n_shards=2, shard_parallelism=2)
        build_secs = time.time() - t0
        for q in QUERIES * 2:  # warm
            search_wand(spark, idx, q, k=10).collect()
        lat = []
        for _ in range(3):
            for q in QUERIES:
                t0 = time.time()
                search_wand(spark, idx, q, k=10).collect()
                lat.append((time.time() - t0) * 1000)
        return {
            "cores": cores,
            "build_secs": round(build_secs, 1),
            "docs_per_sec": round(N_DOCS / build_secs, 1),
            "query_p50_ms": round(statistics.median(lat), 1),
        }
    finally:
        spark.stop()
        shutil.rmtree("/dev/shm/spark-local", ignore_errors=True)
        time.sleep(2)


def main() -> None:
    runs = []
    for t in range(TRIALS):
        # alternate level order per trial to cancel slow VM drift
        order = LEVELS if t % 2 == 0 else tuple(reversed(LEVELS))
        for cores in order:
            r = one_run(cores)
            r["trial"] = t
            runs.append(r)
            print(json.dumps(r), flush=True)
    # first/last, not 2-tuple unpack: a 3-level sweep via SCALING_LEVELS
    # must not crash at summary time after all trials have run
    lo, hi = LEVELS[0], LEVELS[-1]
    out = {"n_docs": N_DOCS, "levels": list(LEVELS), "runs": runs}
    for cores in LEVELS:
        tps = [r["docs_per_sec"] for r in runs if r["cores"] == cores]
        lat = [r["query_p50_ms"] for r in runs if r["cores"] == cores]
        out[f"median_docs_per_sec_{cores}"] = statistics.median(tps)
        out[f"median_query_p50_ms_{cores}"] = statistics.median(lat)
    out["build_efficiency"] = round(
        (out[f"median_docs_per_sec_{hi}"] / out[f"median_docs_per_sec_{lo}"])
        / (hi / lo),
        3,
    )
    out["query_speedup"] = round(
        out[f"median_query_p50_ms_{lo}"] / out[f"median_query_p50_ms_{hi}"], 2
    )
    with open("/tmp/scaling_interleaved.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
