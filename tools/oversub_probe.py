"""Is the 32-thread build capped by process oversubscription?

local[N] runs N JVM task threads AND up to N python workers — 2N hot
threads.  The CPU burn (separate single-thread processes) says this box
scales to ~24-28 effective cores, so local[32]'s 64 hot threads
oversubscribe ~2.3x while local[16]'s 32 sit at the edge.  If build
throughput plateaus (or dips) beyond local[16-24] while the burn keeps
scaling to 32 workers, the "32-core software floor" is single-box
oversubscription — a local-mode artifact a real cluster (properly sized
executors) does not have — and the honest N->4N protocol is 4->16.

Usage: python tools/oversub_probe.py [n_docs] [trials]
Writes /tmp/oversub_probe.json
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
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
LEVELS = tuple(
    int(x) for x in os.environ.get("OVERSUB_LEVELS", "16,24,32").split(",")
)
SRC = f"/tmp/scaling_src_{N_DOCS}"


def one_run(cores: int) -> dict:
    from _bench_common import ensure_corpus
    from open_source_search_engine_spark.operators.build import build_index
    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(app_name=f"ovs{cores}", cores=cores)
    try:
        docs = ensure_corpus(spark, N_DOCS, SRC)
        root = "/tmp/oversub_idx"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.time()
        build_index(spark, docs, root, n_shards=2, shard_parallelism=2)
        secs = time.time() - t0
        return {"cores": cores, "build_secs": round(secs, 1),
                "docs_per_sec": round(N_DOCS / secs, 1)}
    finally:
        spark.stop()
        shutil.rmtree("/dev/shm/spark-local", ignore_errors=True)
        time.sleep(2)


def main() -> None:
    runs = []
    for t in range(TRIALS):
        order = LEVELS if t % 2 == 0 else tuple(reversed(LEVELS))
        for cores in order:
            r = one_run(cores)
            r["trial"] = t
            runs.append(r)
            print(json.dumps(r), flush=True)
    out = {"n_docs": N_DOCS, "levels": list(LEVELS), "runs": runs}
    for cores in LEVELS:
        vals = [r["docs_per_sec"] for r in runs if r["cores"] == cores]
        out[f"median_docs_per_sec_{cores}"] = statistics.median(vals)
    with open("/tmp/oversub_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
