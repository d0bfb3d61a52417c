"""Per-stage build profiling at two parallelism levels (BENCH/BASELINE.md
"stage-level decomposition" evidence).

Stages timed independently on the identical input, interleaved A/B per
trial to cancel VM drift:
  tokenize   tokenize_to_postings -> count          (pure compute, no shuffle)
  encode     + salted repartition + block encode    (the one build shuffle)
  build      full build_index incl. segment writes, snapshot commits,
             stats, checkpoints                     (end-to-end)

Usage: python tools/profile_build.py [n_docs] [trials]
Writes /tmp/profile_build.json
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
LEVELS = tuple(
    int(x) for x in os.environ.get("SCALING_LEVELS", "8,32").split(",")
)
SRC = f"/tmp/scaling_src_{N_DOCS}"


def one_run(cores: int) -> dict:
    from pyspark import StorageLevel

    from open_source_search_engine_spark.operators.build import (
        build_index,
        derive_ids,
        encode_blocks,
    )
    from open_source_search_engine_spark.functions.tokenize import (
        tokenize_to_postings,
    )
    from _bench_common import ensure_corpus
    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(app_name=f"prof{cores}", cores=cores)
    out = {"cores": cores}
    try:
        docs = ensure_corpus(spark, N_DOCS, SRC)
        target_parts = 2 * spark.sparkContext.defaultParallelism
        docs_r = docs.repartition(target_parts)
        ids = derive_ids(docs_r)

        t0 = time.time()
        posts = tokenize_to_postings(ids).persist(StorageLevel.MEMORY_AND_DISK)
        n_posts = posts.count()
        out["tokenize_secs"] = round(time.time() - t0, 1)
        out["n_postings"] = n_posts

        t0 = time.time()
        blocks = encode_blocks(
            posts.select("term_id", "doc_id", "doclen", "tf", "pos_enc")
        )
        out["n_blocks"] = blocks.count()
        out["encode_secs"] = round(time.time() - t0, 1)
        posts.unpersist()

        root = "/tmp/profile_idx"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.time()
        build_index(spark, docs, root, n_shards=2, shard_parallelism=2)
        out["build_secs"] = round(time.time() - t0, 1)
        out["build_docs_per_sec"] = round(N_DOCS / out["build_secs"], 1)
        out["tokenize_kposts_per_sec"] = round(n_posts / out["tokenize_secs"] / 1e3, 1)
        out["encode_kposts_per_sec"] = round(n_posts / out["encode_secs"] / 1e3, 1)
        return out
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
    out = {"n_docs": N_DOCS, "runs": runs}
    for metric in (
        "tokenize_kposts_per_sec",
        "encode_kposts_per_sec",
        "build_docs_per_sec",
    ):
        for cores in LEVELS:
            vals = [r[metric] for r in runs if r["cores"] == cores]
            out[f"median_{metric}_{cores}"] = statistics.median(vals)
        lo, hi = LEVELS[0], LEVELS[-1]
        out[f"efficiency_{metric}"] = round(
            (out[f"median_{metric}_{hi}"] / out[f"median_{metric}_{lo}"])
            / (hi / lo),
            3,
        )
    with open("/tmp/profile_build.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
