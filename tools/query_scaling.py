"""Query latency vs CORPUS SIZE at fixed parallelism (the 100x question).

The north-rule scaling tools vary cores at fixed input; this one varies
the input at fixed cores (local[32]) and asks whether the query path's
cost grows with the corpus or with the result.  Block-max WAND's whole
point (PosdbTable's maxScore prune analog) is that top-k latency tracks
the number of blocks that can still beat the heap threshold — far
sublinear in corpus size — while the exhaustive plan scores every
posting of every query term and grows ~linearly.  Both are measured on
the same indexes, same queries, same session, plus the kernel's own
prune counters (blocks_scored / blocks_skipped) so the mechanism is
visible, not inferred.

Usage: python tools/query_scaling.py [sizes_csv] [reps]
Default sizes 20000,50000,200000 (10x span).  Writes
/tmp/query_scaling.json; archive to BENCH/ when the run is clean.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = tuple(
    int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "20000,50000,200000").split(",")
)
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
QUERIES = ["def return", "binarysearchtree", "import class self", "fn OR func"]


def one_size(spark, n_docs: int) -> dict:
    from _bench_common import ensure_corpus

    from open_source_search_engine_spark.operators.build import build_index
    from open_source_search_engine_spark.operators.stats import describe_index
    from open_source_search_engine_spark.operators.topk import search_wand
    from open_source_search_engine_spark.plans.exec import search

    docs = ensure_corpus(spark, n_docs, f"/tmp/scaling_src_{n_docs}")
    root = f"/tmp/qs_idx_{n_docs}"
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.time()
    idx = build_index(spark, docs, root, n_shards=2, bigram_terms=True)
    build_secs = time.time() - t0
    info = describe_index(spark, idx)["postings"]

    lat: dict[str, list[float]] = {"wand": [], "exhaustive": []}
    for q in QUERIES * 2:  # warm: parquet footer cache + codegen
        search_wand(spark, idx, q, k=10).collect()
        search(spark, idx, q, k=10).collect()
    prune = {"blocks_scored": 0, "blocks_skipped": 0}
    for _ in range(REPS):
        for q in QUERIES:
            t0 = time.time()
            search_wand(spark, idx, q, k=10).collect()
            lat["wand"].append((time.time() - t0) * 1000)
            t0 = time.time()
            search(spark, idx, q, k=10).collect()
            lat["exhaustive"].append((time.time() - t0) * 1000)
    for q in QUERIES:
        rows = search_wand(spark, idx, q, k=10, with_prune_stats=True).collect()
        # counters are PER-SHARD kernel totals repeated on that shard's
        # rows; sum one copy per distinct shard tuple (a shard whose rows
        # all lost the global top-k merge drops out — slight undercount,
        # same direction for both counters, so the skip fraction holds)
        for scored, skipped in {
            (r["blocks_scored"], r["blocks_skipped"]) for r in rows
        }:
            prune["blocks_scored"] += scored
            prune["blocks_skipped"] += skipped
    out = {
        "n_docs": n_docs,
        "build_secs": round(build_secs, 1),
        "postings": info["postings"],
        "blocks": info["blocks"],
        "wand_p50_ms": round(statistics.median(lat["wand"]), 1),
        "exhaustive_p50_ms": round(statistics.median(lat["exhaustive"]), 1),
        "wand_all_ms": [round(x, 1) for x in sorted(lat["wand"])],
        "exhaustive_all_ms": [round(x, 1) for x in sorted(lat["exhaustive"])],
        "prune_totals_4_queries": prune,
        "skip_fraction": round(
            prune["blocks_skipped"]
            / max(1, prune["blocks_scored"] + prune["blocks_skipped"]),
            3,
        ),
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(app_name="query_scaling", cores=32)
    per_size = [one_size(spark, n) for n in SIZES]
    lo, hi = per_size[0], per_size[-1]
    result = {
        "cores": 32,
        "reps": REPS,
        "queries": QUERIES,
        "per_size": per_size,
        "corpus_growth": round(hi["n_docs"] / lo["n_docs"], 1),
        "postings_growth": round(hi["postings"] / max(1, lo["postings"]), 1),
        "wand_p50_growth": round(hi["wand_p50_ms"] / lo["wand_p50_ms"], 2),
        "exhaustive_p50_growth": round(
            hi["exhaustive_p50_ms"] / lo["exhaustive_p50_ms"], 2
        ),
    }
    print(json.dumps(result))
    with open("/tmp/query_scaling.json", "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
