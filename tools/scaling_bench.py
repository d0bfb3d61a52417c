"""North-rule scaling evidence: identical index-build + query job at two
parallelism levels (local[8] vs local[32]) on the same input.

Usage: python tools/scaling_bench.py <cores> <out.jsonl>
Appends one JSON line with build + query numbers for that level.
BENCH/BASELINE.md is assembled from the two lines.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    out = sys.argv[2]
    n_docs = int(os.environ.get("BENCH_DOCS", "20000"))

    from bench import run_index_build
    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(app_name=f"scaling{cores}", cores=cores)
    # identical input: the corpus parquet is written once by the first
    # level and reused by the second (deterministic seed either way)
    r = run_index_build(spark, n_docs, "/tmp/scaling_idx", n_shards=2)
    r["cores"] = cores
    r["n_docs"] = n_docs
    with open(out, "a") as f:
        f.write(json.dumps(r) + "\n")
    print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
