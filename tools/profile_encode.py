"""Attribute the encode stage's cost (r4 verdict #3: 0.32 scaling
efficiency 8->32 on encode while tokenize scales superlinearly).

Three timings over the SAME persisted postings, interleaved 8/32 per
trial to cancel VM drift:

  agg     the salting pre-pass alone (heavy-term groupBy + broadcast
          join consumed by a count) — scan + partial agg cost
  noop    salted repartition(term_id,salt) + sortWithinPartitions +
          Arrow transfer into a trivial python consumer — the full
          shuffle/sort/serialization cost WITHOUT the encode kernel
  full    encode_blocks(...).count() — everything

kernel ≈ full − noop; shuffle/serialize ≈ noop − agg.  Whichever
component's 8->32 ratio is flat is the bottleneck.

Usage: python tools/profile_encode.py [n_docs] [trials]
Writes /tmp/profile_encode.json
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
SALT_TARGET = 50_000


def one_run(cores: int) -> dict:
    import pyarrow as pa
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from _bench_common import ensure_corpus
    from open_source_search_engine_spark.functions.tokenize import (
        tokenize_to_postings,
    )
    from open_source_search_engine_spark.operators.build import (
        derive_ids,
        encode_blocks,
    )
    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(app_name=f"profenc{cores}", cores=cores)
    out = {"cores": cores}
    try:
        docs = ensure_corpus(spark, N_DOCS, SRC)
        target_parts = 2 * spark.sparkContext.defaultParallelism
        ids = derive_ids(docs.repartition(target_parts))
        posts = tokenize_to_postings(ids).persist(StorageLevel.MEMORY_AND_DISK)
        n_posts = posts.count()
        out["n_postings"] = n_posts

        # --- agg: salting pre-pass only
        t0 = time.time()
        heavy = (
            posts.groupBy("term_id")
            .agg(F.count("*").alias("df_local"))
            .filter(F.col("df_local") > SALT_TARGET)
        )
        heavy.count()
        out["agg_secs"] = round(time.time() - t0, 2)

        # --- noop: shuffle + sort + Arrow transfer, trivial consumer
        salted = (
            posts.join(F.broadcast(heavy), ["term_id"], "left")
            .withColumn(
                "n_salts",
                F.coalesce(
                    F.ceil(F.col("df_local") / F.lit(SALT_TARGET)), F.lit(1)
                ).cast("int"),
            )
            .withColumn(
                "salt", F.pmod(F.col("doc_id"), F.col("n_salts")).cast("int")
            )
            .select(
                "term_id", "salt", "n_salts", "doc_id", "doclen", "tf",
                "pos_enc",
            )
        )
        part = salted.repartition("term_id", "salt").sortWithinPartitions(
            "term_id", "salt", "doc_id"
        )

        def consume(batches):
            n = 0
            for b in batches:
                n += b.num_rows
            yield pa.RecordBatch.from_pydict({"n": [n]})

        t0 = time.time()
        got = part.mapInArrow(consume, "n long").agg(F.sum("n")).first()[0]
        assert got == n_posts, (got, n_posts)
        out["noop_secs"] = round(time.time() - t0, 2)

        # --- full encode
        t0 = time.time()
        encode_blocks(
            posts.select("term_id", "doc_id", "doclen", "tf", "pos_enc"),
            salt_target=SALT_TARGET,
        ).count()
        out["full_secs"] = round(time.time() - t0, 2)

        out["kernel_secs"] = round(out["full_secs"] - out["noop_secs"], 2)
        out["shuffle_secs"] = round(out["noop_secs"] - out["agg_secs"], 2)
        posts.unpersist()
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
    out = {"n_docs": N_DOCS, "levels": list(LEVELS), "runs": runs}
    lo, hi = LEVELS[0], LEVELS[-1]
    for metric in ("agg_secs", "noop_secs", "full_secs", "kernel_secs", "shuffle_secs"):
        for cores in LEVELS:
            vals = [r[metric] for r in runs if r["cores"] == cores]
            out[f"median_{metric}_{cores}"] = statistics.median(vals)
        lo_v = out[f"median_{metric}_{lo}"]
        hi_v = out[f"median_{metric}_{hi}"]
        if hi_v > 0:
            out[f"speedup_{metric}"] = round(lo_v / hi_v, 2)
            out[f"efficiency_{metric}"] = round((lo_v / hi_v) / (hi / lo), 3)
    with open("/tmp/profile_encode.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
