"""Benchmark harness (driver contract + BASELINE.md protocol).

Default mode: runs the headline query set at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "build_docs_per_sec": ..., "query_p50_ms": ...}

``--scaling`` additionally runs the identical index-build + query job at
local[8] and local[32] on the same input and reports throughput at both
plus efficiency = (T8/T32)/1 vs core ratio — the in-sandbox evidence for
the north rule's N->4N criterion (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Since round 2 the BM25 headline queries run through the STORED index
# (engine_* = build_index -> WAND / exhaustive search), per the round-1
# verdict: the ad-hoc full-scan bm25_* plans remain as oracle entries but
# are not the engine's latency story.  The index build itself is timed
# separately (build_docs_per_sec) and primed untimed in run_headline.
HEADLINE = [
    "engine_bm25_single",
    "engine_bm25_and2",
    "engine_bm25_and3",
    "engine_bm25_or",
    "engine_bm25_neg",
    "engine_phrase",
    "agg_pricing",
    "join_enrich",
    "window_top2",
    "latest_wins",
    "metrics_rollup",
    "ann_cosine",
    "dedup_exact",
    "token_stats",
    "simhash",
]

N_BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "20000"))


def run_headline(spark, sf_dir: str) -> tuple[dict[str, float], float]:
    """(warm per-query times, cold battery total).

    The first battery pass carries per-query wholestage-codegen
    compilation (~0.5-3 s each, a one-time driver JVM cost a resident
    engine never re-pays) — since r4 it is TIMED and reported as
    ``headline_cold_secs`` (r3 verdict: cross-round battery totals must
    compare like with like).  The engine-index build/load is primed
    SEPARATELY before the cold pass so 'cold' means cold JVM plans, not
    index construction (that cost is reported as index_build_secs).
    """
    from open_source_search_engine_spark.engine_entries import engine_index
    from open_source_search_engine_spark.entry_queries import build_registry

    qs, _ = build_registry()
    engine_index(spark, sf_dir)  # index build/load primes outside both passes
    qs["bm25_single"](spark, sf_dir).collect()
    t_cold = time.time()
    for name in HEADLINE:
        qs[name](spark, sf_dir).collect()
    cold_secs = round(time.time() - t_cold, 3)
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.collect()
        times[name] = round(time.time() - t0, 3)
    return times, cold_secs


# Round-4 additions timed as their own series so the HEADLINE battery
# stays comparable across rounds (r3 verdict: like with like).  Warm
# timings, same protocol as the battery's warm pass.
EXTRAS = [
    "engine_mlt",
    "hybrid_rrf",
    "dedup_clusters",
    "prefix_suggest",
    "mmr_diversify",
    "sessionize",
    "url_filters",
    "link_rank",
    "engine_anchor",
    "sample_stratified",
    "engine_federated",
    "training_mix",
    "pack_sequences",
    "pii_scrub",
    "gopher_repetition",
    "dup_spans",
    "dup_span_scrub",
    "lm_perplexity",
    "quality_perceptron",
    "engine_regex",
    "percolate",
    "regex_rules",
    "semantic_decontam",
    "engine_changelog",
    "c4_filters",
    "mix_temperature",
    "pagerank",
    "next_word_suggest",
    "collocations",
]


def _semantic_dedup_banded(spark, sf_dir: str):
    # the SCALE configuration of semantic dedup (banded hyperplane LSH
    # candidates, default 8 planes x 4 bands), not the registry entry's
    # exhaustive one-bucket oracle mode — at sf0.1 the one-bucket mode is
    # a deliberate O(n^2) single-task join and would time the oracle
    # trick, not the operator
    from open_source_search_engine_spark.operators import dedup, similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = similarity.pairwise_cosine_above(emb, threshold=0.3)
    return dedup.dedup_clusters(pairs).orderBy("cluster_id", "doc_id")


def _semantic_decontam_matmul(spark, sf_dir: str):
    # the SCALE configuration of semantic decontamination: the BLAS
    # matmul twin (operators/decontam.decontaminate_semantic_matmul,
    # parity-tested against the codegen expression path the registry
    # entry certifies) — one numpy matmul per Arrow batch instead of a
    # codegen nested-loop, 2-3x at sf0.1 (r4 verdict task 8)
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.operators import decontam

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    is_eval = F.col("vec_id") % 10 == 0
    return decontam.decontaminate_semantic_matmul(
        emb.where(~is_eval), emb.where(is_eval), "vec_id", "embedding", 0.3
    ).orderBy("vec_id")


def run_extras(spark, sf_dir: str) -> dict[str, float]:
    from open_source_search_engine_spark.entry_queries import build_registry

    qs, _ = build_registry()
    fns = {name: qs[name] for name in EXTRAS}
    fns["semantic_dedup_banded"] = _semantic_dedup_banded
    fns["semantic_decontam"] = _semantic_decontam_matmul
    for fn in fns.values():  # warm pass (codegen + caches)
        fn(spark, sf_dir).collect()
    times: dict[str, float] = {}
    for name, fn in fns.items():
        t0 = time.time()
        fn(spark, sf_dir).collect()
        times[name] = round(time.time() - t0, 3)
    return times


def run_index_build(spark, n_docs: int, root: str, n_shards: int = 2) -> dict:
    """North-rule metric: index-build docs/sec on the synthetic
    (repo,path,commit,lang,content) corpus + warm query latency."""
    from open_source_search_engine_spark.operators.build import build_index
    from open_source_search_engine_spark.operators.topk import search_wand
    from open_source_search_engine_spark.plans.exec import search
    from tools._bench_common import ensure_corpus

    shutil.rmtree(root, ignore_errors=True)
    # materialize the corpus once as parquet — the realistic input shape
    # (an Iceberg source table per input_hint); synthesis cost is data-gen,
    # not engine throughput.  The doc count joins the dir name and
    # ensure_corpus's marker gates reuse (ONE copy of that protocol,
    # shared with the scaling tools).
    docs = ensure_corpus(spark, n_docs, f"{root}_src{n_docs}")
    t0 = time.time()
    idx = build_index(spark, docs, root, n_shards=n_shards, bigram_terms=True)
    build_secs = time.time() - t0
    # second build WITHOUT bigram pair terms: the round-2-comparable
    # docs/sec (bigrams roughly double posting volume, so the full-featured
    # build's docs/sec is ~half at equal postings/sec)
    shutil.rmtree(f"{root}_nobi", ignore_errors=True)
    t0 = time.time()
    idx_nobi = build_index(spark, docs, f"{root}_nobi", n_shards=n_shards)
    build_nobi_secs = time.time() - t0
    # density of the WORD-term index (the BASELINE.md 6-12 B/posting
    # band is quoted for word postings; bigram pair terms are rare and
    # delta-compress worse, so the full-featured index reads higher)
    from open_source_search_engine_spark.operators.stats import describe_index

    nobi_p = describe_index(spark, idx_nobi).get("postings", {})
    shutil.rmtree(f"{root}_nobi", ignore_errors=True)
    # WAND covers AND + OR-groups since round 2; the exhaustive plan is
    # timed separately on the same queries, and quoted phrases (bigram
    # pair-termlist fast path, r3) get their own series
    queries = [
        "def return",
        "binarysearchtree",
        "import class self",
        "fn OR func",
    ]
    phrase_queries = ['"def return"', '"import class"']
    lat: dict[str, list[float]] = {"wand": [], "exhaustive": [], "phrase": []}
    for q in queries * 2:  # warm (2 rounds: parquet cache + codegen)
        search_wand(spark, idx, q, k=10).collect()
        search(spark, idx, q, k=10).collect()
    for q in phrase_queries:
        search(spark, idx, q, k=10).collect()
    for _ in range(3):
        for q in queries:
            t0 = time.time()
            search_wand(spark, idx, q, k=10).collect()
            lat["wand"].append((time.time() - t0) * 1000)
            t0 = time.time()
            search(spark, idx, q, k=10).collect()
            lat["exhaustive"].append((time.time() - t0) * 1000)
        for q in phrase_queries:
            t0 = time.time()
            search(spark, idx, q, k=10).collect()
            lat["phrase"].append((time.time() - t0) * 1000)
    # batch path: 32 distinct queries in ONE job (Msg39 multicast analog)
    # — the amortized per-query cost once the local-mode dispatch floor is
    # shared across a batch
    from itertools import combinations

    from open_source_search_engine_spark.operators.topk import search_wand_batch

    pool = ["def", "return", "class", "self", "import", "fn", "func", "static"]
    batch_qs = [f"{a} {b}" for a, b in combinations(pool, 2)][:28] + [
        "def",
        "return",
        "fn OR func",
        "class -static",
    ]
    search_wand_batch(spark, idx, batch_qs, k=10).collect()  # warm
    bt = []
    for _ in range(3):
        t0 = time.time()
        search_wand_batch(spark, idx, batch_qs, k=10).collect()
        bt.append(time.time() - t0)
    batch_secs = statistics.median(bt)

    # phrase through the WAND kernel (r4: pair-termlist slots +
    # in-kernel positional verify — no fallback to the general plan)
    for q in phrase_queries:
        search_wand(spark, idx, q, k=10).collect()
    lat_pk: list[float] = []
    for _ in range(3):
        for q in phrase_queries:
            t0 = time.time()
            search_wand(spark, idx, q, k=10).collect()
            lat_pk.append((time.time() - t0) * 1000)

    # post-compaction path (r4: compaction preserves the doc-shard
    # scatter — the kernel must still fan out, and latency must not
    # regress vs the fresh multi-segment index)
    from open_source_search_engine_spark.operators.merge import (
        compact_postings,
        delete_docs,
    )

    victims = [r["doc_id"] for r in idx.docstats.read(spark).limit(20).collect()]
    delete_docs(spark, idx, victims)
    t0 = time.time()
    compact_postings(spark, idx)
    compact_secs = time.time() - t0
    compact_shards = idx.postings.read(spark).select("shard").distinct().count()
    for q in queries:
        search_wand(spark, idx, q, k=10).collect()
    lat_comp: list[float] = []
    for _ in range(3):
        for q in queries:
            t0 = time.time()
            search_wand(spark, idx, q, k=10).collect()
            lat_comp.append((time.time() - t0) * 1000)

    # serp result cache (Msg17 analog): repeated-query latency
    for q in queries:
        search_wand(spark, idx, q, k=10, use_cache=True).collect()
    lat_c = []
    for _ in range(3):
        for q in queries:
            t0 = time.time()
            search_wand(spark, idx, q, k=10, use_cache=True).collect()
            lat_c.append((time.time() - t0) * 1000)
    both = sorted(lat["wand"] + lat["exhaustive"])
    # measured posting density (north-star compression claim): block
    # metadata only, one pruned-column agg — keeps the ~7 B/posting
    # number continuously measured instead of asserted
    pstats = describe_index(spark, idx).get("postings", {})
    return {
        "bytes_per_posting": pstats.get("bytes_per_posting", 0.0),
        "bytes_per_posting_core": pstats.get("bytes_per_posting_core", 0.0),
        "bytes_per_occurrence_total": pstats.get(
            "bytes_per_occurrence_total", 0.0
        ),
        "bytes_per_occurrence_total_nobigram": nobi_p.get(
            "bytes_per_occurrence_total", 0.0
        ),
        "postings_total": pstats.get("postings", 0),
        "cached_p50_ms": round(statistics.median(lat_c), 1),
        "build_secs": round(build_secs, 2),
        "docs_per_sec": round(n_docs / build_secs, 2),
        "docs_per_sec_nobigram": round(n_docs / build_nobi_secs, 2),
        "query_p50_ms": round(statistics.median(both), 1),
        "query_p95_ms": round(both[int(len(both) * 0.95) - 1], 1),
        "wand_p50_ms": round(statistics.median(lat["wand"]), 1),
        "phrase_kernel_p50_ms": round(statistics.median(lat_pk), 1),
        "compact_secs": round(compact_secs, 2),
        "compacted_shards": int(compact_shards),
        "compacted_wand_p50_ms": round(statistics.median(lat_comp), 1),
        "batch32_secs": round(batch_secs, 3),
        "batch_amortized_ms": round(batch_secs / len(batch_qs) * 1000, 1),
        "exhaustive_p50_ms": round(statistics.median(lat["exhaustive"]), 1),
        "phrase_p50_ms": round(statistics.median(lat["phrase"]), 1),
    }


def main():
    from open_source_search_engine_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    if "--scaling" in sys.argv:
        results = {}
        for c in (8, 32):
            spark = get_spark(app_name=f"bench{c}", cores=c)
            r = run_index_build(spark, N_BENCH_DOCS, f"/tmp/bench_idx_{c}", n_shards=2)
            results[c] = r
            spark.stop()
            time.sleep(2)
        eff = (results[32]["docs_per_sec"] / results[8]["docs_per_sec"]) / (32 / 8)
        print(json.dumps({"scaling": results, "efficiency": round(eff, 3)}))
        return

    spark = get_spark(app_name="bench", cores=cores)
    times, cold_secs = run_headline(spark, sf_dir)
    extras = run_extras(spark, sf_dir)
    build = run_index_build(
        spark, N_BENCH_DOCS, "/tmp/bench_idx", n_shards=2
    )
    out = {
        "metric": "headline_query_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "extras": extras,
        "headline_cold_secs": cold_secs,
        "sf": sf,
        "build_docs_per_sec": build["docs_per_sec"],
        "build_docs_per_sec_nobigram": build["docs_per_sec_nobigram"],
        "index_build_secs": build["build_secs"],
        "bytes_per_posting": build["bytes_per_posting"],
        "bytes_per_posting_core": build["bytes_per_posting_core"],
        "bytes_per_occurrence_total": build["bytes_per_occurrence_total"],
        "bytes_per_occurrence_total_nobigram": build[
            "bytes_per_occurrence_total_nobigram"
        ],
        "postings_total": build["postings_total"],
        "bench_docs": N_BENCH_DOCS,
        "query_p50_ms": build["query_p50_ms"],
        "query_p95_ms": build["query_p95_ms"],
        "wand_p50_ms": build["wand_p50_ms"],
        "batch32_secs": build["batch32_secs"],
        "batch_amortized_ms": build["batch_amortized_ms"],
        "exhaustive_p50_ms": build["exhaustive_p50_ms"],
        "phrase_p50_ms": build["phrase_p50_ms"],
        "phrase_kernel_p50_ms": build["phrase_kernel_p50_ms"],
        "compact_secs": build["compact_secs"],
        "compacted_shards": build["compacted_shards"],
        "compacted_wand_p50_ms": build["compacted_wand_p50_ms"],
        "cached_p50_ms": build["cached_p50_ms"],
        "cores": cores,
    }
    # attach the latest interleaved scaling measurement if one exists
    # (produced by tools/scaling_interleaved.py; see BENCH/BASELINE.md).
    # the checked-in BENCH/ copy (committed with the code it measured) is
    # authoritative; a /tmp run is the fallback for local iteration.
    here = os.path.dirname(os.path.abspath(__file__))
    for paths, key in [
        (
            (
                os.path.join(here, "BENCH", "scaling_interleaved.json"),
                "/tmp/scaling_interleaved.json",
            ),
            "scaling",
        ),
        (
            (
                os.path.join(here, "BENCH", "profile_build.json"),
                "/tmp/profile_build.json",
            ),
            "stage_profile",
        ),
    ]:
        for path in paths:
            try:
                with open(path) as f:
                    d = json.load(f)
                d.pop("runs", None)
                out[key] = d
                break
            except Exception:
                pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
