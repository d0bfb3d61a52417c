"""Round-4 fixes (VERDICT r3 'Next round' + ADVICE items).

1. Compaction preserves doc-shard parallelism (verdict #1): the compacted
   segment re-shards by pmod(doc_id, n_shards) instead of collapsing to
   shard 0, so post-compaction WAND still scatters one kernel task per
   doc-partition.
2. engine-index cache fingerprint is content-sensitive (verdict #5).
"""

import shutil

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.build import build_index
from open_source_search_engine_spark.operators.merge import (
    compact_postings,
    delete_docs,
)
from open_source_search_engine_spark.operators.topk import search_wand
from open_source_search_engine_spark.plans.exec import search

SCHEMA = "repo string, path string, commit string, lang string, content string"

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _corpus(spark, n=40):
    rows = [
        (
            f"r/{i % 3}",
            f"f{i}.py",
            f"c{i}",
            "python",
            " ".join(WORDS[j % len(WORDS)] for j in range(i, i + 5)) + " common",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def sharded_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shardidx"))
    return build_index(
        spark,
        _corpus(spark),
        root,
        n_shards=4,
        code_aware=False,
        block_size=4,
        salt_target=8,  # force salting of the heavy 'common' term
    )


def test_compaction_preserves_doc_shards(spark, sharded_index):
    idx = sharded_index
    victims = [
        r["doc_id"]
        for r in idx.docstats.read(spark).orderBy("doc_id").limit(3).collect()
    ]
    before = {
        (r["doc_id"], round(r["score"], 6))
        for r in search(spark, idx, "common alpha", k=50, enrich=False).collect()
        if r["doc_id"] not in victims
    }
    delete_docs(spark, idx, victims)
    compact_postings(spark, idx, salt_target=8, block_size=4)

    blocks = idx.postings.read(spark)
    shard_ids = sorted(r["shard"] for r in blocks.select("shard").distinct().collect())
    # the whole point: compaction must NOT collapse to one WAND shard
    assert len(shard_ids) == 4, shard_ids
    # shard assignment is the canonical doc-hash partitioning
    decoded = blocks.limit(0)  # placeholder to keep lints quiet
    del decoded
    snap = idx.postings.latest()
    assert snap.operation == "compact" and snap.meta.get("n_shards") == 4

    # blocks are shard-pure: every (shard, term, salt, block) row's doc
    # range stays inside its shard (checked via pmod on min/max doc ids)
    bad = blocks.filter(
        (F.pmod(F.col("min_doc_id"), F.lit(4)) != F.col("shard"))
        | (F.pmod(F.col("max_doc_id"), F.lit(4)) != F.col("shard"))
    ).count()
    assert bad == 0

    # the WAND scatter actually runs >1 task: the kernel input groups by
    # shard, so distinct shard count == kernel task count
    # and, semantically, both query paths agree with the pre-delete result
    # minus the tombstoned docs (stats shift post-compaction, so compare
    # doc sets, not scores, against 'before'; WAND vs exhaustive compare
    # scores exactly)
    wand = search_wand(spark, idx, "common alpha", k=50, enrich=False).collect()
    exh = search(spark, idx, "common alpha", k=50, enrich=False).collect()
    assert {(r["doc_id"], round(r["score"], 9)) for r in wand} == {
        (r["doc_id"], round(r["score"], 9)) for r in exh
    }
    assert {r["doc_id"] for r in wand} == {d for d, _ in before}
    assert not ({r["doc_id"] for r in wand} & set(victims))


def test_compaction_salts_are_shard_local(spark, sharded_index):
    """Salting in the compacted segment uses shard-local df (what a
    per-shard build would produce): within one (shard, term) all blocks
    agree on n_salts, and salt == pmod(doc_id, n_salts) for every block's
    boundary docs — the WAND probe's routing invariant."""
    blocks = spark.createDataFrame(
        sharded_index.postings.read(spark)
        .select("shard", "term_id", "salt", "n_salts", "min_doc_id")
        .collect()
    )
    multi = (
        blocks.groupBy("shard", "term_id")
        .agg(F.countDistinct("n_salts").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert multi == 0
    bad = blocks.filter(
        F.pmod(F.col("min_doc_id"), F.col("n_salts")) != F.col("salt")
    ).count()
    assert bad == 0


def test_warm_enriched_query_job_budget(spark, sharded_index):
    """r4 hot-path work (PLANS.md §10): with snapshot-memoized reads and
    the driver-side docmeta LRU, a WARM enriched WAND query must not
    spawn more than 2 Spark jobs (the kernel+merge action, plus at most
    one AQE final-stage job) — no re-listing job, no broadcast-exchange
    job, no docmeta join scan."""
    st = spark.sparkContext.statusTracker()
    for _ in range(2):  # warm: caches, codegen, docmeta rows
        search_wand(spark, sharded_index, "common alpha", k=5).collect()
    before = set(st.getJobIdsForGroup(None))
    rows = search_wand(spark, sharded_index, "common alpha", k=5).collect()
    after = set(st.getJobIdsForGroup(None))
    assert rows
    assert len(after - before) <= 2, f"warm query ran {len(after - before)} jobs"


def test_serp_cache_hit_is_job_free(spark, sharded_index):
    """A serp-cache hit re-creates the result from pandas, which Catalyst
    plans as LocalTableScan — collecting it must dispatch ZERO Spark jobs
    (python-row input would build an ExistingRDD plan costing one job per
    hit; this was the r3 'dispatch floor' on the cached path)."""
    st = spark.sparkContext.statusTracker()
    for _ in range(2):  # populate + settle
        search_wand(
            spark, sharded_index, "common alpha", k=5, use_cache=True
        ).collect()
    before = set(st.getJobIdsForGroup(None))
    rows = search_wand(
        spark, sharded_index, "common alpha", k=5, use_cache=True
    ).collect()
    after = set(st.getJobIdsForGroup(None))
    assert rows
    assert len(after - before) == 0, f"cache hit ran {len(after - before)} jobs"


def test_corpus_fingerprint_content_sensitive(tmp_path):
    """A fixture whose text changes but whose row count and doc_id sum are
    preserved must produce a different fingerprint (rebuild trigger)."""
    import duckdb

    from open_source_search_engine_spark.engine_entries import (
        _corpus_fingerprint,
    )

    src = "/root/testdata/sf0.001"
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir()
    d2.mkdir()
    shutil.copy(f"{src}/documents.parquet", d1 / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN doc_id = 0 THEN text || ' mutated' ELSE text END AS text
          ) FROM read_parquet('{src}/documents.parquet')
        ) TO '{d2 / "documents.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    fp1 = _corpus_fingerprint(str(d1))
    fp2 = _corpus_fingerprint(str(d2))
    assert fp1["n"] == fp2["n"] and fp1["sum_doc_id"] == fp2["sum_doc_id"]
    assert fp1 != fp2  # the content digest catches the text mutation
