"""r4 (r3 verdict #3): search_wand_batch degrades instead of raising.

- tombstone sets above MAX_DEAD_INLINE: the batch runs through the
  per-query exhaustive union (distributed anti-join handles any delete
  volume) with results identical to per-query search();
- lang_boost >= 1 rides the kernel's boost tid batch-wide; < 1 degrades
  to the exhaustive union (post-scoring multiplier).
"""

import shutil

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import topk as T
from open_source_search_engine_spark.operators.build import Index
from open_source_search_engine_spark.operators.merge import delete_docs
from open_source_search_engine_spark.operators.topk import (
    search_wand,
    search_wand_batch,
)
from open_source_search_engine_spark.plans.exec import search


def _by_query(rows):
    got = {}
    for r in rows:
        got.setdefault(r["query"], []).append((r["doc_id"], round(r["score"], 9)))
    return {q: sorted(v, key=lambda x: (-x[1], x[0])) for q, v in got.items()}


BATCH = ["binary search", "hash", "search -tree", "binary OR linear"]


def test_batch_tombstone_overflow_degrades(spark, micro_index, tmp_path, monkeypatch):
    """A tombstone set too large for the in-kernel dead array must not
    raise (r3 behavior): the batch answers through the exhaustive union.
    One tombstone is REAL (a doc matching the queries), so the test also
    proves the fallback actually excludes deletes."""
    root = str(tmp_path / "batchcap")
    shutil.copytree(micro_index.root, root)
    idx = Index(root)
    victim = (
        micro_index.docstats.read(spark)
        .filter(F.col("path") == "a.py")
        .collect()[0]["doc_id"]
    )
    delete_docs(spark, idx, [victim, 111, 222, 333])
    monkeypatch.setattr(T, "MAX_DEAD_INLINE", 2)
    got = _by_query(search_wand_batch(spark, idx, BATCH, k=10).collect())
    for q in BATCH:
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in search(spark, idx, q, k=10, enrich=False).collect()
        ]
        assert got.get(q, []) == want, q
    assert all(victim not in {d for d, _ in v} for v in got.values())


def test_batch_many_synthetic_tombstones(spark, micro_index, tmp_path):
    """200k tombstones (ids mostly absent from the corpus — volume is
    what matters) + a batch: returns correct results without compaction,
    the r3 verdict's literal done-criterion."""
    root = str(tmp_path / "batch200k")
    shutil.copytree(micro_index.root, root)
    idx = Index(root)
    delete_docs(spark, idx, list(range(1_000_000, 1_200_000)))
    got = _by_query(search_wand_batch(spark, idx, BATCH, k=10).collect())
    for q in BATCH:
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in search(spark, idx, q, k=10, enrich=False).collect()
        ]
        assert got.get(q, []) == want, q
    assert sum(len(v) for v in got.values()) > 0


def test_batch_lang_boost_kernel(spark, micro_index):
    """factor >= 1: boost rides the batch kernel (no fallback), matching
    per-query search_wand with the same boost."""
    got = _by_query(
        search_wand_batch(
            spark, micro_index, BATCH, k=10, lang_boost=("go", 1.5)
        ).collect()
    )
    changed = False
    for q in BATCH:
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in search_wand(
                spark, micro_index, q, k=10, enrich=False, lang_boost=("go", 1.5)
            ).collect()
        ]
        plain = [
            (r["doc_id"], round(r["score"], 9))
            for r in search_wand(spark, micro_index, q, k=10, enrich=False).collect()
        ]
        assert got.get(q, []) == want, q
        changed = changed or (want != plain)
    assert changed  # the boost demonstrably moved at least one ranking


def test_batch_lang_boost_below_one_degrades(spark, micro_index):
    """factor < 1 is unsound for the kernel's prune bound — the batch
    must degrade to the exhaustive union and match search() exactly."""
    got = _by_query(
        search_wand_batch(
            spark, micro_index, BATCH, k=10, lang_boost=("python", 0.5)
        ).collect()
    )
    for q in BATCH:
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in search(
                spark, micro_index, q, k=10, enrich=False,
                lang_boost=("python", 0.5),
            ).collect()
        ]
        assert got.get(q, []) == want, q


def test_batch_empty_dictionary_enriched_schema(spark, micro_index):
    """ADVICE r3: enrich=True with no query term in the dictionary must
    return the full enriched schema, not the bare one."""
    df = search_wand_batch(
        spark, micro_index, ["zzzmissing"], k=5, enrich=True
    )
    assert df.columns == ["query", "doc_id", "score", "repo", "path", "lang"]
    assert df.count() == 0
