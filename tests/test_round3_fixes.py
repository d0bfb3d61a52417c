"""Round-3 soundness fixes: lang_boost<1 WAND fallback, tombstone
dead-set cap, stats-before-finalize error, cache version eviction."""

import shutil

import pytest

from open_source_search_engine_spark.operators import topk as T
from open_source_search_engine_spark.operators.build import Index
from open_source_search_engine_spark.operators.merge import (
    _DEAD_CACHE,
    delete_docs,
    deleted_doc_ids,
)
from open_source_search_engine_spark.operators.topk import search_wand
from open_source_search_engine_spark.plans.exec import search


def _scores(df):
    return {r["doc_id"]: pytest.approx(r["score"], rel=1e-9) for r in df.collect()}


def test_lang_boost_below_one_falls_back_and_is_correct(spark, micro_index):
    # factor < 1 is unsound for the WAND prune bound: search_wand must
    # route to the exhaustive plan and produce its exact results
    want = search(
        spark, micro_index, "search", k=10, lang_boost=("python", 0.5)
    )
    got = search_wand(
        spark, micro_index, "search", k=10, lang_boost=("python", 0.5)
    )
    assert _scores(got) == _scores(want)
    # de-boost shifts ranking vs no boost (sanity that the factor applied)
    plain = search(spark, micro_index, "search", k=10)
    assert _scores(got) != _scores(plain)
    with pytest.raises(ValueError, match="unsound"):
        search_wand(
            spark,
            micro_index,
            "search",
            k=10,
            lang_boost=("python", 0.5),
            with_prune_stats=True,
        )


def test_wand_dead_cap_falls_back(spark, micro_index, tmp_path, monkeypatch):
    # above MAX_DEAD_INLINE tombstones the kernel path must not ship the
    # dead set per task; the exhaustive plan's anti-join takes over with
    # identical results
    root = str(tmp_path / "capidx")
    shutil.copytree(micro_index.root, root)
    idx = Index(root)
    delete_docs(spark, idx, [111, 222, 333])  # ids absent from the corpus
    monkeypatch.setattr(T, "MAX_DEAD_INLINE", 2)
    got = search_wand(spark, idx, "binary search", k=10)
    want = search(spark, idx, "binary search", k=10)
    assert _scores(got) == _scores(want)
    assert len(_scores(got)) > 0


def test_query_before_finalize_raises(spark, tmp_path):
    idx = Index(str(tmp_path / "emptyidx"))
    with pytest.raises(RuntimeError, match="finalized stats"):
        search(spark, idx, "anything", k=5)


def test_dead_cache_evicts_stale_versions(spark, micro_index, tmp_path):
    root = str(tmp_path / "evictidx")
    shutil.copytree(micro_index.root, root)
    idx = Index(root)
    delete_docs(spark, idx, [1])
    deleted_doc_ids(spark, idx)
    v1_keys = [k for k in _DEAD_CACHE if k[0] == root]
    assert len(v1_keys) == 1
    delete_docs(spark, idx, [2])
    deleted_doc_ids(spark, idx)
    keys = [k for k in _DEAD_CACHE if k[0] == root]
    assert len(keys) == 1 and keys[0] != v1_keys[0]
