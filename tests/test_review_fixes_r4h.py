"""Review sweep H2 (query-core review, late r4): regression tests for
the fixed findings — phrase user weights were silently dropped on BOTH
paths, k<=0 crashed the WAND kernel, and the batch non-enrich output had
no deterministic ordering."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.build import build_index
from open_source_search_engine_spark.operators.topk import (
    search_wand,
    search_wand_batch,
)
from open_source_search_engine_spark.plans.exec import search

SCHEMA = "repo string, path string, commit string, lang string, content string"

DOCS = [
    ("r/0", "a.py", "c1", "python", "fast lookup table fast extra"),
    ("r/0", "b.py", "c2", "python", "quick lookup table words here"),
    ("r/1", "c.py", "c3", "python", "fast quick lookup table scan"),
    ("r/1", "d.py", "c4", "python", "slow scan list lookup table"),
    ("r/2", "e.py", "c5", "python", "table scan quick quick lookup"),
]


@pytest.fixture(scope="module")
def widx(spark, tmp_path_factory):
    return build_index(
        spark,
        spark.createDataFrame(DOCS, SCHEMA),
        str(tmp_path_factory.mktemp("rf4h")),
        n_shards=2,
        code_aware=False,
        block_size=4,
        bigram_terms=True,
    )


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_phrase_user_weight_scales_and_paths_agree(spark, widx):
    """'"lookup table"^3 scan' must outrank-scale the phrase tokens vs
    the unweighted form, identically on the WAND and exhaustive paths."""
    plain_w = _rows(search_wand(spark, widx, '"lookup table" scan', k=5, enrich=False))
    boost_w = _rows(search_wand(spark, widx, '"lookup table"^3 scan', k=5, enrich=False))
    boost_x = _rows(search(spark, widx, '"lookup table"^3 scan', k=5, enrich=False))
    assert boost_w == boost_x, "weighted phrase: WAND != exhaustive"
    assert plain_w != boost_w, "phrase ^3 weight was dropped (scores unchanged)"
    # weight scales idf: every match's score strictly increases
    assert all(b > p for (_, p), (_, b) in zip(plain_w, boost_w))


def test_phrase_weight_changes_ranking_not_matches(spark, widx):
    plain = {d for d, _ in _rows(search_wand(spark, widx, '"lookup table" scan', k=5, enrich=False))}
    boost = {d for d, _ in _rows(search_wand(spark, widx, '"lookup table"^3 scan', k=5, enrich=False))}
    assert plain == boost  # same match set, different scores


def test_k_zero_returns_empty_both_paths(spark, widx):
    w = search_wand(spark, widx, "table", k=0, enrich=True)
    x = search(spark, widx, "table", k=0, enrich=True)
    assert w.count() == 0 and x.count() == 0
    assert w.columns == x.columns
    b = search_wand_batch(spark, widx, ["table", "lookup"], k=0, enrich=True)
    assert b.count() == 0
    assert b.columns == ["query", "doc_id", "score", "repo", "path", "lang"]


def test_batch_nonenrich_ordering_is_deterministic(spark, widx):
    rows = search_wand_batch(
        spark, widx, ["table", "lookup scan"], k=5, enrich=False
    ).collect()
    keys = [(r["query"], -r["score"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys), "batch non-enrich output must be ordered"


def test_proximity_overlapping_slots_no_null_score(spark, widx):
    """'table "table scan"' makes slot positions overlap: minspan <
    n_slots-1, which un-clamped divides by zero (NULL score, doc sorts
    last) — the clamp keeps every score finite and positive."""
    rows = search(
        spark, widx, 'table "table scan"', k=5, proximity_bonus=0.5
    ).collect()
    assert rows, "query should match"
    for r in rows:
        assert r["score"] is not None and r["score"] > 0


def test_phrase_in_or_group_requires_pair_support(spark, widx, tmp_path):
    # 2-token phrase member inside an OR group works on a bigram index
    # (adjacency via the pair termlist)...
    got = {
        r["doc_id"]
        for r in search(spark, widx, 'scan "lookup table" OR missingzz', k=10).collect()
    }
    pair = {
        r["doc_id"]
        for r in search(spark, widx, 'scan "lookup table"', k=10).collect()
    }
    assert got == pair
    # ...3+-token phrases in OR groups refuse loudly on both paths
    with pytest.raises(NotImplementedError):
        search(spark, widx, '"fast lookup table" OR scan', k=5)
    with pytest.raises(NotImplementedError):
        search_wand(spark, widx, '"fast lookup table" OR scan', k=5)
    # ...and a bigram-less index refuses the 2-token case instead of
    # silently dropping the member
    nobi = build_index(
        spark,
        spark.createDataFrame(DOCS, SCHEMA),
        str(tmp_path / "nobi"),
        n_shards=1,
        code_aware=False,
        block_size=4,
    )
    with pytest.raises(NotImplementedError):
        search(spark, nobi, 'scan "lookup table" OR words', k=5)


def test_negated_phrase_honored_or_refused(spark, widx, tmp_path):
    # on a bigram index, '-"lookup table"' excludes exactly the
    # adjacency matches (d.py has 'lookup table' adjacent; e.py has both
    # words but not adjacent)
    base = {
        r["doc_id"]: r["path"]
        for r in search_wand(spark, widx, "scan", k=10).collect()
    }
    neg = {
        r["path"]
        for r in search_wand(spark, widx, 'scan -"lookup table"', k=10).collect()
    }
    assert "e.py" in neg and "d.py" not in neg and "c.py" not in neg
    # exhaustive path agrees
    neg_x = {
        r["path"]
        for r in search(spark, widx, 'scan -"lookup table"', k=10).collect()
    }
    assert neg_x == neg
    # a bigram-less index cannot honor it -> refuse, don't no-op
    nobi = build_index(
        spark,
        spark.createDataFrame(DOCS, SCHEMA),
        str(tmp_path / "nobi2"),
        n_shards=1,
        code_aware=False,
        block_size=4,
    )
    with pytest.raises(NotImplementedError):
        search(spark, nobi, 'scan -"lookup table"', k=5)
    with pytest.raises(NotImplementedError):
        search_wand(spark, nobi, 'scan -"lookup table"', k=5)


def test_empty_corpus_index_returns_empty_not_typeerror(spark, tmp_path):
    idx = build_index(
        spark,
        spark.createDataFrame([], SCHEMA),
        str(tmp_path / "empty"),
        n_shards=1,
        code_aware=False,
    )
    assert search(spark, idx, "anything", k=5).count() == 0


def test_negative_k_matches_zero_k(spark, widx):
    assert search(spark, widx, "table", k=-1).count() == 0
    assert search_wand(spark, widx, "table", k=-1, enrich=False).count() == 0
