"""Train/test decontamination (operators/decontam.py).

Hand-checkable micro corpus: doc 1 embeds an exact 8-gram from the eval
doc, doc 2 shares only shorter fragments, doc 3 is clean.
"""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.decontam import (
    decontaminate,
    decontaminated_corpus,
)

EVAL_TEXT = "the quick brown fox jumps over the lazy dog tonight"


@pytest.fixture(scope="module")
def corpus(spark):
    train = spark.createDataFrame(
        [
            # full 8-gram overlap ("the quick ... lazy" and shifts)
            (1, "intro text the quick brown fox jumps over the lazy dog ok"),
            # 7-gram overlap only — below n=8, must NOT flag
            (2, "quick brown fox jumps over the lazy cat sleeps here now"),
            (3, "completely unrelated training document about spark shuffles"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame([(100, EVAL_TEXT)], "doc_id long, text string")
    return train, test


def test_flags_only_true_ngram_collisions(corpus):
    train, test = corpus
    rep = decontaminate(train, test, n=8).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in rep] == [1]
    # doc 1 tokens: intro text the quick brown fox jumps over the lazy dog ok
    # eval 8-grams present: "the quick brown fox jumps over the lazy" and
    # "quick brown fox jumps over the lazy dog" -> n_hit == 2
    assert rep[0]["n_hit"] == 2
    assert rep[0]["n_grams"] == 5  # 12 tokens -> 5 distinct 8-grams
    assert rep[0]["hit_ratio"] == pytest.approx(0.4)


def test_lower_n_catches_shorter_overlap(corpus):
    train, test = corpus
    rep = decontaminate(train, test, n=7)
    assert {r["doc_id"] for r in rep.collect()} == {1, 2}


def test_min_hits_threshold(corpus):
    train, test = corpus
    rep = decontaminate(train, test, n=8, min_hits=3)
    assert rep.count() == 0


def test_decontaminated_corpus_drops_flagged(corpus):
    train, test = corpus
    clean = decontaminated_corpus(train, test, n=8)
    assert sorted(r["doc_id"] for r in clean.select("doc_id").collect()) == [2, 3]


def test_eval_side_is_broadcast(corpus):
    """Scale invariant: the plan must broadcast the eval gram set — the
    train side (the 100-TB side) is never shuffled for the join."""
    train, test = corpus
    plan = decontaminate(train, test, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
