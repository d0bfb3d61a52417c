"""Train/test decontamination (operators/decontam.py).

Hand-checkable micro corpus: doc 1 embeds an exact 8-gram from the eval
doc, doc 2 shares only shorter fragments, doc 3 is clean.
"""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.decontam import (
    decontaminate,
    decontaminate_semantic,
    decontaminate_semantic_matmul,
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


# --- semantic (embedding-cosine) decontamination ---------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    train = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),     # identical to eval 100 -> cosine 1.0
            (2, [0.9, 0.1, 0.0]),     # near eval 100
            (3, [0.0, 0.0, 1.0]),     # orthogonal to both eval vecs
            (4, None),                # NULL vector -> never flagged
            (5, [1.0, 0.0]),          # dim mismatch -> never flagged
            (6, [-1.0, 0.0, 0.0]),    # anti-parallel -> cosine -1
        ],
        "vec_id long, embedding array<double>",
    )
    test = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    return train, test


def test_semantic_flags_by_cosine(vectors):
    train, test = vectors
    rep = {
        r["vec_id"]: r
        for r in decontaminate_semantic(train, test, threshold=0.5).collect()
    }
    assert set(rep) == {1, 2}
    assert rep[1]["max_cosine"] == pytest.approx(1.0)
    assert rep[1]["n_hits"] == 1  # only eval 100; eval 101 is orthogonal
    assert 0.5 <= rep[2]["max_cosine"] < 1.0


def test_semantic_matmul_parity(vectors):
    """The Arrow/BLAS kernel must reproduce the expression path's report
    exactly (same 4dp rounding grid, same NULL/dim-mismatch drops)."""
    train, test = vectors
    a = sorted(
        tuple(r) for r in decontaminate_semantic(train, test, threshold=0.3).collect()
    )
    b = sorted(
        tuple(r)
        for r in decontaminate_semantic_matmul(train, test, threshold=0.3).collect()
    )
    assert a == b
    assert len(a) >= 2


def test_semantic_matmul_parity_on_fixture(spark):
    """Parity on the real embeddings fixture (500 vecs, 50-vec eval
    split) — the configuration the registry entry runs."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    is_eval = F.col("vec_id") % 10 == 0
    tr, ev = emb.where(~is_eval), emb.where(is_eval)
    a = sorted(
        tuple(r)
        for r in decontaminate_semantic(tr, ev, "vec_id", "embedding", 0.3).collect()
    )
    b = sorted(
        tuple(r)
        for r in decontaminate_semantic_matmul(
            tr, ev, "vec_id", "embedding", 0.3
        ).collect()
    )
    assert a == b
    assert len(a) > 0


def test_semantic_train_side_not_shuffled(vectors):
    """Scale invariant: eval matrix broadcast into a nested-loop join —
    no exchange of the train scan before the (tiny) aggregate."""
    train, test = vectors
    plan = (
        decontaminate_semantic(train, test)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
