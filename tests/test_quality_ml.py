"""quality_ml: bigram-LM perplexity + integer-exact hashed perceptron.

The LM tests hand-compute add-1 bigram probabilities on a 3-doc corpus;
the perceptron tests replay training in pure Python/numpy over the same
hashed features and assert bit-identical weights (the integer-exactness
property the DuckDB oracle relies on), plus convergence on a linearly
separable corpus and partitioning invariance.
"""

import math

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import quality_ml as qml


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "the cat sat", "en"),
        (2, "the cat ran", "en"),
        (3, "xx yy", "de"),
        (4, "solo", "en"),  # 1 token -> no bigram, excluded from scoring
        (5, "", "de"),  # empty -> excluded
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lm_hand_computed(spark, tiny_docs):
    # train on en docs: bigrams {the cat:2, cat sat:1, cat ran:1};
    # contexts {the:2, cat:2}; vocab = |{the,cat,sat,ran,solo}| + 1 = 6
    lm = qml.train_bigram_lm(tiny_docs.where("lang = 'en'"))
    assert lm.vocab == 6
    pc = {(r.w1, r.w2): r.c12 for r in lm.pair_counts.collect()}
    assert pc == {("the", "cat"): 2, ("cat", "sat"): 1, ("cat", "ran"): 1}
    cc = {r.w1: r.c1 for r in lm.ctx_counts.collect()}
    assert cc == {"the": 2, "cat": 2}

    out = {
        r.doc_id: r
        for r in qml.score_docs_lm(tiny_docs, lm).collect()
    }
    # docs 4 (1 token) and 5 (empty) carry no bigram -> excluded
    assert set(out) == {1, 2, 3}
    # doc 1: ln(3/8) + ln(2/8); doc 3 (all OOV): 1 bigram at ln(1/6)
    exp1 = (math.log(3.0 / 8.0) + math.log(2.0 / 8.0)) / 2.0
    assert out[1].n_bigrams == 2
    assert abs(out[1].avg_logprob - exp1) < 1e-12
    assert abs(out[3].avg_logprob - math.log(1.0 / 6.0)) < 1e-12
    assert abs(out[1].perplexity - math.exp(-exp1)) < 1e-9
    # in-domain text scores strictly better than OOV text
    assert out[1].avg_logprob > out[3].avg_logprob


def test_lm_repeated_bigram_weighting(spark):
    # 'a a a' has the bigram (a,a) twice: cnt weighting must count both
    docs = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
    lm = qml.train_bigram_lm(docs)
    out = qml.score_docs_lm(docs, lm).collect()[0]
    assert out.n_bigrams == 2
    # P(a|a) = (2+1)/(2+1*2) = 3/4
    assert abs(out.avg_logprob - math.log(3.0 / 4.0)) < 1e-12


@pytest.fixture(scope="module")
def separable_docs(spark):
    # 'good' tokens => +1, 'bad' tokens => -1; linearly separable by
    # construction so the perceptron must fit the training set
    rows = []
    for i in range(20):
        rows.append((i, f"good great fine token{i % 5}", 1))
    for i in range(20, 40):
        rows.append((i, f"bad awful poor token{i % 5}", -1))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def _py_perceptron(feat_rows, label_map, epochs):
    """Driver-side replay of train_perceptron's exact integer math."""
    from collections import defaultdict

    docs = defaultdict(list)
    for doc_id, bucket, cnt in feat_rows:
        docs[doc_id].append((bucket, cnt))
    w: dict[int, int] = defaultdict(int)
    for _ in range(epochs):
        bad = [
            d
            for d, f in docs.items()
            if label_map[d] * sum(c * w[b] for b, c in f) <= 0
        ]
        for d in bad:
            for b, c in docs[d]:
                w[b] += label_map[d] * c
    return {b: v for b, v in w.items() if v != 0 or b in w}


def test_perceptron_matches_python_replay(spark, separable_docs):
    feats = qml.hashed_features(separable_docs, dim=512)
    labels = separable_docs.select("doc_id", "y")
    w = qml.train_perceptron(feats, labels, epochs=3)
    rows = [(r.doc_id, r.bucket, r.cnt) for r in feats.collect()]
    ymap = {r.doc_id: r.y for r in labels.collect()}
    expect = _py_perceptron(rows, ymap, 3)
    assert {b: v for b, v in w.items()} == dict(expect)


def test_perceptron_separates_training_set(spark, separable_docs):
    feats = qml.hashed_features(separable_docs, dim=512)
    labels = separable_docs.select("doc_id", "y")
    w = qml.train_perceptron(feats, labels, epochs=5)
    scored = qml.score_linear(feats, w).join(labels, "doc_id")
    wrong = scored.where(F.col("y") * F.col("margin") <= 0).count()
    assert wrong == 0


def test_perceptron_partitioning_invariant(spark, separable_docs):
    labels = separable_docs.select("doc_id", "y")
    w1 = qml.train_perceptron(
        qml.hashed_features(separable_docs.repartition(1), dim=512),
        labels,
        epochs=3,
    )
    w13 = qml.train_perceptron(
        qml.hashed_features(separable_docs.repartition(13), dim=512),
        labels,
        epochs=3,
    )
    assert w1 == w13


def test_hashed_features_dim_must_be_pow2(spark, separable_docs):
    with pytest.raises(AssertionError):
        qml.hashed_features(separable_docs, dim=500)


def test_score_linear_unseen_bucket_is_zero(spark):
    # a doc whose tokens all hash to buckets absent from w scores 0
    docs = spark.createDataFrame(
        [(1, "zzz qqq")], "doc_id long, text string"
    )
    feats = qml.hashed_features(docs, dim=512)
    out = qml.score_linear(feats, {}).collect()
    assert [(r.doc_id, r.margin) for r in out] == [(1, 0)]
