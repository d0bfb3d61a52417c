"""Deterministic sampling: quotas, replayability, partitioning-invariance."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.sampling import (
    hash_fraction_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"text number {i * 37 % 101}", ["en", "de", "zh"][i % 3]) for i in range(120)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_stratified_quota_respected(corpus):
    out = stratified_sample(corpus, "lang", 5, "text", "doc_id")
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"en": 5, "de": 5, "zh": 5}


def test_stratified_small_stratum_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "en"), (3, "c", "de")],
        "doc_id long, text string, lang string",
    )
    out = stratified_sample(df, "lang", 5, "text", "doc_id")
    assert out.count() == 3


def test_stratified_partitioning_invariant(corpus):
    a = stratified_sample(corpus, "lang", 4, "text", "doc_id")
    b = stratified_sample(corpus.repartition(17), "lang", 4, "text", "doc_id")
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_hash_fraction_deterministic_and_stable_under_growth(corpus):
    kept_small = {
        r.doc_id for r in hash_fraction_sample(corpus.limit(60), "text", 0.5).collect()
    }
    kept_full = {r.doc_id for r in hash_fraction_sample(corpus, "text", 0.5).collect()}
    # a row's verdict never changes when more rows arrive
    first60 = {r.doc_id for r in corpus.limit(60).collect()}
    assert kept_small == kept_full & first60


def test_hash_fraction_bounds(corpus):
    assert hash_fraction_sample(corpus, "text", 0.0).count() == 0
    assert hash_fraction_sample(corpus, "text", 1.0).count() == 120
    with pytest.raises(ValueError):
        hash_fraction_sample(corpus, "text", 1.5)


def test_hash_fraction_salt_changes_selection(corpus):
    a = {r.doc_id for r in hash_fraction_sample(corpus, "text", 0.5, salt="s1").collect()}
    b = {r.doc_id for r in hash_fraction_sample(corpus, "text", 0.5, salt="s2").collect()}
    assert a != b


def test_hash_fraction_no_shuffle(corpus):
    plan = (
        hash_fraction_sample(corpus, "text", 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
