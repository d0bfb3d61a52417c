"""Composed training-data curation pipeline (operators/pipeline.py)."""

import pytest

from open_source_search_engine_spark.operators.pipeline import (
    mix_report,
    training_mix,
)

EN_PAD = "the of and to in is it on for with"  # stopword-rich filler


@pytest.fixture(scope="module")
def raw_docs(spark):
    rows = [
        # src A: 3 distinct good en docs + 1 exact duplicate of doc 0
        (0, "A", f"{EN_PAD} alpha beta gamma delta"),
        (1, "A", f"{EN_PAD} epsilon zeta eta theta"),
        (2, "A", f"{EN_PAD} iota kappa lam mu"),
        (3, "A", f"{EN_PAD} alpha beta gamma delta"),  # dup of 0
        # src B: 1 good en doc, 1 non-en doc (no stopwords), 1 low-quality
        # doc (all-repetition => diversity ~0, fails the 0.7 gate)
        (4, "B", f"{EN_PAD} nu xi omicron pi"),
        (5, "B", "uno dos tres cuatro cinco seis siete ocho nueve diez"),
        (6, "B", "the " + "spam " * 40),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_stages_compose(spark, raw_docs):
    out = training_mix(
        raw_docs, quality_min=0.7, lang="en", n_per_stratum=2
    ).collect()
    ids = [r["doc_id"] for r in out]
    # doc 3 (exact dup, larger id) is removed by dedup; 5 by language;
    # 6 by quality; quota keeps <=2 of A's three survivors
    assert 3 not in ids and 5 not in ids and 6 not in ids
    assert 4 in ids
    assert sum(1 for r in out if r["source"] == "A") == 2
    assert out == sorted(out, key=lambda r: r["doc_id"])


def test_dedup_keeps_smallest_id(spark, raw_docs):
    out = training_mix(raw_docs, quality_min=0.0, lang=None, n_per_stratum=100)
    ids = [r["doc_id"] for r in out.collect()]
    assert 0 in ids and 3 not in ids


def test_quota_is_deterministic_and_content_keyed(spark, raw_docs):
    a = training_mix(raw_docs, n_per_stratum=2).collect()
    b = training_mix(raw_docs.repartition(7), n_per_stratum=2).collect()
    assert a == b  # partitioning-invariant selection


def test_lang_none_skips_language_gate(spark, raw_docs):
    out = training_mix(raw_docs, quality_min=0.0, lang=None, n_per_stratum=100)
    assert 5 in [r["doc_id"] for r in out.collect()]


def test_mix_report_totals(spark, raw_docs):
    mix = training_mix(raw_docs, quality_min=0.7, lang="en", n_per_stratum=2)
    rep = {r["source"]: r for r in mix_report(mix).collect()}
    assert rep["A"]["n_docs"] == 2 and rep["B"]["n_docs"] == 1
    assert rep["A"]["n_tokens"] == 2 * 14  # 10 pad + 4 content tokens each


def test_single_plan_no_intermediate_actions(spark, raw_docs):
    """The composition is ONE declarative plan: building it triggers no
    Spark jobs (no .count()/.collect() between stages)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    _plan = training_mix(raw_docs, n_per_stratum=2)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert before == after
