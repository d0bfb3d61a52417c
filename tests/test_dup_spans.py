"""Cross-doc duplicated-span accounting (substring-dedup at n-gram
resolution): hand-checked interval-union math, within-doc-only repetition
excluded by the distinct-doc bar, and short-doc degenerate cases."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.dedup import (
    dup_span_doc_stats,
    dup_span_positions,
)

N = 3  # 3-grams keep the hand math small


def _stats(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dup_span_doc_stats(df, n=N, min_docs=2, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_overlapping_intervals_union_exact(spark):
    # docs 1 and 2 share 3-grams "a b c" (pos 0) and "b c d" (pos 1):
    # union of [0,3) and [1,4) covers 4 tokens, not 6.
    got = _stats(
        spark,
        [(1, "a b c d e"), (2, "a b c d z")],
    )
    for d in (1, 2):
        assert got[d]["dup_ngrams"] == 2
        assert got[d]["covered_tokens"] == 4
        assert got[d]["n_tokens"] == 5
        assert got[d]["total_ngrams"] == 3


def test_disjoint_intervals_sum(spark):
    # shared grams at pos 0 and pos 4 of doc 1 (gap > n): 3 + 3 tokens.
    got = _stats(
        spark,
        [(1, "a b c q x y z p"), (2, "a b c"), (3, "x y z")],
    )
    assert got[1]["dup_ngrams"] == 2
    assert got[1]["covered_tokens"] == 6


def test_within_doc_repetition_not_counted(spark):
    # "q q q" recurs 6 times inside doc 1 but in no other doc -> with
    # min_docs=2 nothing is a duplicated span.
    got = _stats(
        spark,
        [(1, "q q q q q q q q"), (2, "a b c d")],
    )
    assert got[1]["dup_ngrams"] == 0
    assert got[1]["covered_tokens"] == 0
    assert got[2]["dup_ngrams"] == 0


def test_short_docs_degenerate(spark):
    # fewer than n tokens: zero n-grams, zero coverage, doc still present.
    got = _stats(
        spark,
        [(1, "a b"), (2, ""), (3, "a b c"), (4, "a b c")],
    )
    assert got[1]["total_ngrams"] == 0 and got[1]["covered_tokens"] == 0
    assert got[2]["n_tokens"] == 0 and got[2]["total_ngrams"] == 0
    # docs 3 and 4 are fully duplicated 3-token docs
    assert got[3]["dup_ngrams"] == 1 and got[3]["covered_tokens"] == 3


def test_majority_dup_inequality(spark):
    # doc 1: 5 tokens, 4 covered -> 2*4 > 5 majority-duplicated.
    # doc 3: 8 tokens, 3 covered -> 2*3 <= 8 not majority.
    got = _stats(
        spark,
        [(1, "a b c d e"), (2, "a b c d"), (3, "a b c u v w x y")],
    )
    assert 2 * got[1]["covered_tokens"] > got[1]["n_tokens"]
    assert 2 * got[3]["covered_tokens"] <= got[3]["n_tokens"]


def test_keep_cols_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "a b c", "de")],
        "doc_id long, text string, lang string",
    )
    out = dup_span_doc_stats(df, n=N, min_docs=2, keep_cols=("lang",))
    got = {r["doc_id"]: r["lang"] for r in out.collect()}
    assert got == {1: "en", 2: "de"}


def test_positions_min_docs_bar(spark):
    # raising min_docs to 3 drops a gram shared by only 2 docs.
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")],
        "doc_id long, text string",
    )
    assert dup_span_positions(df, n=N, min_docs=2).count() == 2
    assert dup_span_positions(df, n=N, min_docs=3).count() == 0


def _clean(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from open_source_search_engine_spark.operators.dedup import remove_dup_spans

    out = remove_dup_spans(df, n=N, min_docs=2, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_remove_keeps_order_and_survivors(spark):
    # docs 1/2 share "a b c": those 3 tokens go, the rest stay in order.
    got = _clean(spark, [(1, "x a b c y z"), (2, "a b c")])
    assert got[1]["kept_text"] == "x y z"
    assert got[1]["n_tokens"] == 6 and got[1]["kept_tokens"] == 3
    assert got[2]["kept_text"] == "" and got[2]["kept_tokens"] == 0


def test_remove_overlapping_spans_union(spark):
    # shared 3-grams at pos 0 and 1 of a 5-token doc: union covers 4
    # tokens, the 5th survives.
    got = _clean(spark, [(1, "a b c d e"), (2, "a b c d z")])
    assert got[1]["kept_text"] == "e"
    assert got[2]["kept_text"] == "z"


def test_remove_untouched_doc_roundtrips_tokens(spark):
    got = _clean(spark, [(1, "Hello, World! 42"), (2, "q w e")])
    # no cross-doc dup: text rebuilt from the token stream (lowercased,
    # punct-free) — the documented token-domain rewrite, not a byte copy
    assert got[1]["kept_text"] == "hello world 42"
    assert got[1]["kept_tokens"] == got[1]["n_tokens"] == 3


def test_null_text_guard(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a b c"), (3, "a b c")],
        "doc_id long, text string",
    )
    from open_source_search_engine_spark.operators.dedup import (
        dup_span_doc_stats,
        remove_dup_spans,
    )

    stats = {r["doc_id"]: r.asDict()
             for r in dup_span_doc_stats(df, n=N, min_docs=2).collect()}
    assert stats[1]["n_tokens"] == 0 and stats[1]["covered_tokens"] == 0
    clean = {r["doc_id"]: r.asDict()
             for r in remove_dup_spans(df, n=N, min_docs=2).collect()}
    assert clean[1]["kept_text"] == "" and clean[1]["kept_tokens"] == 0


def test_rewrite_plan_never_shuffles_token_arrays(spark):
    """Scale invariant (r4 review): the rewrite stage's one exchange
    moves RAW text keyed by doc_id; the tokenizer Project sits ABOVE the
    coverage join and is evaluated once post-shuffle.  A regression that
    tokenizes before the join would exchange token arrays — strictly
    more bytes than the text they came from."""
    from open_source_search_engine_spark.operators.dedup import remove_dup_spans

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d z")], "doc_id long, text string"
    )
    plan = (
        remove_dup_spans(df, n=N, min_docs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one coverage join, fed raw text (the _text projection)
    assert plan.count("LeftOuter") == 1
    assert "AS _text" in plan
    # top-down print order: the rewrite tokenizer Project must appear
    # before (above) the LeftOuter join; the only other _tk producers
    # are the gram-side scans deeper in the tree
    assert plan.index("AS _tk") < plan.index("LeftOuter")
