"""Indexed regex search (plans/regex.py): literal extraction soundness +
prefilter==full-scan equivalence over a real stored index."""

import re

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.plans.regex import (
    regex_search,
    required_literal_tokens,
)


# --- extractor -------------------------------------------------------------


def test_boundary_fragments_dropped():
    # 'ret' is a PREFIX of 'return' in a matching doc — must not require it
    assert required_literal_tokens("def ret") == []


def test_interior_fragment_required():
    assert required_literal_tokens("[a-z0-9]+ join (table|index) scan") == [
        "join"
    ]


def test_top_level_alternation_requires_nothing():
    assert required_literal_tokens("alpha beta|gamma delta") == []


def test_escaped_punct_is_literal_boundary():
    assert required_literal_tokens(r"raise\.ValueError\(") == ["valueerror"]


def test_optional_char_dropped():
    assert required_literal_tokens("colou?r map x") == ["map"]


def test_brace_quantifier_conservative():
    assert required_literal_tokens("ab{2}c d e") == ["d"]


def test_plus_keeps_prev_char():
    # 'ab+ cd ef' -> runs 'ab', ' cd ef': 'cd' interior of the second run
    assert required_literal_tokens("xab+ cd ef") == ["cd"]


def test_case_folded():
    assert required_literal_tokens("(a|b) Error Code x") == ["code", "error"]


@pytest.mark.parametrize(
    "pattern,matching_text",
    [
        ("[a-z0-9]+ join (table|index) scan", "hash join table scan"),
        (r"raise\.ValueError\(", "x raise.valueerror( y"),
        ("colou?r map x", "color map x"),
        ("xab+ cd ef", "xabbb cd ef"),
        ("(a|b) error code x", "b error code x"),
        ("for [a-z]+ in range", "for i in range"),
    ],
)
def test_required_tokens_soundness(pattern, matching_text):
    """Every required token must be a full token of a matching text —
    the 100%-recall property the candidate prefilter rests on."""
    assert re.search(pattern, matching_text, re.IGNORECASE) is not None
    toks = set(re.findall("[a-z0-9]+", matching_text.lower()))
    for t in required_literal_tokens(pattern):
        assert t in toks, (pattern, t)


# --- search over the stored index ------------------------------------------


@pytest.fixture(scope="module")
def micro_corpus(spark, micro_docs):
    from open_source_search_engine_spark.operators.build import derive_ids

    return derive_ids(micro_docs)


@pytest.mark.parametrize(
    "pattern",
    [
        "[a-z]+ search tree",  # prefilter on 'search'
        "binary (search|tree|heap)",  # boundary-only literals: full scan
        "hash (map|set)",  # full scan (no interior fragment)
        "linear search [a-z]+",  # prefilter on 'search'
    ],
)
def test_prefilter_equals_full_scan(spark, micro_index, micro_corpus, pattern):
    got = {
        (r.doc_id, r.n_matches)
        for r in regex_search(
            spark, micro_index, micro_corpus, pattern
        ).collect()
    }
    want = {
        (r.doc_id, r.n)
        for r in micro_corpus.select(
            "doc_id",
            F.regexp_count("content", F.lit(pattern)).cast("long").alias("n"),
        )
        .filter(F.col("n") > 0)
        .collect()
    }
    assert got == want


def test_missing_required_token_short_circuits(spark, micro_index, micro_corpus):
    out = regex_search(
        spark, micro_index, micro_corpus, "[a-z]+ zzzqqq yyy"
    )
    assert out.count() == 0
    # and the plan never scans the corpus (empty local relation only)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan and "rlike" not in plan.lower()


def test_limit_and_order(spark, micro_index, micro_corpus):
    # 'search' appears 3x in e.rs, 1x in a.py/b.py: density order
    out = regex_search(
        spark, micro_index, micro_corpus, "search", limit=1
    ).collect()
    # boundary-only literal -> full scan; top doc is the 3x one
    assert len(out) == 1
    assert out[0].n_matches == 3


def test_tombstones_excluded(spark, micro_docs, tmp_path):
    from open_source_search_engine_spark.operators.build import (
        build_index,
        derive_ids,
    )
    from open_source_search_engine_spark.operators.merge import delete_docs

    corpus = derive_ids(micro_docs)
    idx = build_index(
        spark, micro_docs, str(tmp_path / "idx"), n_shards=1,
        code_aware=False, block_size=4, salt_target=1000,
    )
    before = {
        r.doc_id
        for r in regex_search(spark, idx, corpus, "[a-z]+ search tree").collect()
    }
    assert before  # the a.py doc matches
    victim = sorted(before)[0]
    delete_docs(spark, idx, [victim])
    after = {
        r.doc_id
        for r in regex_search(spark, idx, corpus, "[a-z]+ search tree").collect()
    }
    assert after == before - {victim}


def test_underscore_is_token_char():
    # '_' is a token character in the index dictionary (_WORD_RE); the
    # extractor must not split at it, which would require a token the
    # index never stores and silently drop matching docs
    assert required_literal_tokens("= foo_bar (x|y)") == ["foo_bar"]


def test_underscore_prefilter_recall(spark, tmp_path):
    from open_source_search_engine_spark.operators.build import (
        build_index,
        derive_ids,
    )

    rows = [
        ("r", "a.py", "c", "py", "def foo_bar(): return 1"),
        ("r", "b.py", "c", "py", "def foo(): bar()"),
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    idx = build_index(
        spark, docs, str(tmp_path / "idx"), n_shards=1,
        code_aware=False, block_size=4, salt_target=1000,
    )
    corpus = derive_ids(docs)
    got = regex_search(spark, idx, corpus, r"def foo_bar\(").collect()
    assert len(got) == 1 and got[0].n_matches == 1


def test_limit_zero_returns_empty(spark, micro_index, micro_corpus):
    assert (
        regex_search(spark, micro_index, micro_corpus, "search", limit=0).count()
        == 0
    )


# --- multi-pattern rule scan -------------------------------------------------


def test_rules_scan_equals_cross_product(spark, micro_corpus):
    from open_source_search_engine_spark.plans.regex import regex_rules_scan

    rules = [
        (1, "[a-z]+ search tree"),  # prefiltered on 'search'
        (2, "hash (map|set)"),  # no interior literal -> full scan rule
        (3, "binary"),  # boundary-only literal -> full scan rule
    ]
    got = {
        (r.doc_id, r.rule_id, r.n_matches)
        for r in regex_rules_scan(
            micro_corpus, rules, text_col="content"
        ).collect()
    }
    want = set()
    for rid, pat in rules:
        for r in micro_corpus.select(
            "doc_id",
            F.regexp_count("content", F.lit(pat)).cast("long").alias("n"),
        ).filter(F.col("n") > 0).collect():
            want.add((r.doc_id, rid, r.n))
    assert got == want


def test_rules_scan_prefilter_prunes(spark, micro_corpus):
    from open_source_search_engine_spark.plans.regex import regex_rules_scan

    # a rule whose required token matches nothing yields no rows and the
    # other rules are unaffected
    rules = [(1, "= zzznothing (a|b)"), (2, "linear search [a-z]+")]
    got = {
        (r.doc_id, r.rule_id)
        for r in regex_rules_scan(
            micro_corpus, rules, text_col="content"
        ).collect()
    }
    assert {rid for _d, rid in got} == {2}


def test_rules_scan_empty_rules(spark, micro_corpus):
    from open_source_search_engine_spark.plans.regex import regex_rules_scan

    assert regex_rules_scan(micro_corpus, [], text_col="content").count() == 0
