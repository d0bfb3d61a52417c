"""F9 URL-filters DSL: parsing, first-match-wins, codegen-only plan."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.plans.urlfilters import (
    UrlRule,
    apply_url_filters,
    compile_clause,
    filter_verdicts,
)


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        ("src1", "doc/10", "en", 500),
        ("src1", "doc/11", "de", 100),
        ("src2", "doc/20", "en", 450),
        ("src2", "doc/21", "en", 120),
        ("src3", "doc/30", "zh", 300),
    ]
    return spark.createDataFrame(rows, "repo string, path string, lang string, n_chars int")


RULES = [
    UrlRule("lang==en && n_chars>=400", 10, True),
    UrlRule("repo~=^src1", 20, True),
    UrlRule("n_chars<150", 40, False),
    UrlRule("default", 50, True),
]


def test_first_match_wins(urls):
    out = {
        (r.repo, r.path): (r.rule_idx, r.priority, r.indexed)
        for r in apply_url_filters(urls, RULES).collect()
    }
    # (src1, doc/10) matches BOTH rule 0 and rule 1 -> rule 0 wins
    assert out[("src1", "doc/10")] == (0, 10, True)
    assert out[("src1", "doc/11")] == (1, 20, True)  # regex, not the <150 rule
    assert out[("src2", "doc/20")] == (0, 10, True)
    assert out[("src2", "doc/21")] == (2, 40, False)
    assert out[("src3", "doc/30")] == (3, 50, True)  # default catch-all


def test_no_default_yields_minus_one(urls):
    out = apply_url_filters(urls, [UrlRule("lang==fr", 1, True)]).collect()
    assert all(r.rule_idx == -1 and r.priority == -1 and not r.indexed for r in out)


def test_every_operator_class(spark):
    df = spark.createDataFrame(
        [("abc/def", 7)], "path string, n int"
    )

    def matches(expr):
        return df.filter(compile_clause(expr)).count() == 1

    assert matches("path^=abc")
    assert not matches("path^=def")
    assert matches("path*=c/d")
    assert matches("path~=^a.c/")
    assert matches("path==abc/def")
    assert matches("path!=zzz")
    assert matches("n<8") and matches("n<=7") and matches("n>6") and matches("n>=7")
    assert not matches("n<7")


def test_conjunction_and_bad_clause(spark):
    df = spark.createDataFrame([("x", 5)], "a string, n int")
    assert df.filter(compile_clause("default")).count() == 1
    from open_source_search_engine_spark.plans.urlfilters import compile_expr

    assert df.filter(compile_expr("a==x && n>=5")).count() == 1
    assert df.filter(compile_expr("a==x && n>5")).count() == 0
    with pytest.raises(ValueError):
        compile_clause("garbage")
    with pytest.raises(ValueError):
        apply_url_filters(df, [])


def test_plan_is_pure_projection(urls):
    """The compiled rule table must be CASE expressions inside the scan
    projection — no Python UDF, no BatchEvalPython node."""
    plan = (
        apply_url_filters(urls, RULES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_verdict_rollup(urls):
    out = {r.rule_idx: r.n_docs for r in filter_verdicts(urls, RULES).collect()}
    assert out == {0: 2, 1: 1, 2: 1, 3: 1}
