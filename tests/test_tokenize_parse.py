"""X2 tokenizer and Query.cpp-analog parser units (no Spark needed)."""

from open_source_search_engine_spark.functions.tokenize import _tokenize_one
from open_source_search_engine_spark.plans.query import parse_query


def test_simple_tokens():
    assert _tokenize_one("Binary Search, tree!", False) == ["binary", "search", "tree"]


def test_code_aware_splits():
    toks = _tokenize_one("getUserName", True)
    assert toks[0] == "getusername"
    assert toks[1:] == ["get", "user", "name"]


def test_snake_and_camel():
    assert _tokenize_one("snake_case", True) == ["snake_case", "snake", "case"]
    assert _tokenize_one("HTTPServer", True) == ["httpserver", "http", "server"]
    # no redundant sub-token when nothing splits
    assert _tokenize_one("plain", True) == ["plain"]


def test_parser_and_groups():
    p = parse_query("binary search")
    assert len(p.groups) == 2 and not p.negatives
    assert p.groups[0].members[0].text == "binary"


def test_parser_negation_field_or():
    p = parse_query("tree -heap lang:python cat OR dog")
    assert [t.text for t in p.negatives] == ["heap"]
    texts = [[m.text for m in g.members] for g in p.groups]
    assert ["tree"] in texts
    assert ["lang:python"] in texts
    assert ["cat", "dog"] in texts


def test_parser_phrase():
    p = parse_query('"binary search" tree')
    phrase_groups = [g for g in p.groups if g.members[0].phrase]
    assert len(phrase_groups) == 1
    assert phrase_groups[0].members[0].phrase == ("binary", "search")


def test_field_alias_site_url_map_to_indexed_prefixes():
    """Reference query-surface aliases (r4): ``site:`` restricts by host
    — the repo plays that role here (F5) — and ``url:`` matches URL
    words (path: terms).  ``intitle:`` stays its own (unindexed) prefix."""
    from open_source_search_engine_spark.plans.query import parse_query

    p = parse_query("def site:org1/proj2 url:Widget intitle:readme")
    texts = [m.text for g in p.groups for m in g.members]
    assert "repo:org1/proj2" in texts
    assert "path:widget" in texts
    assert "intitle:readme" in texts


def test_parser_term_weights():
    """term^W user weights (Query.cpp m_userWeight): attach to the Term,
    survive OR-groups and field prefixes, and a standalone ^W unit
    weights the preceding quoted phrase."""
    p = parse_query("binary^2 search")
    assert [(m.text, m.weight) for g in p.groups for m in g.members] == [
        ("binary", 2.0),
        ("search", 1.0),
    ]
    p = parse_query("a^2.5 OR b c")
    assert [(m.text, m.weight) for m in p.groups[0].members] == [
        ("a", 2.5),
        ("b", 1.0),
    ]
    p = parse_query("lang:python^3 tree")
    assert p.groups[0].members[0] .text == "lang:python"
    assert p.groups[0].members[0].weight == 3.0
    p = parse_query('"fast table"^2 join')
    assert p.groups[0].members[0].phrase == ("fast", "table")
    assert p.groups[0].members[0].weight == 2.0


def test_parser_term_weight_edge_cases():
    # nonpositive weight: suffix stripped, weight falls back to 1.0
    p = parse_query("x^0 y")
    assert [(m.text, m.weight) for g in p.groups for m in g.members] == [
        ("x", 1.0),
        ("y", 1.0),
    ]
    # weight on a negation is parsed but a stray ^W after it cannot
    # retroactively weight the previous positive term
    p = parse_query("good -bad ^2")
    assert p.groups[0].members[0].weight == 1.0
    assert [t.text for t in p.negatives] == ["bad"]
    # bare ^W with nothing before it is ignored
    p = parse_query("^2 term")
    assert [(m.text, m.weight) for g in p.groups for m in g.members] == [
        ("term", 1.0),
    ]
