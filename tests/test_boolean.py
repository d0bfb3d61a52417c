"""U1 nested boolean expressions (Query.cpp Expression::isTruth analog):
parser shape, per-doc evaluation against the micro corpus, and the
whole-collection-match rejection."""

import pytest

from open_source_search_engine_spark.plans.boolean import (
    parse_boolean,
    search_boolean,
)

# micro corpus (conftest): a.py "binary search tree in python",
# b.py "linear search list", c.go "binary tree traversal binary heap",
# d.go "hash map and hash set", e.rs "binary search search search"


def _docs(spark, micro_index, expr):
    ds = micro_index.docstats.read(spark).select("doc_id", "path")
    out = search_boolean(spark, micro_index, expr).join(ds, "doc_id")
    return {r["path"] for r in out.collect()}


def test_or_and_not_nesting(spark, micro_index):
    assert _docs(spark, micro_index, "(binary OR linear) AND NOT tree") == {
        "b.py",
        "e.rs",
    }
    assert _docs(spark, micro_index, "binary AND (search OR heap)") == {
        "a.py",
        "c.go",
        "e.rs",
    }
    # bare adjacency = AND; NOT binds tighter than AND
    assert _docs(spark, micro_index, "binary NOT heap") == {"a.py", "e.rs"}
    # deep nesting
    assert _docs(
        spark, micro_index, "((binary AND tree) OR (hash AND map)) AND NOT heap"
    ) == {"a.py", "d.go"}


def test_fielded_leaves(spark, micro_index):
    assert _docs(spark, micro_index, "search AND lang:python") == {"a.py", "b.py"}
    assert _docs(spark, micro_index, "search AND NOT lang:python") == {"e.rs"}


def test_absent_term_is_false(spark, micro_index):
    assert _docs(spark, micro_index, "binary AND zzzmissing") == set()
    assert _docs(spark, micro_index, "binary OR zzzmissing") == {
        "a.py",
        "c.go",
        "e.rs",
    }


def test_rejects_collection_wide_expressions():
    for bad in ["NOT tree", "NOT (a AND b)", "a OR NOT b"]:
        with pytest.raises(ValueError, match="whole collection"):
            parse_boolean(bad)


def test_parse_errors():
    for bad in ["(a OR b", "a )", "AND a", "a AND"]:
        with pytest.raises(ValueError):
            parse_boolean(bad)
