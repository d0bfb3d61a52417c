"""BM25 exactness on the hand-computed micro-corpus (FIXTURES.md §4).

The pure-Python oracle below recomputes tf/df/doclen/avgdl/idf from the
5 fixture docs; engine scores must match to 1e-9 and ranking must obey
the canonical (score desc, doc_id asc) tie-break (SURVEY.md §7.5)."""

import math

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.plans.exec import search

K1, B = 1.2, 0.75

CONTENT = {
    "a.py": "binary search tree in python",
    "b.py": "linear search list",
    "c.go": "binary tree traversal binary heap",
    "d.go": "hash map and hash set",
    "e.rs": "binary search search search",
}


def py_bm25(query_terms, contents):
    docs = {p: c.split() for p, c in contents.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    scores = {}
    for p, toks in docs.items():
        s = 0.0
        matched = 0
        for q in query_terms:
            tf = toks.count(q)
            if tf == 0:
                continue
            matched += 1
            df = sum(1 for t in docs.values() if q in t)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(toks) / avgdl))
        if matched == len(query_terms):
            scores[p] = s
    return scores


@pytest.mark.parametrize(
    "query,terms",
    [
        ("binary", ["binary"]),
        ("search", ["search"]),
        ("binary search", ["binary", "search"]),
        ("hash", ["hash"]),
    ],
)
def test_micro_scores_exact(spark, micro_index, query, terms):
    expected = py_bm25(terms, CONTENT)
    got = {
        r["path"]: r["score"]
        for r in search(spark, micro_index, query, k=10).collect()
    }
    assert set(got) == set(expected)
    for p, s in expected.items():
        assert got[p] == pytest.approx(s, abs=1e-9), p


def test_micro_tie_break_order(spark, micro_index):
    rows = search(spark, micro_index, "binary", k=10).collect()
    keyed = [(-r["score"], r["doc_id"]) for r in rows]
    assert keyed == sorted(keyed)


def test_negation(spark, micro_index):
    got = {r["path"] for r in search(spark, micro_index, "binary -tree", k=10).collect()}
    assert got == {"e.rs"}


def test_or_group(spark, micro_index):
    got = {r["path"] for r in search(spark, micro_index, "linear OR heap", k=10).collect()}
    assert got == {"b.py", "c.go"}


def test_field_restriction(spark, micro_index):
    got = {r["path"] for r in search(spark, micro_index, "binary lang:python", k=10).collect()}
    assert got == {"a.py"}


def test_phrase(spark, micro_index):
    got = {r["path"] for r in search(spark, micro_index, '"binary search"', k=10).collect()}
    # adjacent in a.py and e.rs; c.go has binary but never followed by search
    assert got == {"a.py", "e.rs"}


def test_sha256_invariant(spark, micro_index, micro_docs):
    """North-rule per-row invariant: stored sha vs recomputed from source."""
    ds = micro_index.docstats.read(spark).select("path", "content_sha256")
    src = micro_docs.select("path", F.sha2("content", 256).alias("expected"))
    bad = ds.join(src, "path").filter(F.col("content_sha256") != F.col("expected"))
    assert bad.count() == 0
