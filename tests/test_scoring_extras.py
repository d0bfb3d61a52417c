"""Soft score components behind flags (off for BM25-parity entries):
- W4 proximity bonus vs a pure-Python sliding-window oracle;
- F8 lang-preference boost: exec and WAND paths agree, and equal the
  flag-off scores scaled by exactly the factor on preferred-lang docs;
- X5 synonym expansion: plan rewrite shape + end-to-end equivalence to a
  hand-built weighted OR-group plan.
"""

import math

import pytest

from open_source_search_engine_spark.functions.synonyms import expand_plan
from open_source_search_engine_spark.operators.topk import search_wand
from open_source_search_engine_spark.plans.exec import search
from open_source_search_engine_spark.plans.query import (
    Group,
    QueryPlan,
    Term,
    parse_query,
)

MICRO = {
    "a.py": ("python", "binary search tree in python"),
    "b.py": ("python", "linear search list"),
    "c.go": ("go", "binary tree traversal binary heap"),
    "d.go": ("go", "hash map and hash set"),
    "e.rs": ("rust", "binary search search search"),
}


def _bm25_py(terms: list[str]) -> dict[str, float]:
    """Pure-Python BM25 over the micro corpus (k1=1.2, b=0.75)."""
    toks = {p: c.split() for p, (_l, c) in MICRO.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for p, tk in toks.items():
        s = 0.0
        ok = True
        for term in terms:
            tf = tk.count(term)
            if tf == 0:
                ok = False
                break
            df = sum(1 for t2 in toks.values() if term in t2)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
        if ok:
            out[p] = s
    return out


def _minspan_py(content: str, terms: list[str]) -> int:
    tk = content.split()
    best = None
    for i in range(len(tk)):
        seen = set()
        for j in range(i, len(tk)):
            if tk[j] in terms:
                seen.add(tk[j])
            if seen == set(terms):
                span = j - i
                best = span if best is None else min(best, span)
                break
    return best if best is not None else 1_000_000


def _paths_scores(df):
    rows = df.collect()
    return [(r["path"], round(r["score"], 9)) for r in rows]


def test_proximity_bonus_matches_python_oracle(spark, micro_index):
    terms = ["binary", "tree"]
    w = 2.0
    base = _bm25_py(terms)
    expect = {}
    for p, s in base.items():
        span = _minspan_py(MICRO[p][1], terms)
        # denominator clamped >= 1 like the plan (identity for disjoint
        # slots; guards the overlapping-slot zero/negative case)
        expect[p] = s * (1.0 + w / max(1.0, 1.0 + span - (len(terms) - 1)))
    got = search(
        spark, micro_index, "binary tree", k=10, proximity_bonus=w
    ).collect()
    assert {r["path"] for r in got} == set(expect)
    for r in got:
        assert r["score"] == pytest.approx(expect[r["path"]], rel=1e-9)
    # ordering follows the boosted scores
    order = [r["path"] for r in got]
    assert order == sorted(expect, key=lambda p: -expect[p])


def test_proximity_off_unchanged(spark, micro_index):
    plain = _paths_scores(search(spark, micro_index, "binary tree", k=10))
    base = _bm25_py(["binary", "tree"])
    assert dict(plain) == {p: pytest.approx(s, rel=1e-9) for p, s in base.items()}


def test_lang_boost_paths_agree_and_scale(spark, micro_index):
    q = "search"
    factor = 2.0
    off = {r["path"]: r["score"] for r in search(spark, micro_index, q, k=10).collect()}
    on_exec = {
        r["path"]: r["score"]
        for r in search(
            spark, micro_index, q, k=10, lang_boost=("python", factor)
        ).collect()
    }
    on_wand = {
        r["path"]: r["score"]
        for r in search_wand(
            spark, micro_index, q, k=10, lang_boost=("python", factor)
        ).collect()
    }
    assert set(off) == set(on_exec) == set(on_wand)
    for p in off:
        scale = factor if MICRO[p][0] == "python" else 1.0
        assert on_exec[p] == pytest.approx(off[p] * scale, rel=1e-9)
        assert on_wand[p] == pytest.approx(off[p] * scale, rel=1e-9)


def test_synonym_expansion_shape():
    plan = parse_query("import hash -nil")
    ex = expand_plan(plan)
    # 'import' grows its weighted OR-group; 'hash' has no synonyms;
    # the negative is untouched
    g0 = ex.groups[0]
    assert [m.text for m in g0.members] == ["import", "include", "require"]
    assert g0.members[0].weight == 1.0
    assert g0.members[1].weight == 0.8
    assert [m.text for m in ex.groups[1].members] == ["hash"]
    assert [t.text for t in ex.negatives] == ["nil"]
    # fielded terms and phrases are never expanded
    ex2 = expand_plan(parse_query('lang:python "import include"'))
    assert all(len(g.members) == 1 for g in ex2.groups)


def test_synonym_search_equals_manual_plan(spark, micro_index):
    table = {"search": [("traversal", 0.5)]}
    manual = QueryPlan(
        groups=[Group([Term("search"), Term("traversal", weight=0.5)])],
        raw="manual",
    )
    via_flag = _paths_scores(
        search(spark, micro_index, "search", k=10, synonyms=table)
    )
    via_plan = _paths_scores(search(spark, micro_index, manual, k=10))
    assert via_flag == via_plan
    # the synonym-only match (c.go: traversal) now appears, discounted
    assert "c.go" in dict(via_flag)
    # and the WAND kernel agrees with the exhaustive plan
    via_wand = _paths_scores(
        search_wand(spark, micro_index, "search", k=10, synonyms=table)
    )
    assert via_wand == via_flag
