"""Round-4 additions: match-any retrieval mode, more-like-this, and
hybrid BM25+cosine RRF fusion.

The match-any oracle is a hand-rolled Python BM25 over the micro corpus
(FIXTURES.md §4) — same discipline as test_bm25_micro.  MLT and hybrid
are additionally driver-oracle-certified (engine_mlt / hybrid_rrf
entries); the tests here pin the semantics that the SQL oracle cannot
see: source-doc exclusion, rank sentinels, determinism, input errors.
"""

import math

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.plans.exec import search
from open_source_search_engine_spark.plans.hybrid import hybrid_rrf
from open_source_search_engine_spark.plans.mlt import doc_top_terms, more_like_this

MICRO_TEXTS = {
    # doc_id order matches the micro_docs fixture rows (doc ids are
    # content-hash derived; we recover them from docstats at runtime)
    "a.py": "binary search tree in python",
    "b.py": "linear search list",
    "c.go": "binary tree traversal binary heap",
    "d.go": "hash map and hash set",
    "e.rs": "binary search search search",
}

K1, B = 1.2, 0.75


def _py_bm25_any(texts: dict[str, str], terms: list[str]) -> dict[str, float]:
    """Disjunctive-sum BM25 over docs matching >= 1 term."""
    toks = {p: t.split() for p, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out: dict[str, float] = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for p, v in toks.items():
            tf = v.count(term)
            if tf:
                dl = len(v)
                out[p] = out.get(p, 0.0) + idf * tf * (K1 + 1) / (
                    tf + K1 * (1 - B + B * dl / avgdl)
                )
    return out


def _path_by_doc_id(spark, idx):
    return {
        r["doc_id"]: r["path"]
        for r in idx.docstats.read(spark).select("doc_id", "path").collect()
    }


def test_match_any_equals_python_oracle(spark, micro_index):
    res = search(
        spark, micro_index, "binary hash", k=10, enrich=False, match_mode="any"
    ).collect()
    paths = _path_by_doc_id(spark, micro_index)
    got = {paths[r["doc_id"]]: r["score"] for r in res}
    want = _py_bm25_any(MICRO_TEXTS, ["binary", "hash"])
    assert set(got) == set(want)  # d.go matches hash only, still present
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=1e-9)


def test_match_any_superset_of_match_all(spark, micro_index):
    any_ids = {
        r["doc_id"]
        for r in search(
            spark, micro_index, "binary search", k=10, enrich=False,
            match_mode="any",
        ).collect()
    }
    all_rows = search(
        spark, micro_index, "binary search", k=10, enrich=False
    ).collect()
    assert {r["doc_id"] for r in all_rows} < any_ids
    # on the intersection, scores are identical (same sum over both slots)
    any_scores = {
        r["doc_id"]: r["score"]
        for r in search(
            spark, micro_index, "binary search", k=10, enrich=False,
            match_mode="any",
        ).collect()
    }
    for r in all_rows:
        assert any_scores[r["doc_id"]] == pytest.approx(r["score"], abs=1e-12)


def test_match_any_tolerates_missing_term(spark, micro_index):
    res = search(
        spark, micro_index, "binary zzznotaterm", k=10, enrich=False,
        match_mode="any",
    ).collect()
    assert len(res) == 3  # binary matches a.py, c.go, e.rs
    # conjunctive mode over the same query is empty
    assert (
        search(spark, micro_index, "binary zzznotaterm", k=10, enrich=False)
        .count() == 0
    )


def test_match_any_rejects_proximity_and_bad_mode(spark, micro_index):
    with pytest.raises(ValueError, match="proximity"):
        search(
            spark, micro_index, "binary search", proximity_bonus=0.5,
            match_mode="any",
        )
    with pytest.raises(ValueError, match="match_mode"):
        search(spark, micro_index, "binary", match_mode="fuzzy")


def test_doc_top_terms_ranked_by_tfidf(spark, micro_index):
    # e.rs: search tf=3 (df=3), binary tf=1 (df=3) -> search first
    terms = doc_top_terms(
        spark, micro_index, MICRO_TEXTS["e.rs"], m_terms=2, code_aware=False
    )
    assert terms == ["search", "binary"]
    # m_terms caps the list
    assert len(
        doc_top_terms(
            spark, micro_index, MICRO_TEXTS["a.py"], m_terms=3,
            code_aware=False,
        )
    ) == 3


def test_more_like_this_excludes_source_and_ranks(spark, micro_index):
    paths = _path_by_doc_id(spark, micro_index)
    src = next(d for d, p in paths.items() if p == "e.rs")
    res = more_like_this(
        spark, micro_index, src, k=10, m_terms=2,
        text=MICRO_TEXTS["e.rs"], code_aware=False,
    ).collect()
    got = [paths[r["doc_id"]] for r in res]
    assert src not in [r["doc_id"] for r in res]
    # query terms are {search, binary}: a.py matches both, b.py/c.go one
    assert set(got) == {"a.py", "b.py", "c.go"}
    assert got[0] == "a.py"
    want = _py_bm25_any(MICRO_TEXTS, ["search", "binary"])
    for r in res:
        assert r["score"] == pytest.approx(want[paths[r["doc_id"]]], abs=1e-9)


def test_more_like_this_needs_text_or_corpus(spark, micro_index):
    with pytest.raises(ValueError, match="text= or corpus="):
        more_like_this(spark, micro_index, 1)


def test_more_like_this_from_corpus_df(spark, micro_index, micro_docs):
    from open_source_search_engine_spark.operators.build import derive_ids

    docs = derive_ids(micro_docs)
    src = docs.filter(F.col("path") == "e.rs").select("doc_id").collect()[0][0]
    res = more_like_this(
        spark, micro_index, src, k=10, m_terms=2, corpus=docs,
        code_aware=False,
    ).collect()
    assert len(res) == 3 and src not in {r["doc_id"] for r in res}


@pytest.fixture(scope="module")
def micro_embeddings(spark, micro_index):
    """One embedding per micro doc: axis-aligned so cosine ranks are
    hand-checkable.  vec 0 = query doc."""
    ids = sorted(_path_by_doc_id(spark, micro_index))
    vecs = [
        [1.0, 0.0, 0.0],
        [0.9, 0.1, 0.0],
        [0.5, 0.5, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
    ]
    return spark.createDataFrame(
        [(i, v) for i, v in zip(ids, vecs)], "vec_id long, embedding array<float>"
    )


def test_hybrid_rrf_fuses_both_sources(spark, micro_index, micro_embeddings):
    ids = sorted(_path_by_doc_id(spark, micro_index))
    res = hybrid_rrf(
        spark, micro_index, micro_embeddings, "binary search",
        [1.0, 0.0, 0.0], k=10, k_rrf=60, n_candidates=5,
    ).collect()
    by_id = {r["doc_id"]: r for r in res}
    # every doc appears: all 5 have a cosine rank; the conjunctive BM25
    # side matches only the docs with BOTH terms (a.py, e.rs)
    assert len(res) == 5
    # sentinel semantics: a doc in only ONE source has the other rank 0
    bm_ranked = {i for i, r in by_id.items() if r["bm25_rank"] > 0}
    assert len(bm_ranked) == 2
    for i in ids:
        r = by_id[i]
        expect = 0.0
        if r["bm25_rank"] > 0:
            expect += 1.0 / (60 + r["bm25_rank"])
        if r["ann_rank"] > 0:
            expect += 1.0 / (60 + r["ann_rank"])
        assert r["rrf"] == pytest.approx(expect, abs=1e-6)
    # ordering: rrf desc, doc_id asc
    rrfs = [(r["rrf"], r["doc_id"]) for r in res]
    assert rrfs == sorted(rrfs, key=lambda t: (-t[0], t[1]))


def test_hybrid_rrf_doc_in_both_sources_beats_single_source(
    spark, micro_index, micro_embeddings
):
    """A doc ranked #1 by both sources must out-fuse any doc present in
    only one source at any rank."""
    res = hybrid_rrf(
        spark, micro_index, micro_embeddings, "binary search",
        [1.0, 0.0, 0.0], k=10, k_rrf=60, n_candidates=5,
    ).collect()
    both = [r for r in res if r["bm25_rank"] > 0 and r["ann_rank"] > 0]
    single = [r for r in res if (r["bm25_rank"] > 0) != (r["ann_rank"] > 0)]
    assert both and single
    assert max(r["rrf"] for r in both) > max(r["rrf"] for r in single)
