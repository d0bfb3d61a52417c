"""Serp post-processing (§3.1 stages 8-10): clustering, facets, snippets."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.build import build_index
from open_source_search_engine_spark.plans.exec import search
from open_source_search_engine_spark.plans.serp import (
    cluster_per_repo,
    facets_for_query,
    snippets,
)
from open_source_search_engine_spark.sources.corpus import synth_documents


@pytest.fixture(scope="module")
def serp_setup(spark, tmp_path_factory):
    docs = synth_documents(spark, 120, partitions=4)
    docs.cache()
    root = str(tmp_path_factory.mktemp("serpidx"))
    idx = build_index(spark, docs, root, n_shards=1)
    return idx, docs


def test_cluster_per_repo(spark, serp_setup):
    idx, _docs = serp_setup
    res = search(spark, idx, "def", k=30)
    clustered = cluster_per_repo(res, max_per_repo=2).collect()
    from collections import Counter

    per_repo = Counter(r["repo"] for r in clustered)
    assert all(v <= 2 for v in per_repo.values())
    assert any(r["more_from_repo"] for r in clustered) or len(clustered) == res.count()


def test_facets_for_query(spark, serp_setup):
    idx, _docs = serp_setup
    fx = facets_for_query(spark, idx, "def", fields=["lang"]).collect()
    assert fx, "expected at least one facet bucket"
    # facet total == number of matching docs
    total = sum(r["n"] for r in fx)
    assert total == search(spark, idx, "def", k=10_000, enrich=False).count()
    # 'def' is a python/ruby keyword — those langs must dominate
    langs = {r["value"] for r in fx}
    assert "python" in langs or "ruby" in langs


def test_snippets(spark, serp_setup):
    idx, docs = serp_setup
    res = search(spark, idx, "binarysearchtree", k=5, enrich=True)
    sn = snippets(spark, idx, res, docs, "binarysearchtree").collect()
    assert sn
    for r in sn:
        assert r["title"] == r["path"].split("/")[-1]
        assert "**" in r["snippet"].lower()
        assert "binarysearchtree" in r["snippet"].lower().replace("**", "")


def test_dedup_results_exact_and_simhash(spark, micro_index, micro_docs):
    """W3 query-time dedup: exact mode drops identical content; simhash
    mode drops near-identical content, always keeping the better rank."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.plans.exec import search
    from open_source_search_engine_spark.plans.serp import dedup_results

    res = search(spark, micro_index, "binary", k=10, enrich=False)
    base = {r["doc_id"] for r in res.collect()}
    docs = micro_index.docstats.read(spark).select("doc_id", "path").join(
        micro_docs.withColumn(
            "doc_id", F.xxhash64("repo", "path", "commit")
        ).select("doc_id", "content"),
        "doc_id",
    )
    # no duplicates in the micro corpus -> exact dedup is the identity
    kept = dedup_results(res, docs, mode="exact")
    assert {r["doc_id"] for r in kept.collect()} == base
    # simhash with a huge threshold collapses everything to the top-1
    kept1 = dedup_results(res, docs, mode="simhash", simhash_bits=64).collect()
    assert len(kept1) == 1
    top = res.orderBy(F.desc("score"), F.asc("doc_id")).first()
    assert kept1[0]["doc_id"] == top["doc_id"]
    # threshold 0 keeps all distinct-signature docs
    kept0 = dedup_results(res, docs, mode="simhash", simhash_bits=0)
    assert {r["doc_id"] for r in kept0.collect()} == base


def test_snippet_picks_best_window_not_first_hit(spark, tmp_path):
    # Summary.cpp behavior (r5): 'alpha' first appears alone at the
    # start; 'beta' first appears right next to another 'alpha' much
    # later.  The beta-anchored window covers BOTH terms (score 2) and
    # must win over alpha's first-hit window (score 1).
    from open_source_search_engine_spark.operators.build import build_index
    from open_source_search_engine_spark.plans.exec import search
    from open_source_search_engine_spark.plans.serp import snippets

    filler = " ".join(["zzz"] * 40)
    content = f"alpha starts here {filler} now alpha meets beta in the end"
    docs = spark.createDataFrame(
        [("r", "f.py", "c1", "python", content)],
        "repo string, path string, commit string, lang string, content string",
    )
    idx = build_index(
        spark, docs, str(tmp_path / "bw_idx"), n_shards=1, code_aware=False
    )
    res = search(spark, idx, "alpha beta", k=5, enrich=True)
    out = snippets(spark, idx, res, docs, "alpha beta").collect()
    assert len(out) == 1
    snip = out[0]["snippet"]
    assert "**beta**" in snip and "**alpha**" in snip
    assert "starts here" not in snip  # the first-hit window lost
