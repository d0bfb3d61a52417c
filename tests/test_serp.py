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
