"""Web-fetch plumbing (sources/fetch.py): robots exclusion, fake
transport determinism, the honest real-transport stub, and the hand-off
into the index build."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.sources.fetch import (
    _fetch_real,
    fetch_documents,
    robots_filter,
)


@pytest.fixture(scope="module")
def doled(spark):
    rows = [
        ("a.com", "http://a.com/ok/1"),
        ("a.com", "http://a.com/private/secret"),
        ("b.com", "http://b.com/private/allowed-here"),
    ]
    return spark.createDataFrame(rows, "host string, url string")


@pytest.fixture(scope="module")
def robots(spark):
    return spark.createDataFrame(
        [("a.com", "http://a.com/private/")],
        "host string, disallow_prefix string",
    )


def test_robots_filter_is_per_host_prefix(doled, robots):
    out = robots_filter(doled, robots)
    urls = sorted(r["url"] for r in out.collect())
    # a.com/private banned; the same path on b.com is NOT (rules are per-host)
    assert urls == ["http://a.com/ok/1", "http://b.com/private/allowed-here"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the doled slice is never shuffled


def test_fake_fetch_is_deterministic(doled):
    a = fetch_documents(doled, fetcher="fake").collect()
    b = fetch_documents(doled, fetcher="fake").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    by_url = {r["url"]: r for r in a}
    ok = by_url["http://a.com/ok/1"]
    assert ok["status"] in (200, 404)
    if ok["status"] == 200:
        assert "http://a.com/ok/1" in ok["content"]
        assert ok["n_bytes"] == len(ok["content"].encode())
    else:
        assert ok["content"] == "" and ok["n_bytes"] == 0


def test_real_transport_is_an_honest_stub():
    with pytest.raises(NotImplementedError):
        _fetch_real("http://example.com/")


def test_custom_fetcher_seam(doled, spark):
    out = fetch_documents(doled, fetcher=lambda u: (200, f"BODY {u}")).collect()
    assert all(r["content"] == f"BODY {r['url']}" for r in out)


def test_fetched_docs_flow_into_build_and_search(spark, tmp_path):
    """The full S9 -> build -> query hand-off: fetch fake pages, index
    the 200s, find one by a token from its body."""
    from open_source_search_engine_spark.operators.build import build_index
    from open_source_search_engine_spark.plans.exec import search

    urls = spark.createDataFrame(
        [(f"h{i}.com", f"http://h{i}.com/page") for i in range(30)],
        "host string, url string",
    )
    pages = fetch_documents(urls, fetcher="fake").where(F.col("status") == 200)
    docs = pages.select(
        F.col("url").alias("repo"),
        F.lit("index.html").alias("path"),
        F.lit("c0").alias("commit"),
        F.lit("html").alias("lang"),
        F.col("content"),
    )
    idx = build_index(spark, docs, str(tmp_path / "idx"), n_shards=2, block_size=64)
    hits = search(spark, idx, "title", k=5)
    assert hits.count() > 0
