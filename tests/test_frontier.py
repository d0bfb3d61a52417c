"""Crawl-frontier scheduling relations (operators/frontier.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.frontier import (
    dole_ready,
    spider_quota_stats,
)

NOW = "2024-01-10 00:00:00"


@pytest.fixture(scope="module")
def requests(spark):
    rows = [
        # host, url_id, added_ts, priority, err_count
        ("a.com", 1, datetime(2024, 1, 1), 0, 0),   # eligible, low prio
        ("a.com", 2, datetime(2024, 1, 2), 2, 0),   # eligible, high prio
        ("a.com", 3, datetime(2024, 1, 1), 2, 0),   # eligible, high prio, older
        ("a.com", 4, datetime(2024, 1, 9), 0, 5),   # err>4: given up
        # backoff: added Jan 8 + 60*2^11 s ~= Jan 9 + 10h... use err=11? cap
        ("b.com", 5, datetime(2024, 1, 9, 23, 0), 4, 4),  # 60*2^3=480s ok -> eligible
        ("b.com", 6, datetime(2024, 1, 9, 23, 59, 30), 0, 1),  # 60*2^0=60s backoff > 30s left -> NOT eligible
        ("c.com", 7, datetime(2024, 2, 1), 2, 0),   # added after NOW -> not eligible
    ]
    return spark.createDataFrame(
        rows, "host string, url_id long, added_ts timestamp, priority int, err_count int"
    )


def test_dole_rank_order_and_eligibility(requests):
    out = dole_ready(requests, NOW, k_per_host=2).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    # a.com: urls 2,3 are prio-2; FIFO within priority -> 3 (older) first
    a = sorted(by_host["a.com"], key=lambda r: r["dole_rank"])
    assert [r["url_id"] for r in a] == [3, 2]
    # b.com: only url 5 eligible (6 is inside its backoff window)
    assert [r["url_id"] for r in by_host["b.com"]] == [5]
    # c.com: added after NOW -> nothing doled
    assert "c.com" not in by_host


def test_fresh_requests_dole_immediately(spark):
    """err_count=0 must not be gated by the ERROR backoff (review r4f:
    the old rule charged fresh URLs base*2^0 seconds of backoff, stalling
    every new discovery by a full politeness period with zero failures).
    A URL added one second before 'now' is eligible at once."""
    rows = [("x.com", 1, datetime(2024, 1, 9, 23, 59, 59), 0, 0)]
    df = spark.createDataFrame(
        rows,
        "host string, url_id long, added_ts timestamp, priority int, "
        "err_count int",
    )
    out = dole_ready(df, NOW, k_per_host=1, backoff_base_secs=60).collect()
    assert [r["url_id"] for r in out] == [1]


def test_given_up_requests_never_dole(requests):
    out = dole_ready(requests, NOW, k_per_host=10)
    assert 4 not in [r["url_id"] for r in out.collect()]


def test_k_per_host_bounds_dequeue(requests):
    out = dole_ready(requests, NOW, k_per_host=1)
    counts = out.groupBy("host").count().collect()
    assert all(r["count"] == 1 for r in counts)


def test_quota_stats(requests):
    out = spider_quota_stats(requests, quota_per_host=3).collect()
    a = {(r["priority"]): r for r in out if r["host"] == "a.com"}
    # a.com has 4 pending total (2 prio-0 incl. the given-up one, 2 prio-2)
    assert a[0]["n_pending"] == 2 and a[2]["n_pending"] == 2
    assert a[0]["quota_remaining"] == -1  # over quota
    b = [r for r in out if r["host"] == "b.com"]
    assert all(r["quota_remaining"] == 1 for r in b)


def test_single_shuffle_plan(requests):
    """The dequeue is ONE exchange keyed by host (the politeness key)."""
    plan = dole_ready(requests, NOW)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
