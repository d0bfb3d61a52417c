"""Crawl-frontier scheduling as DataFrame ops (SURVEY.md §2 A8/R5).

Reference analog: spiderdb holds SpiderRequests keyed (firstIP,
urlHash48) with priority / addedTime / errCount; SpiderColl's waiting
tree counts requests per IP+priority to drive scheduling (A8), and
doledb is the per-IP rate-limited dequeue — one URL per IP becomes
"doled" (ready to fetch) at a time, honoring crawl-delay and error
backoff (R5: Spiderdb.h, Spider.cpp, Doledb.h/SpiderLoop.cpp).

The actual network fetch (Msg13) stays out of scope in this sandbox —
these operators are the frontier's *scheduling relations*, which is the
part that is data-parallel at 10^12-URL scale:

- ``dole_ready``: the doledb dequeue as ONE window over the frontier —
  partition by host, rank by (priority desc, added_ts asc, url_id), keep
  the top ``k_per_host`` eligible rows.  Eligibility = exponential error
  backoff (``added_ts + base * 2^err_count <= now``).  One shuffle keyed
  by host; Spark's rank-k window rewrite applies a per-partition limit
  pushdown, so no host's full request list is ever buffered for rn<=k.
- ``spider_quota_stats``: the waiting-tree counts — requests per
  (host, priority) with remaining per-host quota.  A partial-aggregated
  groupBy; at scale this is the same map-side-combine shape as any
  metrics rollup.

Hosts are the natural partition key (politeness is per-host), and skew
is bounded by construction: a host's frontier entry count is capped by
its quota long before any shuffle partition could become hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dole_ready(
    requests: DataFrame,
    now,
    k_per_host: int = 1,
    backoff_base_secs: int = 60,
    max_err: int = 4,
    host_col: str = "host",
    url_col: str = "url_id",
    priority_col: str = "priority",
    added_col: str = "added_ts",
    err_col: str = "err_count",
) -> DataFrame:
    """Doledb dequeue: the ``k_per_host`` most urgent eligible requests
    per host, with deterministic total order (priority desc, FIFO within
    priority, url_id tiebreak).

    ``now`` is passed in (a timestamp literal/column), never read from
    the clock — scheduling must be replayable.  Requests past ``max_err``
    failures are dropped from the dequeue entirely (the reference's
    errCount give-up).  ERROR backoff gates only requests that have
    actually failed: a never-failed request (err_count=0) is eligible
    the moment it is added, and the k-th failure waits out
    ``base * 2^(k-1)`` seconds from its (re-)added time — backoff that
    also delayed fresh URLs by the base interval would stall every new
    discovery for a full politeness period with zero failures on record.
    """
    # epoch-seconds arithmetic (not interval types): identical semantics
    # in every engine, so the driver's DuckDB oracle replays it verbatim
    backoff = F.when(F.col(err_col) <= 0, F.lit(0.0)).otherwise(
        F.lit(backoff_base_secs) * F.pow(F.lit(2.0), F.col(err_col) - 1)
    )
    eligible = requests.where(
        (F.col(err_col) <= F.lit(max_err))
        & (
            F.unix_timestamp(F.col(added_col)) + backoff
            <= F.unix_timestamp(F.lit(now).cast("timestamp"))
        )
    )
    w = Window.partitionBy(host_col).orderBy(
        F.desc(priority_col), F.asc(added_col), F.asc(url_col)
    )
    return (
        eligible.withColumn("dole_rank", F.row_number().over(w))
        .where(F.col("dole_rank") <= k_per_host)
        .select(host_col, url_col, priority_col, added_col, err_col, "dole_rank")
    )


def spider_quota_stats(
    requests: DataFrame,
    quota_per_host: int,
    host_col: str = "host",
    priority_col: str = "priority",
) -> DataFrame:
    """Waiting-tree counts (A8): pending requests per (host, priority)
    plus the host's remaining quota (negative = over quota — the
    reference stops adding requests for that site until the count
    drains)."""
    per_prio = requests.groupBy(host_col, priority_col).agg(
        F.count("*").alias("n_pending")
    )
    w = Window.partitionBy(host_col)
    return per_prio.select(
        host_col,
        priority_col,
        "n_pending",
        (F.lit(quota_per_host) - F.sum("n_pending").over(w)).alias(
            "quota_remaining"
        ),
    )
