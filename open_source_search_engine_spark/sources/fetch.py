"""Web-fetch plumbing (SURVEY.md §2 S9 — Msg13 / MsgC / robotdb).

Reference analog: Msg13 downloads a URL through a proxy/cache layer,
honoring robots.txt (robotdb) and per-IP politeness (doledb hands it one
URL per host at a time — see operators/frontier.py).  This sandbox has
no network sockets, so the transport is stubbed exactly like the
multimodal decoder (operators/multimodal.py): the Spark-side contract —
robots filtering, host-batched Arrow kernel, response schema, error
rows, hand-off into the index build — is real and tested; only the
socket call is swappable.

- ``fetcher="fake"``: deterministic closed-form responses (status +
  content are pure functions of the URL string), so even the stub is
  SQL-replayable and oracle-certifiable;
- ``fetcher="real"``: raises NotImplementedError naming the single
  function to swap in (``_fetch_real``) when a network exists;
- any callable ``(url: str) -> tuple[int, str]`` plugs in directly —
  the production seam.

Scale shape: the fetch stage maps over the DOLED slice only (the
frontier dequeue already enforced per-host politeness and quota), one
Arrow batch per partition, no shuffle — fetch parallelism is partition
parallelism, exactly the reference's per-host spider workers.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_SCHEMA = "url string, status int, content string, n_bytes int"


def _fetch_real(url: str) -> tuple[int, str]:
    raise NotImplementedError(
        "real HTTP fetch needs network sockets — absent in this sandbox; "
        "swap this function (or pass any callable as fetcher=) when a "
        "network exists"
    )


def _fetch_fake(url: str) -> tuple[int, str]:
    """Deterministic stand-in transport: status and body are pure
    functions of the URL (md5-keyed), so the whole pipeline replays
    bit-identically in any engine."""
    bucket = int(hashlib.md5(url.encode()).hexdigest()[:8], 16) % 17
    if bucket == 0:
        return 404, ""
    return 200, f"<html><title>{url}</title><body>doc at {url}</body></html>"


def robots_filter(
    doled: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Drop doled URLs matching a disallowed prefix for their host
    (robotdb).  ``robots`` is (host, disallow_prefix) — tiny by nature
    (one row per rule), so the exclusion is a broadcast anti-join; the
    doled slice is never shuffled."""
    # robots.txt semantics: an EMPTY 'Disallow:' value means allow-all —
    # startswith('') matches every URL, the exact inverse, so empty/null
    # rules are dropped from the exclusion set
    rules = robots.filter(
        F.col("disallow_prefix").isNotNull()
        & (F.length("disallow_prefix") > 0)
    )
    # a NULL host can never MATCH an exclusion rule (the join condition
    # is NULL, anti-join keeps the row) — i.e. it would silently BYPASS
    # robots.  Politeness is per-host; a row without a host can't be
    # fetched politely at all, so it is dropped, the same fail-closed
    # treatment fetch_documents gives null URLs
    doled = doled.filter(F.col(host_col).isNotNull())
    return doled.join(
        F.broadcast(rules),
        (doled[host_col] == rules[host_col])
        & doled[url_col].startswith(rules["disallow_prefix"]),
        "left_anti",
    )


def fetch_documents(
    doled: DataFrame,
    fetcher: str | Callable[[str], tuple[int, str]] = "fake",
    url_col: str = "url",
) -> DataFrame:
    """Fetch each doled URL via an Arrow-batched kernel; returns
    (url, status, content, n_bytes) ready for the tokenize/build
    pipeline (failures carry their status and empty content — the
    SpiderReply errCount feedback joins back to the frontier on url).

    The per-URL call inside the kernel is intentional, not a hot-path
    Python loop: HTTP IS per-request I/O (the real fetcher blocks on a
    socket per URL), and the stage maps over the doled slice only —
    thousands of rows per micro-batch, not the corpus."""
    if fetcher == "real":
        fn = _fetch_real
    elif fetcher == "fake":
        fn = _fetch_fake
    else:
        fn = fetcher

    # a null URL would be stringified to the literal 'None' by the kernel
    # and fetched/indexed as a real document that can never join back to
    # the frontier — drop it up front
    doled = doled.filter(F.col(url_col).isNotNull())

    def one(u: str) -> tuple[int, str]:
        # the documented contract: a failure is an ERROR ROW (status +
        # empty content) that joins back to the frontier, never a dead
        # Spark stage — one timeout/DNS error among thousands of doled
        # URLs must not kill the batch after task retries.  599 is the
        # conventional network-connect-failure pseudo-status.
        # NotImplementedError stays fatal: fetcher='real' in a
        # socket-less sandbox is a configuration error, not a fetch
        # failure to swallow.
        try:
            return fn(u)
        except NotImplementedError:
            raise
        except Exception:
            return 599, ""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = pdf[url_col].astype(str)
            out = [one(u) for u in urls]
            yield pd.DataFrame(
                {
                    "url": urls.to_numpy(),
                    "status": pd.array([s for s, _ in out], dtype="int32"),
                    "content": [c for _, c in out],
                    "n_bytes": pd.array(
                        [len(c.encode()) for _, c in out], dtype="int32"
                    ),
                }
            )

    return doled.select(F.col(url_col).cast("string").alias(url_col)).mapInPandas(
        run, FETCH_SCHEMA
    )
