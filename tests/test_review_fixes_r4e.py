"""Round-4 post-review fixes, batch 5 (edges in corpus synth, CLI,
fetch plumbing, MMR, bench harness).

1. Zipf/lang CDF last edges pinned to exactly 1.0 — float cumsum tops
   out just under 1.0, and a uniform draw above it would index past the
   vocab (deterministic task-retry failure at 10^12-file scale).
2. ``mmr_rerank`` zero-norm embeddings score similarity 0 instead of
   raising ZeroDivisionError.
3. ``robots_filter`` treats an empty Disallow value as allow-all
   (robots.txt semantics), not disallow-everything.
4. ``fetch_documents`` drops null URLs instead of fetching the literal
   string 'None'.
5. CLI ``--engine auto`` routes quoted phrases through the WAND phrase
   kernel on bigram indexes; ``--explain`` prints the lazy plan without
   executing the query.
"""

import io
import json
from contextlib import redirect_stdout

import numpy as np
import pytest

from open_source_search_engine_spark.operators.build import build_index

SCHEMA = "repo string, path string, commit string, lang string, content string"


def test_cdf_edges_pinned():
    from open_source_search_engine_spark.sources import corpus

    assert corpus._ZIPF_CDF[-1] == 1.0
    assert corpus._LANG_CDF[-1] == 1.0
    # a draw arbitrarily close to 1.0 still lands inside the vocab
    edge = np.nextafter(1.0, 0.0)
    assert np.searchsorted(corpus._ZIPF_CDF, edge) < len(corpus._ZIPF_CDF)
    assert np.searchsorted(corpus._LANG_CDF, edge) < len(corpus._LANG_CDF)


def test_mmr_zero_norm_embedding(spark):
    from open_source_search_engine_spark.plans.diversify import mmr_rerank

    cands = spark.createDataFrame(
        [
            (1, 3.0, [1.0, 0.0]),
            (2, 2.0, [0.0, 0.0]),  # padded/missing embedding
            (3, 1.0, [0.0, 1.0]),
        ],
        "doc_id long, rel double, embedding array<double>",
    )
    rows = mmr_rerank(spark, cands, k=3).collect()
    assert len(rows) == 3  # no ZeroDivisionError


def test_robots_empty_disallow_allows_all(spark):
    from open_source_search_engine_spark.sources.fetch import robots_filter

    doled = spark.createDataFrame(
        [("h1", "http://h1/a"), ("h1", "http://h1/private/x"), ("h2", "http://h2/b")],
        "host string, url string",
    )
    robots = spark.createDataFrame(
        [("h1", "http://h1/private"), ("h2", "")],  # empty = allow all
        "host string, disallow_prefix string",
    )
    got = {r["url"] for r in robots_filter(doled, robots).collect()}
    assert got == {"http://h1/a", "http://h2/b"}


def test_fetch_drops_null_urls(spark):
    from open_source_search_engine_spark.sources.fetch import fetch_documents

    doled = spark.createDataFrame(
        [("http://h/a",), (None,)], "url string"
    )
    rows = fetch_documents(doled, fetcher="fake").collect()
    assert [r["url"] for r in rows] == ["http://h/a"]


@pytest.fixture(scope="module")
def bigram_cli_index(spark, tmp_path_factory):
    docs = [
        ("r/0", "a.py", "c1", "python", "fast table query"),
        ("r/0", "b.py", "c2", "python", "fast slow table"),
        ("r/1", "c.py", "c3", "python", "query only here"),
    ]
    root = str(tmp_path_factory.mktemp("clidx"))
    build_index(
        spark,
        spark.createDataFrame(docs, SCHEMA),
        root,
        n_shards=1,
        code_aware=False,
        bigram_terms=True,
    )
    return root


def test_cli_auto_routes_phrase_to_wand(spark, bigram_cli_index, capsys):
    from open_source_search_engine_spark.__main__ import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["search", "--index", bigram_cli_index, "-q", '"fast table"', "-k", "5"])
    rows = [json.loads(ln) for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(rows) == 1  # only the adjacent doc
    err = capsys.readouterr().err
    assert '"engine": "wand"' in err  # auto picked the kernel path


def test_cli_explain_prints_plan_without_results(spark, bigram_cli_index):
    from open_source_search_engine_spark.__main__ import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(
            ["search", "--index", bigram_cli_index, "-q", "query", "--explain"]
        )
    out = buf.getvalue()
    assert "Physical Plan" in out
    assert '"doc_id"' not in out  # plan only, no executed result rows