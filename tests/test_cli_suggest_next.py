"""CLI `suggest-next`: next-word continuation off stored pair termlists."""

import io
import json
from contextlib import redirect_stdout


def test_cli_suggest_next(spark, tmp_path_factory):
    from open_source_search_engine_spark.__main__ import main
    from open_source_search_engine_spark.operators.build import build_index

    docs = spark.createDataFrame(
        [
            (1, "r", "a.py", "c", "py", "fast table scan wins"),
            (2, "r", "b.py", "c", "py", "fast table scan again and fast table merge"),
            (3, "r", "c.py", "c", "py", "fast index not table"),
        ],
        "doc_id bigint, repo string, path string, commit string, lang string, content string",
    )
    root = str(tmp_path_factory.mktemp("nextcli"))
    build_index(
        spark, docs, root, n_shards=1, code_aware=False, block_size=4,
        bigram_terms=True,
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["--cores", "4", "suggest-next", "--index", root, "--word", "Table"])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    # 'table scan' in 2 docs (cf 2), 'table merge' in 1 — df-ranked;
    # the CLI lowercases the query word
    assert out[0] == {"next": "scan", "df": 2, "cf": 2}
    assert {"next": "merge", "df": 1, "cf": 1} in out
    # no continuation rows for a word with no indexed successor
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["--cores", "4", "suggest-next", "--index", root, "--word", "wins"])
    assert json.loads(buf.getvalue().strip().splitlines()[-1]) == []
