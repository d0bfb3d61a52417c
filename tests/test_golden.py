"""Golden query regression (qa.cpp analog, FIXTURES.md §3): the engine
must reproduce frozen top-k (commit, score@1e-6) computed by the
independent pure-Python oracle in fixtures/gen_golden.py."""

import json
import os

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.build import build_index
from open_source_search_engine_spark.operators.topk import search_wand
from open_source_search_engine_spark.plans.exec import search
from open_source_search_engine_spark.sources.corpus import synth_documents

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "queries.jsonl")


def _load():
    with open(FIXTURE) as f:
        return [json.loads(line) for line in f]


GOLDEN = _load()


@pytest.fixture(scope="module")
def golden_index(spark, tmp_path_factory):
    n = GOLDEN[0]["n_docs"]
    docs = synth_documents(spark, n)
    root = str(tmp_path_factory.mktemp("golden"))
    return build_index(spark, docs, root, n_shards=2, block_size=64, salt_target=500)


@pytest.fixture(scope="module")
def commit_of(spark, golden_index):
    rows = golden_index.docstats.read(spark).select("doc_id", "commit").collect()
    return {r["doc_id"]: r["commit"] for r in rows}


@pytest.mark.parametrize("case", GOLDEN, ids=[g["qid"] for g in GOLDEN])
def test_golden_query(spark, golden_index, commit_of, case):
    got = search(spark, golden_index, case["text"], k=case["k"], enrich=False).collect()
    got_pairs = [(commit_of[r["doc_id"]], round(r["score"], 6)) for r in got]
    exp_pairs = [(e["commit"], e["score"]) for e in case["expect"]]
    assert got_pairs == exp_pairs, case["qid"]


@pytest.mark.parametrize(
    "case",
    [g for g in GOLDEN if g["kind"] == "and" and " OR " not in g["text"]],
    ids=[g["qid"] for g in GOLDEN if g["kind"] == "and"],
)
def test_golden_query_wand(spark, golden_index, commit_of, case):
    got = search_wand(
        spark, golden_index, case["text"], k=case["k"], enrich=False
    ).collect()
    got_pairs = [(commit_of[r["doc_id"]], round(r["score"], 6)) for r in got]
    exp_pairs = [(e["commit"], e["score"]) for e in case["expect"]]
    assert got_pairs == exp_pairs, case["qid"]
