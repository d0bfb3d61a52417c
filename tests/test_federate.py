"""Multi-collection federated search (plans/federate.py — SURVEY §1
"collections": independent namespace indexes, Collectiondb/&c= analog)."""

import pytest

from open_source_search_engine_spark.operators.build import build_index
from open_source_search_engine_spark.operators.topk import search_wand
from open_source_search_engine_spark.plans.federate import (
    collection_total_hits,
    search_collections,
)


@pytest.fixture(scope="session")
def two_collections(spark, tmp_path_factory):
    """Two independent tiny collections with DIFFERENT stats for the
    shared vocabulary: 'binary' is common in coll a, rare in coll b."""
    rows_a = [
        ("a", f"p{i}", "c", "py", txt)
        for i, txt in enumerate(
            [
                "binary search tree",
                "binary heap sort",
                "binary trie walk",
                "hash map probe",
            ]
        )
    ]
    rows_b = [
        ("b", f"p{i}", "c", "go", txt)
        for i, txt in enumerate(
            [
                "binary protocol frame",
                "stream codec frame",
                "frame buffer pool",
                "socket stream pump",
                "ring buffer stream",
            ]
        )
    ]
    schema = "repo string, path string, commit string, lang string, content string"
    colls = {}
    for name, rows in (("a", rows_a), ("b", rows_b)):
        root = str(tmp_path_factory.mktemp(f"coll_{name}"))
        colls[name] = build_index(
            spark,
            spark.createDataFrame(rows, schema),
            root,
            n_shards=1,
            code_aware=False,
            block_size=4,
            salt_target=1000,
        )
    return colls


def test_federated_equals_manual_union(spark, two_collections):
    """Global top-k == union of per-collection searches, merged by score."""
    res = search_collections(
        spark, two_collections, "binary", k=10, enrich=False
    ).collect()
    manual = []
    for name, idx in two_collections.items():
        for r in search_wand(spark, idx, "binary", k=10, enrich=False).collect():
            manual.append((name, r["doc_id"], r["score"]))
    manual.sort(key=lambda t: (-t[2], t[0], t[1]))
    assert [(r["collection"], r["doc_id"], r["score"]) for r in res] == manual
    # both collections contribute (the query term exists in each)
    assert {r["collection"] for r in res} == {"a", "b"}


def test_per_collection_stats_are_independent(spark, two_collections):
    """'binary' is rare in b (df=1 of 5) and common in a (df=3 of 4):
    b's sole match must outscore every a match — per-collection idf,
    no cross-collection stat blending (Gigablast collections share
    nothing)."""
    res = search_collections(
        spark, two_collections, "binary", k=10, enrich=False
    ).collect()
    assert res[0]["collection"] == "b"


def test_k_bounds_global_merge(spark, two_collections):
    res = search_collections(spark, two_collections, "binary", k=2).collect()
    assert len(res) == 2


def test_missing_term_in_one_collection(spark, two_collections):
    """'stream' never occurs in collection a: the federated result is
    b-only, and the empty a-side result unions cleanly."""
    res = search_collections(
        spark, two_collections, "stream", k=10, enrich=False
    ).collect()
    assert res and all(r["collection"] == "b" for r in res)


def test_enrich_carries_through_merge(spark, two_collections):
    res = search_collections(
        spark, two_collections, "binary", k=3, enrich=True
    )
    assert {"collection", "doc_id", "score", "repo", "path", "lang"} <= set(
        res.columns
    )
    rows = res.collect()
    assert all(r["repo"] in ("a", "b") and r["repo"] == r["collection"] for r in rows)


def test_collection_total_hits(spark, two_collections):
    rows = {
        r["collection"]: r["total_hits"]
        for r in collection_total_hits(
            spark, two_collections, ["binary"]
        ).collect()
    }
    assert rows == {"a": 3, "b": 1}


def test_collection_total_hits_repeated_term(spark, two_collections):
    """A repeated term is one constraint, not a dictionary miss."""
    rows = {
        r["collection"]: r["total_hits"]
        for r in collection_total_hits(
            spark, two_collections, ["binary", "binary"]
        ).collect()
    }
    assert rows == {"a": 3, "b": 1}


def test_total_hits_excludes_tombstones(spark, tmp_path):
    """The per-collection count line must agree with SERP visibility
    between delete_docs and compaction (merge-on-read tombstones)."""
    from open_source_search_engine_spark.operators.merge import delete_docs

    rows = [
        ("r", f"p{i}", "c", "py", txt)
        for i, txt in enumerate(
            ["binary search", "binary heap", "plain text here"]
        )
    ]
    schema = "repo string, path string, commit string, lang string, content string"
    idx = build_index(
        spark,
        spark.createDataFrame(rows, schema),
        str(tmp_path / "coll_del"),
        n_shards=1,
        code_aware=False,
        block_size=4,
        salt_target=1000,
    )
    colls = {"x": idx}
    before = collection_total_hits(spark, colls, ["binary"]).collect()[0]
    assert before["total_hits"] == 2
    hit = search_wand(spark, idx, "binary", k=1).collect()[0]
    delete_docs(spark, idx, [int(hit["doc_id"])])
    after = collection_total_hits(spark, colls, ["binary"]).collect()[0]
    assert after["total_hits"] == 1


def test_requires_a_collection(spark):
    with pytest.raises(ValueError):
        search_collections(spark, {}, "binary")


def test_batch_federated_equals_per_query(spark, two_collections):
    """N queries × C collections in C jobs == per-query federated search
    (same merge order: score desc, collection, doc_id)."""
    from open_source_search_engine_spark.plans.federate import (
        search_collections_batch,
    )

    queries = ["binary", "stream", "frame"]
    batch = search_collections_batch(spark, two_collections, queries, k=5)
    assert batch.columns[:4] == ["query", "collection", "doc_id", "score"]
    got: dict[str, list] = {}
    for r in batch.collect():
        got.setdefault(r["query"], []).append(
            (r["collection"], r["doc_id"], r["score"])
        )
    for q in queries:
        single = search_collections(spark, two_collections, q, k=5).collect()
        exp = [(r["collection"], r["doc_id"], r["score"]) for r in single]
        assert got.get(q, []) == exp, q


def test_cli_federated_search(spark, two_collections, capsys):
    """`search --index a,b` routes to the federated path and emits
    collection-tagged rows."""
    import io
    import json
    from contextlib import redirect_stdout

    from open_source_search_engine_spark.__main__ import main

    roots = ",".join(idx.root for _n, idx in sorted(two_collections.items()))
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["search", "--index", roots, "-q", "binary", "-k", "10"])
    rows = [json.loads(ln) for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(rows) == 4  # 3 in a + 1 in b
    assert {"collection", "doc_id", "score", "repo", "path", "lang"} <= set(
        rows[0]
    )
    err = capsys.readouterr().err
    assert '"engine": "federated-wand"' in err and '"collections": 2' in err


def test_cli_federated_rejects_unsupported_flags(spark, two_collections, capsys):
    """Flags the federated path doesn't implement fail loud (exit 2), not
    silently fall back to plain-WAND semantics."""
    from open_source_search_engine_spark.__main__ import main

    roots = ",".join(idx.root for _n, idx in sorted(two_collections.items()))
    with pytest.raises(SystemExit) as ei:
        main(["search", "--index", roots, "-q", "binary", "--boolean"])
    assert ei.value.code == 2
    assert "--boolean" in capsys.readouterr().err


def test_cli_trailing_comma_single_index(spark, two_collections, capsys):
    """`--index /path,` is one collection, not a path with a comma."""
    import io
    import json
    from contextlib import redirect_stdout

    from open_source_search_engine_spark.__main__ import main

    root = two_collections["a"].root
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["search", "--index", root + ",", "-q", "binary", "-k", "10"])
    rows = [json.loads(ln) for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(rows) == 3 and "collection" not in rows[0]
    capsys.readouterr()


def test_per_collection_k_below_k_rejected(spark):
    """Fetching fewer than k per collection can silently return a wrong
    global top-k (one dominant collection) — must be a loud error."""
    import pytest as _pytest

    from open_source_search_engine_spark.plans.federate import (
        search_collections,
    )

    with _pytest.raises(ValueError, match="per_collection_k"):
        search_collections(spark, {"a": object()}, "q", k=10, per_collection_k=5)
