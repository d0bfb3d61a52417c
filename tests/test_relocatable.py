"""Snapshot log stores segment paths relative to the table dir, so an
index directory is a self-contained artifact: rename/copy/move it and
query the new location (the property the engine-entry cache's atomic
build-then-rename relies on, and what real object-store relocation
needs)."""

import shutil

from open_source_search_engine_spark.operators.build import Index, build_index
from open_source_search_engine_spark.operators.merge import delete_docs
from open_source_search_engine_spark.operators.topk import search_wand
from open_source_search_engine_spark.plans.exec import search

DOCS = [
    ("r/a", "a.py", "c1", "python", "alpha beta gamma"),
    ("r/a", "b.py", "c2", "python", "alpha delta"),
    ("r/b", "c.py", "c3", "python", "epsilon zeta alpha"),
]
SCHEMA = "repo string, path string, commit string, lang string, content string"


def test_index_dir_is_relocatable(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    src = str(tmp_path / "idx_orig")
    idx = build_index(spark, docs, src, n_shards=1, code_aware=False, block_size=4)
    before = {
        (r["path"], round(r["score"], 9))
        for r in search(spark, idx, "alpha", k=10).collect()
    }
    assert len(before) == 3

    dst = str(tmp_path / "idx_moved")
    shutil.move(src, dst)
    moved = Index(dst)
    after = {
        (r["path"], round(r["score"], 9))
        for r in search(spark, moved, "alpha", k=10).collect()
    }
    assert after == before
    wand = {
        (r["path"], round(r["score"], 9))
        for r in search_wand(spark, moved, "alpha", k=10).collect()
    }
    assert wand == before

    # a COPY diverges independently: tombstone in the copy must not leak
    # into the original (segments resolve inside each root)
    cp = str(tmp_path / "idx_copy")
    shutil.copytree(dst, cp)
    copy = Index(cp)
    victim = (
        copy.docstats.read(spark).filter("path = 'a.py'").collect()[0]["doc_id"]
    )
    delete_docs(spark, copy, [victim])
    assert {r["path"] for r in search(spark, copy, "alpha", k=10).collect()} == {
        "b.py",
        "c.py",
    }
    assert {
        (r["path"], round(r["score"], 9))
        for r in search(spark, moved, "alpha", k=10).collect()
    } == before
