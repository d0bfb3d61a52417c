"""F7/T4 numeric field terms: build-side num: lookup termlists and the
index-backed sortby/range plan (plans.sortby.search_sortby) — the posdb
key-bit value analog (Posdb.h getFloat/getInt, SURVEY §2.2/§2.6)."""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from open_source_search_engine_spark.operators.build import (  # noqa: E402
    build_index,
)
from open_source_search_engine_spark.plans.sortby import search_sortby  # noqa: E402


@pytest.fixture(scope="module")
def num_docs(spark):
    rows = [
        ("r/a", f"f{i}.py", "c1", "python", f"alpha beta doc{i} " + "tok " * i, i * 7)
        for i in range(40)
    ]
    # one null and one negative size: both must be dropped (no posting)
    rows.append(("r/a", "null.py", "c1", "python", "alpha null doc", None))
    rows.append(("r/a", "neg.py", "c1", "python", "alpha neg doc", -5))
    return rows


@pytest.fixture(scope="module")
def num_index(spark, num_docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("numidx"))
    df = spark.createDataFrame(
        num_docs,
        "repo string, path string, commit string, lang string, "
        "content string, size int",
    )
    return build_index(
        spark,
        df,
        root,
        n_shards=2,
        numeric_fields=("size",),
        block_size=8,  # several blocks per termlist so max_tf pruning engages
        salt_target=50_000,
    )


def _expected(num_docs, ascending=False, min_v=None, max_v=None, k=10):
    vals = [(r[5], r[1]) for r in num_docs if r[5] is not None and r[5] >= 0]
    if min_v is not None:
        vals = [v for v in vals if v[0] >= min_v]
    if max_v is not None:
        vals = [v for v in vals if v[0] <= max_v]
    vals.sort(key=lambda t: t[0], reverse=not ascending)
    return [v[0] for v in vals[:k]]


def test_sortby_desc_matches_python_oracle(spark, num_index, num_docs):
    got = [
        r.value
        for r in search_sortby(spark, num_index, "size", k=10).collect()
    ]
    assert got == _expected(num_docs, k=10)


def test_sortby_asc_and_range(spark, num_index, num_docs):
    got = [
        r.value
        for r in search_sortby(
            spark, num_index, "size", ascending=True, k=8, min_value=50,
            max_value=200,
        ).collect()
    ]
    assert got == _expected(num_docs, ascending=True, min_v=50, max_v=200, k=8)


def test_null_and_negative_values_not_indexed(spark, num_index):
    # 40 valid docs -> exactly 40 postings under num:size; the null and
    # negative rows contribute none
    all_rows = search_sortby(spark, num_index, "size", k=1000)
    assert all_rows.count() == 40


def test_min_value_prunes_blocks(spark, num_index):
    """The min_value bound must filter on block max_tf BEFORE decode —
    with block_size=8 over values 0..273 the floor excludes whole
    blocks, observable as fewer scanned block rows."""
    from open_source_search_engine_spark.functions.hashing import term_hash_py

    tid = int(term_hash_py("num:size"))
    blocks = num_index.postings.read(spark).filter(
        F.col("term_id") == F.lit(tid)
    )
    total = blocks.count()
    kept = blocks.filter(F.col("max_tf") >= 250).count()
    assert total > 1, "fixture must produce multiple blocks"
    assert kept < total, "a high floor must exclude at least one block"
    # and the pruned plan still returns the right answer
    got = [
        r.value
        for r in search_sortby(
            spark, num_index, "size", k=100, min_value=250
        ).collect()
    ]
    assert got == [273, 266, 259, 252]


def test_unindexed_field_raises(spark, num_index):
    with pytest.raises(ValueError, match="not an indexed numeric field"):
        search_sortby(spark, num_index, "doclen")


def test_docstats_doclen_unpolluted(spark, num_index):
    """Numeric lookup postings carry doclen 0 — docstats must still hold
    one row per doc with the REAL doclen (groupBy-max, not distinct)."""
    ds = num_index.docstats.read(spark)
    n = ds.count()
    assert n == ds.select("doc_id").distinct().count() == 42
    # doc f10 has content "alpha beta doc10 tok*10" -> doclen 13
    row = ds.filter(F.col("path") == "f10.py").collect()[0]
    assert row.doclen == 13


def test_delta_inherits_numeric_marker(spark, num_index, tmp_path_factory):
    from open_source_search_engine_spark.operators.build import Index
    from open_source_search_engine_spark.streaming.incremental import (
        add_documents,
    )

    root = str(tmp_path_factory.mktemp("numidx_delta"))
    df = spark.createDataFrame(
        [("r/a", "x.py", "c1", "python", "alpha one", 500)],
        "repo string, path string, commit string, lang string, "
        "content string, size int",
    )
    idx = Index(root)
    add_documents(spark, idx, df, numeric_fields=("size",), block_size=8)
    # second delta with default None inherits the marker
    df2 = spark.createDataFrame(
        [("r/a", "y.py", "c1", "python", "alpha two", 900)],
        "repo string, path string, commit string, lang string, "
        "content string, size int",
    )
    add_documents(spark, idx, df2, block_size=8)
    got = [r.value for r in search_sortby(spark, idx, "size", k=10).collect()]
    assert got == [900, 500]
    # an explicit mismatch on a non-fresh index raises
    with pytest.raises(ValueError, match="numeric_fields"):
        add_documents(spark, idx, df2, numeric_fields=())


def test_tombstones_excluded(spark, num_index, num_docs, tmp_path_factory):
    import shutil

    from open_source_search_engine_spark.operators.build import Index
    from open_source_search_engine_spark.operators.merge import delete_docs

    root = str(tmp_path_factory.mktemp("numidx_tomb"))
    shutil.rmtree(root)
    shutil.copytree(num_index.root, root)
    idx = Index(root)
    # tombstone the current top doc (value 273)
    top = search_sortby(spark, idx, "size", k=1).collect()[0]
    delete_docs(spark, idx, [top.doc_id])
    got = [r.value for r in search_sortby(spark, idx, "size", k=3).collect()]
    assert got == [266, 259, 252]
