"""T3 at scale: keyset deep paging (search_after cursor).

The cursor is an admission predicate on the WAND kernel heap (and a
filter over the exhaustive plan's scored relation), so page n costs one
O(k)-memory pass — unlike offset(n), whose merged row count grows with
depth.  Reference analog: Msg40 re-running the query with a larger
docsToGet and slicing (s=/n= CGI paging); the cursor variant is the form
that stays O(k) on a sharded index.
"""

import pytest

from open_source_search_engine_spark.operators.build import build_index
from open_source_search_engine_spark.operators.topk import search_wand
from open_source_search_engine_spark.plans.exec import search
from open_source_search_engine_spark.sources.corpus import synth_documents


@pytest.fixture(scope="module")
def page_index(spark, tmp_path_factory):
    docs = synth_documents(spark, 150, partitions=4)
    root = str(tmp_path_factory.mktemp("pageidx"))
    return build_index(
        spark, docs, root, n_shards=2, block_size=16, salt_target=200
    )


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_cursor_pages_tile_the_full_ranking(spark, page_index):
    """page1 + page2 + page3 via cursors == the exhaustive top-30, in
    order, with no overlap and no gaps — for both query paths."""
    full = _rows(search(spark, page_index, "def return", k=30, enrich=False))
    assert len(full) == 30
    for fn in (search_wand, search):
        pages, cursor = [], None
        for _ in range(3):
            page = fn(
                spark, page_index, "def return", k=10, enrich=False,
                after=cursor,
            ).collect()
            assert len(page) == 10
            pages.extend((r["doc_id"], round(r["score"], 9)) for r in page)
            cursor = (float(page[-1]["score"]), int(page[-1]["doc_id"]))
        assert pages == full, fn.__name__


def test_cursor_equals_offset(spark, page_index):
    """The cursor page == the offset slice of the same ranking."""
    full = _rows(search(spark, page_index, "def", k=25, enrich=False))
    p1 = search_wand(spark, page_index, "def", k=10, enrich=False).collect()
    cur = (float(p1[-1]["score"]), int(p1[-1]["doc_id"]))
    p2 = _rows(
        search_wand(spark, page_index, "def", k=10, enrich=False, after=cur)
    )
    assert p2 == full[10:20]


def test_cursor_on_tied_scores_pages_by_doc_id(spark, tmp_path_factory):
    """Exact score ties (identical docs) page deterministically by doc_id
    — the cursor predicate's (score ==, doc_id >) arm."""
    # 6 identical single-token docs => 6 identical BM25 scores
    rows = [("r", f"p{i}.py", "c", "python", "needle alpha beta") for i in range(6)]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    root = str(tmp_path_factory.mktemp("tieidx"))
    idx = build_index(spark, docs, root, n_shards=1,
                      code_aware=False, block_size=4, salt_target=100)
    full = search(spark, idx, "needle", k=6, enrich=False).collect()
    assert len(full) == 6
    scores = {round(r["score"], 9) for r in full}
    assert len(scores) == 1  # all tied
    ids = [r["doc_id"] for r in full]
    assert ids == sorted(ids)  # doc_id asc tie-break
    cur = (float(full[2]["score"]), int(full[2]["doc_id"]))
    nxt = search_wand(spark, idx, "needle", k=6, enrich=False,
                      after=cur).collect()
    assert [r["doc_id"] for r in nxt] == ids[3:]


def test_cursor_past_the_end_returns_empty_with_schema(spark, page_index):
    """A cursor below every score yields an empty page, same schema."""
    out = search_wand(
        spark, page_index, "def return", k=10, enrich=True,
        after=(-1.0, 0),
    )
    assert out.count() == 0
    assert out.columns == ["doc_id", "score", "repo", "path", "lang"]


def test_cursor_threads_through_fallback_paths(spark, page_index):
    """Phrase queries on a bigram-less index fall back to the exhaustive
    plan; the cursor must survive the fallback."""
    q = '"id0xa34b id1xdcef"'  # zipf-head pair: >100 matching docs
    # cursor must carry the EXACT score (the API contract): a rounded
    # score misplaces docs whose exact scores straddle the rounding
    full = search(spark, page_index, q, k=20, enrich=False).collect()
    assert len(full) == 20
    cur = (float(full[9]["score"]), int(full[9]["doc_id"]))
    p2 = _rows(
        search_wand(spark, page_index, q, k=10, enrich=False, after=cur)
    )
    assert p2 == [(r["doc_id"], round(r["score"], 9)) for r in full[10:20]]


def test_cursor_on_kernel_phrase_path(spark, tmp_path_factory):
    """On a bigram index the quoted phrase rides the WAND kernel (pair
    termlist slots + in-kernel positional verify); the cursor must page
    that path identically to the exhaustive plan."""
    docs = synth_documents(spark, 150, partitions=4)
    root = str(tmp_path_factory.mktemp("pageidx_bg"))
    idx = build_index(spark, docs, root, n_shards=2, block_size=16,
                      salt_target=200, bigram_terms=True)
    q = '"id0xa34b id1xdcef"'
    full = search(spark, idx, q, k=20, enrich=False).collect()
    assert len(full) == 20
    cur = (float(full[9]["score"]), int(full[9]["doc_id"]))
    p2 = _rows(
        search_wand(spark, idx, q, k=10, enrich=False, after=cur)
    )
    assert p2 == [(r["doc_id"], round(r["score"], 9)) for r in full[10:20]]


def test_cursor_rejects_proximity_rerank(spark, page_index):
    with pytest.raises(ValueError, match="keyset paging"):
        search(spark, page_index, "def return", k=10, enrich=False,
               proximity_bonus=0.5, after=(1.0, 0)).collect()


def test_cursor_is_part_of_the_cache_key(spark, page_index):
    """use_cache=True must not serve page 1 for a page-2 cursor."""
    p1 = _rows(search_wand(spark, page_index, "def return", k=10,
                           enrich=False, use_cache=True))
    last = search_wand(spark, page_index, "def return", k=10,
                       enrich=False).collect()[-1]
    p2 = _rows(search_wand(
        spark, page_index, "def return", k=10, enrich=False, use_cache=True,
        after=(float(last["score"]), int(last["doc_id"])),
    ))
    assert p1 != p2
    assert not set(p1) & set(p2)
