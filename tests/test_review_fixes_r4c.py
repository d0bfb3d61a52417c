"""Round-4 post-review fixes, batch 3 (core query path).

1. The WAND kernel's upper bounds and own-term score now use the OWNING
   slot's weight when a term appears in more than one slot (mutual
   synonym expansion) — the old term->weight dict kept whichever slot
   came last, which could understate bounds and skip true top-k blocks.
2. Sibling-slot probes score with the PROBED termlist's own stored
   doclens: anchor:/num: lookup termlists deliberately carry doclen 0,
   and the kernel must rank mixed queries identically to the exhaustive
   plan.
3. `_empty_result` column order matches the non-empty enriched path.
4. `with_prune_stats=True` refuses (ValueError) above the inline
   tombstone bound instead of shipping an unbounded dead array.
5. `snippets` reuses a corpus's own doc_id, handles phrase-first
   queries, and regex-quotes the highlighted term.
6. `facets_for_query` matches OR-groups on ANY member and no longer
   returns empty for quoted phrases.
7. Result/stats caches key on snapshot-file identity, so an in-place
   index rebuild cannot serve the old corpus's rows.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.build import build_index
from open_source_search_engine_spark.operators.topk import search_wand
from open_source_search_engine_spark.plans.exec import search
from open_source_search_engine_spark.plans.query import Group, QueryPlan, Term

SCHEMA = "repo string, path string, commit string, lang string, content string"

DOCS = [
    ("r/0", "a.py", "c1", "python", "fast lookup table fast"),
    ("r/0", "b.py", "c2", "python", "quick lookup table"),
    ("r/1", "c.py", "c3", "python", "fast quick lookup"),
    ("r/1", "d.py", "c4", "python", "slow scan list"),
    ("r/2", "e.py", "c5", "python", "table scan quick quick"),
]


@pytest.fixture(scope="module")
def widx(spark, tmp_path_factory):
    return build_index(
        spark,
        spark.createDataFrame(DOCS, SCHEMA),
        str(tmp_path_factory.mktemp("widx")),
        n_shards=2,
        code_aware=False,
        block_size=4,
        salt_target=1000,
    )


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_wand_shared_term_two_slots_matches_exhaustive(spark, widx):
    """Mutual synonym expansion puts the SAME term in two slots at
    different weights; the kernel must score and bound per-slot."""
    plan = QueryPlan(
        groups=[
            Group([Term("fast", weight=1.0), Term("quick", weight=0.4)]),
            Group([Term("quick", weight=1.0), Term("fast", weight=0.4)]),
        ],
        raw="fast~quick AND quick~fast",
    )
    wand = _rows(search_wand(spark, widx, plan, k=5, enrich=False))
    exact = _rows(search(spark, widx, plan, k=5, enrich=False))
    assert wand == exact and len(wand) > 0


def test_wand_zero_weight_slot_does_not_poison_bounds(spark, widx):
    """A zero-weight slot member sharing a term with a weighted slot must
    not zero the weighted slot's block bound (the old last-wins dict)."""
    plan = QueryPlan(
        groups=[
            Group([Term("table", weight=1.0)]),
            Group([Term("table", weight=0.0), Term("lookup", weight=1.0)]),
        ],
        raw="table AND (table0|lookup)",
    )
    wand = _rows(search_wand(spark, widx, plan, k=5, enrich=False))
    exact = _rows(search(spark, widx, plan, k=5, enrich=False))
    assert wand == exact and len(wand) > 0


def test_empty_result_schema_matches_nonempty(spark, widx):
    hit = search_wand(
        spark, widx, "table", k=3, enrich=True, with_prune_stats=True
    )
    miss = search_wand(
        spark, widx, "zzznotindict", k=3, enrich=True, with_prune_stats=True
    )
    assert miss.columns == hit.columns
    assert miss.count() == 0


def test_prune_stats_tombstone_overflow_raises(spark, tmp_path, monkeypatch):
    from open_source_search_engine_spark.operators import topk
    from open_source_search_engine_spark.operators.merge import delete_docs

    idx = build_index(
        spark,
        spark.createDataFrame(DOCS, SCHEMA),
        str(tmp_path / "idx"),
        n_shards=1,
        code_aware=False,
    )
    # deterministic victims (collect() order is not): delete one doc that
    # matches "table" (a.py) and two that don't, so the post-delete search
    # must still find b.py/e.py while honoring a.py's tombstone
    dead = [
        r["doc_id"]
        for r in idx.docstats.read(spark)
        .filter(F.col("path").isin("a.py", "c.py", "d.py"))
        .collect()
    ]
    assert len(dead) == 3
    delete_docs(spark, idx, dead)
    monkeypatch.setattr(topk, "MAX_DEAD_INLINE", 2)
    with pytest.raises(ValueError, match="tombstones"):
        search_wand(spark, idx, "table", k=3, with_prune_stats=True)
    # the plain path still answers (exhaustive fallback), tombstones honored
    got = {r["doc_id"] for r in search_wand(spark, idx, "table", k=5, enrich=False).collect()}
    assert got and not (got & set(dead))


def test_snippets_phrase_and_custom_doc_id(spark, tmp_path):
    from open_source_search_engine_spark.plans.serp import snippets

    docs = spark.createDataFrame(
        [(100 + i, *d) for i, d in enumerate(DOCS)], "doc_id long, " + SCHEMA
    )
    idx = build_index(
        spark, docs, str(tmp_path / "idx"), n_shards=1, code_aware=False
    )
    res = search(spark, idx, "lookup table", k=3, enrich=True)
    # custom doc_id corpus: the join must use the corpus's own ids
    out = snippets(spark, idx, res, docs, '"lookup table"').collect()
    assert len(out) == res.count() > 0
    assert all("**lookup**" in r["snippet"] for r in out)
    # regex metacharacters in the highlighted term must not break the
    # pattern (the term is \Q...\E-quoted)
    res1 = search(spark, idx, "lookup", k=3, enrich=True)
    plan = QueryPlan(groups=[Group([Term("look(up")])], raw="look(up")
    out2 = snippets(spark, idx, res1, docs, plan)
    assert out2.count() == res1.count()  # no PatternSyntaxException


def test_facets_or_group_counts_union(spark, widx):
    from open_source_search_engine_spark.plans.serp import facets_for_query

    both = {
        (r["value"], r["n"])
        for r in facets_for_query(spark, widx, "fast OR quick", fields=["repo"]).collect()
    }
    # fast-docs: a,c; quick-docs: b,c,e -> union a,b,c,e = r/0 x2, r/1 x1, r/2 x1
    assert both == {("r/0", 2), ("r/1", 1), ("r/2", 1)}


def test_facets_phrase_not_empty(spark, widx):
    from open_source_search_engine_spark.plans.serp import facets_for_query

    got = {
        (r["value"], r["n"])
        for r in facets_for_query(
            spark, widx, '"lookup table"', fields=["repo"]
        ).collect()
    }
    # token-match superset of docs containing both 'lookup' and 'table'
    assert got == {("r/0", 2)}


def test_inplace_rebuild_serves_fresh_results(spark, tmp_path):
    root = str(tmp_path / "idx")
    docs_a = spark.createDataFrame(DOCS, SCHEMA)
    idx = build_index(spark, docs_a, root, n_shards=1, code_aware=False)
    before = search(spark, idx, "table", k=5, enrich=False, use_cache=True)
    assert before.count() == 3
    # rebuild IN PLACE with a different corpus: version numbering restarts,
    # so only the snapshot-file identity distinguishes the two builds
    shutil.rmtree(root)
    docs_b = spark.createDataFrame(
        [("r/9", "z.py", "c9", "python", "table table table")], SCHEMA
    )
    idx2 = build_index(spark, docs_b, root, n_shards=1, code_aware=False)
    after = search(spark, idx2, "table", k=5, enrich=False, use_cache=True)
    rows = after.collect()
    assert len(rows) == 1  # stale stats/results would return 3 docs


def test_wand_anchor_doclen_parity(spark, tmp_path):
    """anchor: termlists store doclen 0; mixed anchor+content queries must
    rank identically through the kernel and the exhaustive plan."""
    from open_source_search_engine_spark.operators import links

    docs = spark.createDataFrame(
        [
            (0, "r/a", "doc/0", "c", "py", "alpha beta gamma delta"),
            (1, "r/a", "doc/1", "c", "py", "beta beta gamma alpha"),
            (2, "r/b", "doc/2", "c", "go", "gamma delta alpha beta"),
            (3, "r/b", "doc/3", "c", "go", "delta alpha beta gamma"),
        ],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string",
    )
    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (1, 3), (3, 2)], "src_doc_id long, dst_doc_id long"
    )
    idx = build_index(
        spark,
        docs,
        str(tmp_path / "aidx"),
        n_shards=2,
        code_aware=False,
        block_size=4,
        extra_postings=links.anchor_postings(docs, edges, n_tokens=2),
        extra_label="anchors:first2",
    )
    q = "anchor:beta gamma"
    wand = _rows(search_wand(spark, idx, q, k=10, enrich=False))
    exact = _rows(search(spark, idx, q, k=10, enrich=False))
    assert wand == exact and len(wand) > 0
