"""Connected-components clustering (operators/dedup.py) — the
pairs -> dedup-groups step.  Star contraction must produce the unique
min-label fixpoint regardless of graph shape."""

import pytest

from open_source_search_engine_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a long, b long")


def _comp_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_two_components(spark):
    # {1,2,3} via chain, {10,11} separate
    m = _comp_map(connected_components(_pairs(spark, [(1, 2), (2, 3), (10, 11)])))
    assert m == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_logarithmically(spark):
    # a 64-node path is the adversarial case for naive min-propagation
    # (O(diameter)=63 rounds); star contraction must finish in O(log n)
    edges = [(i, i + 1) for i in range(63)]
    m = _comp_map(connected_components(_pairs(spark, edges), max_iter=12, driver_threshold=0))
    assert set(m.values()) == {0} and len(m) == 64


def test_cycle_and_cross_links(spark):
    edges = [(5, 6), (6, 7), (7, 5), (7, 3), (3, 9)]
    m = _comp_map(connected_components(_pairs(spark, edges)))
    assert set(m.values()) == {3} and set(m) == {3, 5, 6, 7, 9}


def test_empty_pairs(spark):
    out = connected_components(_pairs(spark, []))
    assert out.count() == 0
    assert out.columns == ["node", "component"]


def test_self_loops_ignored(spark):
    m = _comp_map(connected_components(_pairs(spark, [(4, 4), (4, 8)])))
    assert m == {4: 4, 8: 4}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _pairs(spark, [(i, i + 1) for i in range(40)]),
            max_iter=1,
            driver_threshold=0,
        )


def test_dedup_clusters_sheet(spark):
    rows = dedup_clusters(_pairs(spark, [(1, 2), (2, 3), (10, 11)])).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc[1]["is_canonical"] and by_doc[1]["cluster_size"] == 3
    assert not by_doc[3]["is_canonical"] and by_doc[3]["cluster_id"] == 1
    assert by_doc[10]["is_canonical"] and by_doc[10]["cluster_size"] == 2


def test_driver_and_distributed_paths_agree(spark):
    """The hybrid's contract: both physical paths produce the identical
    min-label fixpoint on an arbitrary graph (chains, a cycle, cross
    links, singleton pair, duplicate + reversed edges)."""
    edges = (
        [(i, i + 1) for i in range(20)]          # chain
        + [(100, 101), (101, 102), (102, 100)]   # cycle
        + [(10, 102), (300, 200)]                # cross link + pair
        + [(5, 4), (4, 5), (5, 4)]               # dup / reversed
    )
    fast = _comp_map(connected_components(_pairs(spark, edges)))
    slow = _comp_map(
        connected_components(_pairs(spark, edges), driver_threshold=0)
    )
    assert fast == slow
    assert fast[102] == 0 and fast[300] == 200
