"""Fixed-point integer PageRank (operators/links.py pagerank)."""

import pyspark.sql.functions as F
import pytest

from open_source_search_engine_spark.operators.links import PR_SCALE, pagerank


def _docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")


def _edges(spark, pairs):
    return spark.createDataFrame(
        list(pairs), "src_doc_id bigint, dst_doc_id bigint"
    )


def _ranks(spark, ids, pairs, **kw):
    pr = pagerank(_docs(spark, ids), _edges(spark, pairs), **kw)
    return {r["doc_id"]: r["r"] for r in pr.collect()}


def _py_pagerank(ids, pairs, n_iter=5, damping=85):
    """Driver-side integer replay — the same math in plain Python."""
    n = len(ids)
    out = {}
    for s, d in pairs:
        out.setdefault(s, []).append(d)
    r = {i: PR_SCALE for i in ids}
    teleport = (100 - damping) * PR_SCALE // 100
    for _ in range(n_iter):
        inflow = {i: 0 for i in ids}
        dm = 0
        for i in ids:
            if i in out:
                share = r[i] // len(out[i])
                for d in out[i]:
                    inflow[d] += share
            else:
                dm += r[i]
        r = {
            i: teleport + (damping * (inflow[i] + dm // n)) // 100
            for i in ids
        }
    return r


def test_matches_python_replay_on_cycle_with_hub(spark):
    # 0 -> 1 -> 2 -> 0 cycle, plus 3 and 4 both pointing at 0 (hub)
    ids = [0, 1, 2, 3, 4]
    pairs = [(0, 1), (1, 2), (2, 0), (3, 0), (4, 0)]
    got = _ranks(spark, ids, pairs)
    assert got == _py_pagerank(ids, pairs)


def test_hub_outranks_leaves(spark):
    ids = [0, 1, 2, 3, 4]
    pairs = [(1, 0), (2, 0), (3, 0), (4, 0)]
    got = _ranks(spark, ids, pairs)
    assert got[0] > got[1]
    # the four leaves are symmetric — identical integer ranks
    assert len({got[i] for i in (1, 2, 3, 4)}) == 1


def test_dangling_mass_redistributed(spark):
    # 1 links to 0; 0 links nowhere (dangling).  Without redistribution
    # doc 0's mass would vanish from the system each step.
    ids = [0, 1]
    pairs = [(1, 0)]
    got = _ranks(spark, ids, pairs)
    assert got == _py_pagerank(ids, pairs)
    total = sum(got.values())
    # floor leaks only: total mass stays within n_iter*n units of 2*SCALE
    assert 2 * PR_SCALE - total <= 5 * 2 + 10


def test_partitioning_invariant_bit_exact(spark):
    ids = list(range(20))
    pairs = [(i, (i * 7 + 3) % 20) for i in ids] + [
        (i, (i * 11 + 5) % 20) for i in ids
    ]
    pairs = [(s, d) for s, d in pairs if s != d]
    # force the DISTRIBUTED supersteps on both runs (driver_threshold=0)
    a = _ranks(spark, ids, pairs, driver_threshold=0)
    docs = _docs(spark, ids).repartition(17)
    edges = _edges(spark, pairs).repartition(13)
    b = {
        r["doc_id"]: r["r"]
        for r in pagerank(docs, edges, driver_threshold=0).collect()
    }
    assert a == b


def test_driver_and_distributed_paths_agree(spark):
    # the hybrid convention's contract: identical BIGINT recurrence on
    # both paths, including a dangling node and an edge to a non-node
    ids = [0, 1, 2, 3, 4]
    pairs = [(0, 1), (1, 2), (2, 0), (3, 0), (3, 99)]  # 4 dangling; 99 unknown
    drv = _ranks(spark, ids, pairs)  # small graph -> driver path
    dist = _ranks(spark, ids, pairs, driver_threshold=0)
    assert drv == dist
    assert drv == _py_pagerank_unknown_dst(ids, pairs)


def _py_pagerank_unknown_dst(ids, pairs, n_iter=5, damping=85):
    # replay with the leak semantics: known-src outdeg counts ALL its
    # edges; shares to unknown dsts vanish
    n = len(ids)
    idset = set(ids)
    od = {}
    for s, d in pairs:
        if s in idset:
            od[s] = od.get(s, 0) + 1
    r = {i: PR_SCALE for i in ids}
    teleport = (100 - damping) * PR_SCALE // 100
    for _ in range(n_iter):
        inflow = {i: 0 for i in ids}
        for s, d in pairs:
            if s in idset and d in idset:
                inflow[d] += r[s] // od[s]
        dm = sum(r[i] for i in ids if i not in od)
        r = {
            i: teleport + (damping * (inflow[i] + dm // n)) // 100
            for i in ids
        }
    return r


def test_no_edges_graph_is_pure_teleport_plus_dangling(spark):
    ids = [0, 1, 2]
    got = _ranks(spark, ids, [])
    assert got == _py_pagerank(ids, [])
    # fully dangling: every doc keeps ~PR_SCALE (teleport + dm/n)
    for v in got.values():
        assert abs(v - PR_SCALE) <= 10


def test_damping_bounds_validated(spark):
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(_docs(spark, [0]), _edges(spark, []), damping_pct=101)


def test_pr_scale_capped_against_int64_overflow():
    from open_source_search_engine_spark.operators.links import (
        PR_SCALE,
        _pr_scale_for,
    )

    # full precision up to ~4.6e7 docs
    assert _pr_scale_for(1) == PR_SCALE
    assert _pr_scale_for(10_000_000) == PR_SCALE
    # the hub-inflow bound holds at every magnitude: 100 * N * scale
    # (the damped term's worst case) stays inside int64
    for n in (10**8, 10**10, 10**12, 10**15):
        s = _pr_scale_for(n)
        assert s >= 1
        assert 100 * n * s < 2**63
    # and rank precision is still meaningful at the docstring's 10^12
    assert _pr_scale_for(10**12) > 10_000
