"""Per-segment bloom pruning (functions/bloom.py + SnapshotTable.read_pruned)

The RdbMap file-pruning analog: Msg5 skips on-disk runs whose key range
excludes the requested termlist; here each postings segment carries a
bloom sidecar over its distinct term_ids and queries skip segments whose
bloom excludes every queried term.  Correctness bar: pruning must be a
pure superset-of-the-truth file-set narrowing — results identical with
and without it, no false negatives ever.
"""

import os

import numpy as np
import pytest

from open_source_search_engine_spark.functions import bloom as B
from open_source_search_engine_spark.operators.build import build_index
from open_source_search_engine_spark.operators.topk import search_wand
from open_source_search_engine_spark.plans.exec import search
from open_source_search_engine_spark.streaming.incremental import add_documents


# ---------------------------------------------------------------- unit level


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    ids = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    bl = B.build_bloom(ids)
    assert bool(B.might_contain(bl, ids).all())


def test_bloom_fpp_bounded():
    rng = np.random.default_rng(11)
    members = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    bl = B.build_bloom(members, fpp=0.01)
    probe = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    probe = np.setdiff1d(probe, members)
    fp = B.might_contain(bl, probe).mean()
    # 1% target; allow generous slack for hash variance
    assert fp < 0.03, fp


def test_empty_bloom_prunes_everything():
    bl = B.build_bloom([])
    assert bl["m"] == 0
    assert not B.might_contain_any(bl, [1, 2, 3])


def test_sidecar_roundtrip(tmp_path):
    seg = str(tmp_path / "seg-x")
    os.makedirs(seg)
    bl = B.build_bloom([10, 20, 30])
    B.write_sidecar(seg, bl)
    got = B.load_sidecar(seg)
    assert got == bl
    assert B.might_contain_any(got, [20])
    assert not B.might_contain_any(got, [99999999999])
    # missing sidecar -> None (never-prune contract for old segments)
    assert B.load_sidecar(str(tmp_path / "nope")) is None


# ---------------------------------------------------------- integration level

BASE_DOCS = [
    ("r/a", f"f{i}.py", f"c{i}", "python", "alpha bravo charlie delta")
    for i in range(8)
]
DELTA_DOCS = [
    ("r/b", "g0.go", "d0", "go", "zebra quagga okapi"),
    ("r/b", "g1.go", "d1", "go", "zebra okapi gnu"),
]


@pytest.fixture(scope="module")
def bloom_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloomidx"))
    docs = spark.createDataFrame(
        BASE_DOCS,
        "repo string, path string, commit string, lang string, content string",
    )
    idx = build_index(
        spark, docs, root, n_shards=2, code_aware=False, block_size=4
    )
    delta = spark.createDataFrame(
        DELTA_DOCS,
        "repo string, path string, commit string, lang string, content string",
    )
    add_documents(spark, idx, delta)
    return idx


def _tid(term):
    from open_source_search_engine_spark.functions.hashing import term_hash_py

    return int(term_hash_py(term))


def test_every_postings_segment_has_sidecar(bloom_index):
    snap = bloom_index.postings.latest()
    assert len(snap.segments) >= 3  # 2 build shards + >=1 delta
    for seg in snap.segments:
        assert os.path.exists(os.path.join(seg, B.SIDECAR)), seg


def test_pruning_skips_disjoint_segments(bloom_index):
    # 'zebra' exists ONLY in the delta segment; the two build-shard
    # segments' blooms must exclude it
    keep, total = bloom_index.postings.pruned_segments([_tid("zebra")])
    assert total >= 3
    assert len(keep) < total
    assert all("delta" in os.path.basename(s) for s in keep)
    # 'alpha' exists only in the base build -> delta segment pruned
    keep2, _ = bloom_index.postings.pruned_segments([_tid("alpha")])
    assert all("delta" not in os.path.basename(s) for s in keep2)
    # union of terms -> union of file sets (no cross-term false negative)
    keep3, _ = bloom_index.postings.pruned_segments(
        [_tid("zebra"), _tid("alpha")]
    )
    assert set(keep) | set(keep2) <= set(keep3)


def test_pruned_results_identical(spark, bloom_index):
    # both query paths answer from the pruned file set; results must match
    # each other and contain exactly the delta docs for a delta-only term
    w = search_wand(spark, bloom_index, "zebra", k=10, enrich=False)
    e = search(spark, bloom_index, "zebra", k=10, enrich=False)
    wr = sorted((r.doc_id, round(r.score, 9)) for r in w.collect())
    er = sorted((r.doc_id, round(r.score, 9)) for r in e.collect())
    assert wr == er
    assert len(wr) == 2


def test_all_excluded_still_correct_schema(spark, bloom_index):
    # a term in no segment: read_pruned serves one segment so the pushed
    # filter yields zero rows with the right schema (dictionary-missing
    # terms normally short-circuit earlier; this guards the direct API)
    df = bloom_index.postings.read_pruned(spark, [_tid("nonexistentterm")])
    assert df is not None
    assert df.filter(df.term_id == _tid("nonexistentterm")).count() == 0


def test_missing_sidecar_never_prunes(spark, bloom_index, tmp_path):
    # simulate a pre-bloom segment: removing a sidecar makes that segment
    # unconditionally scanned (back-compat contract)
    snap = bloom_index.postings.latest()
    victim = next(s for s in snap.segments if "delta" in os.path.basename(s))
    side = os.path.join(victim, B.SIDECAR)
    saved = open(side).read()
    os.remove(side)
    try:
        keep, total = bloom_index.postings.pruned_segments([_tid("alpha")])
        assert victim in keep  # no sidecar -> cannot be pruned
    finally:
        with open(side, "w") as f:
            f.write(saved)


def test_compacted_segment_gets_bloom(spark, bloom_index):
    from open_source_search_engine_spark.operators.merge import (
        compact_postings,
    )

    compact_postings(spark, bloom_index)
    snap = bloom_index.postings.latest()
    assert len(snap.segments) >= 1
    for seg in snap.segments:
        assert os.path.exists(os.path.join(seg, B.SIDECAR))
    # post-compaction queries still correct
    w = search_wand(spark, bloom_index, "zebra", k=10, enrich=False)
    assert w.count() == 2


# ------------------------------------------------- distributed build (r5 #2)


def test_distributed_bloom_bit_identical(spark, monkeypatch):
    # force the partial-bitmap fold even at toy size, across multiple
    # partitions with overlapping ids; result must be BIT-identical to
    # the single-pass driver build over the same distinct set
    rng = np.random.default_rng(23)
    ids = rng.integers(-(2**62), 2**62, size=4000, dtype=np.int64)
    ids = np.concatenate([ids, ids[:1000]])  # cross-partition duplicates
    df = spark.createDataFrame(
        [(int(x),) for x in ids], "term_id long"
    ).repartition(7)
    monkeypatch.setattr(B, "DRIVER_IDS_CAP", 10)  # force distributed path
    got = B.build_bloom_distributed(df, "term_id", chunk_bytes=64)
    want = B.build_bloom(ids)
    assert got == want


def test_distributed_bloom_never_pulls_id_list(spark, monkeypatch):
    # over-cap: the driver may receive the bitmap chunks and the count,
    # never the id list — spy toPandas and bound collect row counts
    ids = np.arange(3000, dtype=np.int64) * 7919 - 2**40
    df = spark.createDataFrame([(int(x),) for x in ids], "term_id long")
    monkeypatch.setattr(B, "DRIVER_IDS_CAP", 100)
    cls = type(spark.range(1))
    calls = {"toPandas": 0}
    real_topandas = cls.toPandas

    def spy_tp(self):
        calls["toPandas"] += 1
        return real_topandas(self)

    monkeypatch.setattr(cls, "toPandas", spy_tp)
    bl = B.build_bloom_distributed(df, "term_id")
    assert calls["toPandas"] == 0
    assert bl["n"] == 3000
    assert bool(B.might_contain(bl, ids).all())


def test_small_segment_direct_path_is_count_bounded(spark):
    # under the cap the direct pull is used and matches the driver build
    ids = np.arange(500, dtype=np.int64) - 250
    df = spark.createDataFrame([(int(x),) for x in ids], "term_id long")
    got = B.build_bloom_distributed(df, "term_id")
    assert got == B.build_bloom(ids)


def test_oversize_vocabulary_skips_sidecar(spark, tmp_path, monkeypatch):
    # above BLOOM_MAX_KEYS no sidecar is written (a bloom over a huge
    # compacted base would almost never prune); the segment is simply
    # always scanned — correctness unchanged
    from open_source_search_engine_spark.sources.tables import SnapshotTable

    monkeypatch.setattr(B, "BLOOM_MAX_KEYS", 100)
    t = SnapshotTable(str(tmp_path / "tbl"), "postings")
    df = spark.createDataFrame(
        [(int(i) * 7919,) for i in range(3000)], "term_id long"
    )
    seg = t.write_segment(df, label="big", bloom_col="term_id")
    assert B.load_sidecar(seg) is None
    # under the cap the sidecar appears again
    monkeypatch.setattr(B, "BLOOM_MAX_KEYS", 1 << 24)
    df2 = spark.createDataFrame([(int(i),) for i in range(50)], "term_id long")
    seg2 = t.write_segment(df2, label="small", bloom_col="term_id")
    bl = B.load_sidecar(seg2)
    assert bl is not None and bl["n"] == 50
