"""IVF ANN (similarity.ivf_topk): full-probe exactness, pruning, recall.

Mirrors the LSH variant's verification strategy: nprobe == nlist must
equal brute force on ANY input (the oracle-certified mode), pruned
probes must only ever DROP results (subset property), and recall must be
monotone in nprobe.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import similarity


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    # 3 well-separated gaussian blobs + a few duplicates (tie exercise)
    centers = rng.standard_normal((3, 8)) * 5.0
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(40):
            v = centers[c] + rng.standard_normal(8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    rows.append((vid, rows[0][1]))  # exact duplicate of vec 0
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_full_probe_equals_brute_force(spark, vecs):
    q = [1.0] * 8
    exact = _ids(similarity.brute_force_topk(vecs, q, k=10))
    for nlist in (1, 4, 16):
        got = _ids(similarity.ivf_topk(vecs, q, k=10, nlist=nlist, nprobe=nlist))
        assert got == exact


def test_pruned_probe_returns_subset(spark, vecs):
    q = [1.0] * 8
    exact = set(_ids(similarity.brute_force_topk(vecs, q, k=121)))
    got = similarity.ivf_topk(vecs, q, k=121, nlist=8, nprobe=2)
    rows = got.collect()
    assert 0 < len(rows) < 121  # pruning actually dropped cells
    assert {r["vec_id"] for r in rows} <= exact


def test_recall_monotone_in_nprobe(spark, vecs):
    q = [float(x) for x in vecs.filter(F.col("vec_id") == 5).collect()[0][1]]
    exact = set(_ids(similarity.brute_force_topk(vecs, q, k=10)))
    last = -1.0
    for nprobe in (1, 4, 8):
        got = set(_ids(similarity.ivf_topk(vecs, q, k=10, nlist=8, nprobe=nprobe)))
        recall = len(got & exact) / len(exact)
        assert recall >= last
        last = recall
    assert last == 1.0  # full probe at the end recovers everything


def test_empty_input(spark, vecs):
    empty = vecs.filter(F.col("vec_id") < 0)
    assert similarity.ivf_topk(empty, [1.0] * 8, k=5).count() == 0


def test_cell_assignment_partitions_all_rows(spark, vecs):
    """Every vector lands in exactly one cell, cells cover 0..nlist-1 ids
    only, and the nearest-centroid rule holds on a spot-checked row."""
    v = vecs.select("vec_id", F.col("embedding").cast("array<double>").alias("_v"))
    cents = v.orderBy("vec_id").limit(4).collect()
    sims = [
        F.struct(
            similarity.cosine_col(
                F.col("_v"), F.array(*[F.lit(float(x)) for x in r["_v"]])
            ).alias("s"),
            F.lit(-i).alias("ni"),
        )
        for i, r in enumerate(cents)
    ]
    assigned = v.withColumn("_cell", -F.array_max(F.array(*sims))["ni"])
    cells = assigned.groupBy("_cell").count().collect()
    assert {r["_cell"] for r in cells} <= set(range(4))
    assert sum(r["count"] for r in cells) == vecs.count()
    # duplicate of centroid 0 must share centroid 0's cell
    dup_id = vecs.count() - 1
    c0 = assigned.filter(F.col("vec_id") == 0).collect()[0]["_cell"]
    cd = assigned.filter(F.col("vec_id") == dup_id).collect()[0]["_cell"]
    assert c0 == cd == 0


# ---- r4: deterministic spherical k-means centroids (kmeans_iters > 0) ----


def test_kmeans_full_probe_still_exact(spark, vecs):
    """Centroid quality moves recall, never correctness: full probe with
    k-means centroids == brute force, same as the seed-sample mode."""
    q = [1.0] * 8
    exact = _ids(similarity.brute_force_topk(vecs, q, k=10))
    got = _ids(
        similarity.ivf_topk(vecs, q, k=10, nlist=8, nprobe=8, kmeans_iters=3)
    )
    assert got == exact


def test_kmeans_is_deterministic(spark, vecs):
    v = vecs.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_v")
    )
    a = similarity.kmeans_centroids(v, 8, 3, "vec_id")
    b = similarity.kmeans_centroids(v, 8, 3, "vec_id")
    assert a == b
    assert len(a) == 8
    for c in a:  # spherical: means are unit-normalized
        assert abs(float(np.linalg.norm(np.array(c))) - 1.0) < 1e-9


def test_kmeans_iters_zero_reproduces_seed_sample(spark, vecs):
    v = vecs.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_v")
    )
    seed = similarity.kmeans_centroids(v, 4, 0, "vec_id")
    raw = [list(map(float, r["_v"])) for r in v.orderBy("vec_id").limit(4).collect()]
    assert seed == raw


def test_kmeans_improves_blob_recall_at_nprobe1(spark, vecs):
    """The fixture is 3 tight blobs but the seed-sample centroids all
    come from blob 0 (smallest ids) — with Lloyd rounds the centroids
    spread to the blobs, so nprobe=1 recall for a query AT a non-seed
    blob member must not regress and, on this data, must reach 1.0."""
    q = [float(x) for x in vecs.filter(F.col("vec_id") == 90).collect()[0][1]]
    exact = set(_ids(similarity.brute_force_topk(vecs, q, k=10)))

    def recall(iters):
        got = set(
            _ids(
                similarity.ivf_topk(
                    vecs, q, k=10, nlist=3, nprobe=1, kmeans_iters=iters
                )
            )
        )
        return len(got & exact) / len(exact)

    r0, r3 = recall(0), recall(3)
    assert r3 >= r0
    assert r3 == 1.0
