"""int8 scalar-quantized ANN (operators/similarity.py quantize_embeddings
/ quantized_topk): quantization invariants, exactness under full rerank,
recall monotonicity, and stored-vs-on-the-fly path identity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import similarity as S


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(13)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(16)]) for i in range(200)
    ]
    rows.append((200, [0.0] * 16))  # all-zero vector edge case
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


@pytest.fixture(scope="module")
def qv(vecs):
    return [float(x) for x in vecs.filter("vec_id = 0").collect()[0][1]]


def test_quantization_invariants(spark, vecs):
    q = S.quantize_embeddings(vecs).collect()
    assert len(q) == 201
    for r in q:
        assert r["scale"] >= 0.0
        assert all(-127 <= int(x) <= 127 for x in r["q"])
    # dequantization error bound: |x - q*scale| <= scale/2 (+ float eps)
    full = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    for r in q:
        x = np.asarray(full[r["vec_id"]], dtype=np.float64)
        back = np.asarray([int(v) for v in r["q"]], dtype=np.float64) * r["scale"]
        assert np.all(np.abs(x - back) <= r["scale"] / 2 + 1e-9)
    # zero vector: scale 0, all-zero codes
    z = next(r for r in q if r["vec_id"] == 200)
    assert z["scale"] == 0.0 and all(int(v) == 0 for v in z["q"])


def test_full_rerank_equals_exact(spark, vecs, qv):
    base = vecs.filter("vec_id <> 0 and vec_id <> 200")
    exact = S.brute_force_topk(base, qv, k=10).collect()
    quant = S.quantized_topk(base, qv, k=10, rerank=10_000).collect()
    assert [(r.vec_id, r.cosine) for r in exact] == [
        (r.vec_id, r.cosine) for r in quant
    ]


def test_recall_monotone_in_rerank(spark, vecs, qv):
    base = vecs.filter("vec_id <> 0 and vec_id <> 200")
    truth = {r.vec_id for r in S.brute_force_topk(base, qv, k=10).collect()}
    recalls = []
    for rr in (10, 40, 199):
        got = {r.vec_id for r in S.quantized_topk(base, qv, k=10, rerank=rr).collect()}
        recalls.append(len(got & truth) / len(truth))
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0  # rerank >= corpus -> exact
    # int8 over 16 dims is a fine quantizer: even small rerank recalls most
    assert recalls[0] >= 0.5


def test_stored_quantized_path_identical(spark, vecs, qv, tmp_path):
    # the at-scale shape: quantized table materialized at ingest and
    # handed in — results identical to on-the-fly quantization
    base = vecs.filter("vec_id <> 0 and vec_id <> 200")
    qt_path = str(tmp_path / "quant.parquet")
    S.quantize_embeddings(base).write.parquet(qt_path)
    stored = spark.read.parquet(qt_path)
    a = S.quantized_topk(base, qv, k=10, rerank=30).collect()
    b = S.quantized_topk(base, qv, k=10, rerank=30, quantized=stored).collect()
    assert [(r.vec_id, r.cosine) for r in a] == [(r.vec_id, r.cosine) for r in b]
    # and the stored schema is the 4x-smaller wire shape
    assert dict(stored.dtypes)["q"] == "array<tinyint>"
