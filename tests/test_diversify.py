"""MMR diversified re-rank (plans/diversify.py)."""

from pyspark.sql import types as T

from open_source_search_engine_spark.plans.diversify import (
    diversify_ann,
    mmr_rerank,
)

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rel", T.DoubleType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def _cand(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_mmr_penalizes_near_duplicates(spark):
    # docs 1 and 2 are identical vectors with the top relevance; pure
    # top-k would return them adjacent — MMR must interleave doc 3
    rows = [
        (1, 0.99, [1.0, 0.0]),
        (2, 0.98, [1.0, 0.0]),
        (3, 0.50, [0.0, 1.0]),
    ]
    out = [
        r["doc_id"]
        for r in mmr_rerank(spark, _cand(spark, rows), k=3, lam=0.5).collect()
    ]
    assert out == [1, 3, 2]


def test_lam_one_is_pure_relevance(spark):
    rows = [
        (1, 0.9, [1.0, 0.0]),
        (2, 0.8, [1.0, 0.0]),
        (3, 0.7, [0.0, 1.0]),
    ]
    out = [
        r["doc_id"]
        for r in mmr_rerank(spark, _cand(spark, rows), k=3, lam=1.0).collect()
    ]
    assert out == [1, 2, 3]


def test_k_exceeding_candidates(spark):
    rows = [(7, 0.5, [1.0, 0.0]), (8, 0.4, [0.0, 1.0])]
    out = mmr_rerank(spark, _cand(spark, rows), k=10).collect()
    assert len(out) == 2
    assert [r["mmr_rank"] for r in out] == [1, 2]


def test_tie_breaks_toward_smaller_id(spark):
    rows = [(20, 0.5, [1.0, 0.0]), (10, 0.5, [0.0, 1.0])]
    out = [r["doc_id"] for r in mmr_rerank(spark, _cand(spark, rows), k=2).collect()]
    assert out[0] == 10


def test_diversify_ann_end_to_end(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i % 5), float((i * 3) % 7), 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = diversify_ann(spark, vecs, [1.0, 2.0, 1.0], k=5, n_candidates=20)
    rows = out.collect()
    assert len(rows) == 5
    assert [r["mmr_rank"] for r in rows] == [1, 2, 3, 4, 5]
    # rank 1 is always the globally most relevant candidate
    assert rows[0]["rel"] == max(r["rel"] for r in rows)
