"""Similarity search over embedding columns (array<float>).

Not in the reference (Gigablast has no vector search) — added as the
training-data-pipeline extension mandated for this rebuild: brute-force
cosine top-k as the exact baseline, plus an LSH-bucketed variant
(random-hyperplane signs) as the 100 TB scale path: candidates are
generated per bucket, scored exactly, so recall degrades gracefully with
fewer probed buckets instead of cost growing with corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Left-fold dot product with zip_with + aggregate (JVM-side, no UDF).
    Fold order is left-to-right — matches DuckDB list_reduce for oracle
    parity on float accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: one scan + TakeOrderedAndProject (no shuffle of
    the full table — the per-partition heap merges at the driver, the same
    physical shape as the BM25 top-k)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = vectors.select(
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 4).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def lsh_bucketed_topk(
    vectors: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket of the query is
    scanned exactly; other buckets are pruned at the parquet scan
    (partition/row-group pruning on the bucket column at scale)."""
    import numpy as np

    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket_expr(vec: Column) -> Column:
        bits = [
            F.when(
                _dot(vec, F.array(*[F.lit(float(p)) for p in planes[i]])) >= 0, 1 << i
            ).otherwise(0)
            for i in range(n_planes)
        ]
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out

    v = vectors.withColumn("_bucket", bucket_expr(F.col(vec_col).cast("array<double>")))
    qb = int(
        sum(
            (1 << i) if float(np.dot(planes[i], np.asarray(query_vec))) >= 0 else 0
            for i in range(n_planes)
        )
    )
    return brute_force_topk(
        v.filter(F.col("_bucket") == qb), query_vec, id_col, vec_col, k
    )


def pairwise_cosine_above(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs (a < b, cosine >= threshold).  Exact; the
    scale path first buckets by LSH signature then verifies within
    buckets (same candidate-bound pattern as dedup.minhash_lsh_pairs)."""
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    return (
        v.alias("l")
        .join(v.alias("r"), F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.round(cosine_col(F.col("l.v"), F.col("r.v")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
