"""MMR (maximal-marginal-relevance) diversified re-rank.

Not in the reference (Gigablast diversifies per-site only — W1 top-2 per
site, SURVEY §2.5); added as the training-data-pipeline extension: when
sampling documents for a training set (or a serp page), pure top-k by
relevance returns near-duplicates — MMR (Carbonell & Goldstein, SIGIR'98)
greedily picks argmax  lam*rel(c) - (1-lam)*max_{s in S} cos(c, s),
trading relevance against similarity to what's already selected.

Architecture: MMR is a RE-RANK stage — its input is a bounded top-N
candidate list (the retrieval stage's output), never the corpus.  The
greedy loop is inherently sequential in k, so it runs driver-side over
the collected candidates (N <= a few hundred rows), exactly like the
serp re-rank stages (proximity, RRF fusion) in plans/exec.py and
plans/hybrid.py; all heavy work (the cosine scan / WAND retrieval that
produced the candidates) stays distributed and pruned.

Oracle parity: every float op replays bit-exactly in DuckDB — dot
products and norms use LEFT-FOLD accumulation (the list_reduce order),
similarities are rounded to 4 decimals before use, and the SQL literals
for lam / (1-lam) are generated from the same Python doubles (1-0.7 is
0.30000000000000004, not 0.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _fold_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _fold_norm(a: list[float]) -> float:
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return acc**0.5


def mmr_rerank(
    spark: SparkSession,
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "doc_id",
    rel_col: str = "rel",
    emb_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR over a bounded candidate list -> (doc_id, mmr_rank, rel).

    ``candidates`` must already be the bounded top-N of a retrieval stage
    (rel = its relevance score, rounded); ties in the greedy argmax break
    toward the smaller id, making the output deterministic.
    """
    rows = candidates.select(id_col, rel_col, emb_col).collect()
    ids = [int(r[0]) for r in rows]
    rel = [float(r[1]) for r in rows]
    embs = [[float(x) for x in r[2]] for r in rows]
    n = len(ids)
    norms = [_fold_norm(e) for e in embs]
    # pairwise candidate similarities, rounded BEFORE use (oracle rounds
    # identically); n <= a few hundred, so n^2 * dim stays trivial
    sim = [[0.0] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            denom = norms[i] * norms[j]
            # an all-zeros embedding (padded/missing) has no direction:
            # similarity 0 to everything, never a ZeroDivisionError
            c = round(_fold_dot(embs[i], embs[j]) / denom, 4) if denom else 0.0
            sim[i][j] = c
            sim[j][i] = c
    one_minus = 1 - lam
    picked: list[int] = []
    remaining = list(range(n))
    while remaining and len(picked) < k:
        best = None
        best_score = None
        for i in remaining:
            penalty = max((sim[i][j] for j in picked), default=0.0)
            score = lam * rel[i] - one_minus * penalty
            # argmax with ties toward the smaller doc_id (candidate order
            # need not be id order, so compare explicitly)
            if (
                best is None
                or score > best_score
                or (score == best_score and ids[i] < ids[best])
            ):
                best, best_score = i, score
        picked.append(best)
        remaining.remove(best)
    out = [
        (ids[i], rank + 1, rel[i]) for rank, i in enumerate(picked)
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("mmr_rank", T.IntegerType()),
            T.StructField("rel", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(out, schema)


def diversify_ann(
    spark: SparkSession,
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_candidates: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine top-N retrieval (distributed, TakeOrderedAndProject)
    -> MMR re-rank to k (driver-side over the bounded list).  The
    candidate embeddings ride THROUGH the top-k heap (keep_vec) — one
    scan of the vector table total, not a second scan + join to recover
    the N vectors the re-rank needs."""
    from ..operators.similarity import brute_force_topk

    topn = brute_force_topk(
        vectors, query_vec, id_col=id_col, vec_col=vec_col,
        k=n_candidates, keep_vec=True,
    )
    cand = topn.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col("cosine").alias("rel"),
        F.col(vec_col).alias("embedding"),
    )
    return mmr_rerank(spark, cand, k=k, lam=lam)
