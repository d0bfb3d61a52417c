"""Hybrid retrieval: BM25 lexical ranks fused with embedding-cosine
ranks via Reciprocal Rank Fusion (RRF).

Not in the reference (Gigablast is lexical-only) — added as a
training-data-pipeline extension: modern retrieval stacks pair the
inverted index with a vector index and fuse per-source RANKS (not
scores, whose scales are incomparable):

    rrf(d) = sum over sources s of 1 / (k_rrf + rank_s(d))

(Cormack, Clarke & Buettcher, SIGIR 2009 — public method.)  Spark shape:
both sources already end in a bounded top-N (TakeOrderedAndProject), so
fusion is a full-outer join of two <=N-row DataFrames plus one window
per side to materialize ranks — driver-trivial at any corpus size; all
the heavy lifting stays in the two underlying pruned plans (WAND posting
scan, embedding scan/IVF probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.build import Index
from ..operators.similarity import brute_force_topk


def _ranked(df: DataFrame, score_col: str, id_col: str, n: int, out: str) -> DataFrame:
    # single-partition window: the input is already a bounded top-N
    # candidate list (<= 2n rows), so the unpartitioned row_number is a
    # driver-scale sort, not a shuffle of table-sized data
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return (
        df.withColumn(out, F.row_number().over(w))
        .filter(F.col(out) <= n)
        .select(F.col(id_col).alias("doc_id"), out)
    )


def hybrid_rrf(
    spark: SparkSession,
    index: Index,
    embeddings: DataFrame,
    query: str,
    query_vec: list[float],
    k: int = 10,
    k_rrf: int = 60,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k fusion of the stored-index BM25 ranking for ``query`` and
    the exact cosine ranking for ``query_vec`` (embedding row ids are the
    corpus doc_ids).

    Ranks are computed on ROUNDED scores (4 dp) with doc_id tie-break on
    both sides — the same deterministic selection the engine's oracle
    entries use, so the fused output is exactly reproducible in SQL.
    Docs absent from a source carry rank sentinel 0 and contribute
    nothing to their RRF sum.  Output: (doc_id, bm25_rank, ann_rank,
    rrf) ordered by (rrf desc, doc_id).
    """
    from ..operators.topk import search_wand

    # 2x over-fetch then re-rank on the rounded score: identical
    # boundary discipline to _round_topk in the engine entries
    bm = search_wand(spark, index, query, k=2 * n_candidates, enrich=False)
    bm = _ranked(
        bm.select("doc_id", F.round("score", 4).alias("_s")),
        "_s", "doc_id", n_candidates, "bm25_rank",
    )
    ann = brute_force_topk(
        embeddings, query_vec, id_col=id_col, vec_col=vec_col,
        k=2 * n_candidates,
    )
    ann = _ranked(ann, "cosine", id_col, n_candidates, "ann_rank")

    fused = bm.join(ann, "doc_id", "full_outer").select(
        "doc_id",
        # long, not int: both engines' pandas outputs must carry the same
        # dtype for the driver's value-hash compare
        F.coalesce("bm25_rank", F.lit(0)).cast("long").alias("bm25_rank"),
        F.coalesce("ann_rank", F.lit(0)).cast("long").alias("ann_rank"),
    )
    rrf = F.round(
        F.when(F.col("bm25_rank") > 0,
               F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("bm25_rank"))
               ).otherwise(F.lit(0.0))
        + F.when(F.col("ann_rank") > 0,
                 F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("ann_rank"))
                 ).otherwise(F.lit(0.0)),
        6,
    )
    return (
        fused.withColumn("rrf", rrf)
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(k)
    )
