"""Train/test decontamination: n-gram overlap against an eval set.

A pretraining pipeline must drop (or at least flag) training documents
that leak evaluation data — the standard practice (GPT-3 appendix C,
PaLM, The Pile) is n-gram collision: a train doc is contaminated if it
shares at least ``min_hits`` distinct word n-grams (n typically 8-13)
with any document in the eval set.

Spark plan, shaped for the 100-TB asymmetry (train is petabytes, eval
sets are megabytes):

- the EVAL side collapses to its distinct n-gram set and is
  **broadcast** — no shuffle of the train corpus, ever;
- the TRAIN side is a single scan: tokenize -> distinct n-grams ->
  explode -> broadcast-hash semi-join on the gram -> partial-aggregated
  ``groupBy(doc_id)``.  The only exchange carries one row per
  (contaminated doc, matched gram) — a vanishing fraction of the corpus;
- everything is built-in column expressions (no Python UDFs), so the
  scan stays inside whole-stage codegen and the tokenizer is replayable
  in ANSI SQL (the driver's DuckDB oracle runs the identical rule).

Reference analog: Gigablast's dup-detection infrastructure (Dedup.cpp /
SURVEY.md §2.3 J8) is the same shape — shared-fragment lookup against a
reference set — applied here to the train-vs-eval split instead of
doc-vs-doc.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles
from .textstats import tokens_simple


def _doc_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, grams, n_grams): distinct word n-grams per document."""
    return df.select(
        F.col(id_col),
        F.array_distinct(shingles(tokens_simple(F.col(text_col)), n)).alias(
            "grams"
        ),
    ).withColumn("n_grams", F.size("grams"))


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Contamination report: one row per train doc sharing >= ``min_hits``
    distinct ``n``-grams with the eval set.

    Returns (id_col, n_hit, n_grams, hit_ratio) — ``n_hit`` = distinct
    train-doc n-grams that occur anywhere in the eval set, ``hit_ratio``
    = n_hit / n_grams.  Filtering the train corpus is then a broadcast
    anti-join of this (tiny) report back onto the corpus.

    The eval gram set is broadcast: contamination checks must not
    shuffle the train side (it is the 100-TB side).  A real deployment
    caps the broadcast by the eval-set size, which is bounded by
    construction (eval sets are curated, not crawled).
    """
    test_grams = (
        _doc_grams(test, id_col, text_col, n)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    train_grams = _doc_grams(train, id_col, text_col, n).select(
        id_col, "n_grams", F.explode("grams").alias("gram")
    )
    hits = train_grams.join(F.broadcast(test_grams), "gram")
    return (
        # grams are distinct per doc before the explode, so count(*) IS
        # the distinct-hit count — no countDistinct shuffle needed
        hits.groupBy(id_col, "n_grams")
        .agg(F.count("*").alias("n_hit"))
        .where(F.col("n_hit") >= min_hits)
        .select(
            id_col,
            "n_hit",
            "n_grams",
            F.round(F.col("n_hit") / F.col("n_grams"), 4).alias("hit_ratio"),
        )
    )


def decontaminated_corpus(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """The train corpus minus contaminated docs (broadcast anti-join of
    the report — the report is small by construction, the corpus is
    never shuffled)."""
    report = decontaminate(train, test, id_col, text_col, n, min_hits)
    return train.join(
        F.broadcast(report.select(id_col)), id_col, "left_anti"
    )


def decontaminate_semantic(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
) -> DataFrame:
    """SEMANTIC contamination report: one row per train vector whose
    embedding cosine to ANY eval vector reaches ``threshold`` —
    (id_col, n_hits, max_cosine).  The embedding twin of
    :func:`decontaminate`: paraphrased eval leakage that shares no 8-gram
    still lands next to the eval set in embedding space.

    Plan shape (the same 100-TB asymmetry as the n-gram pass): the eval
    side is **broadcast** into a BroadcastNestedLoopJoin against the
    train scan — the train corpus is never shuffled; per-row cost is
    ``|eval| * dim`` fused multiply-adds inside whole-stage codegen (no
    Python), and the only exchange carries the (tiny) per-contaminated-
    doc aggregate.  Cosines are rounded to 4 digits BEFORE the threshold
    and the max, so membership is bit-reproducible against the DuckDB
    oracle (the pairwise_cosine convention).
    """
    from .similarity import cosine_col

    ev = test.select(F.col(vec_col).cast("array<double>").alias("_ev"))
    tr = train.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_tv")
    )
    cos = F.round(cosine_col(F.col("_tv"), F.col("_ev")), 4)
    hits = (
        tr.crossJoin(F.broadcast(ev))
        .select(id_col, cos.alias("cosine"))
        .where(F.col("cosine") >= float(threshold))
    )
    return hits.groupBy(id_col).agg(
        F.count("*").alias("n_hits"), F.max("cosine").alias("max_cosine")
    )


def decontaminate_semantic_matmul(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
) -> DataFrame:
    """Arrow/BLAS fast path for :func:`decontaminate_semantic` — same
    report, same rounding grid, computed as one numpy matmul per Arrow
    batch against the (driver-collected, closure-broadcast) eval matrix.

    Eval sets are curated and megabyte-sized by construction, so the
    collect is bounded; the train side remains a single scan with no
    shuffle before the aggregate-sized output.  Rows whose vector is
    NULL or whose length differs from the eval dim produce no hits —
    exactly what the expression path's NULL-propagating ``zip_with``
    fold does."""
    import pyarrow as pa

    ev_rows = [
        r[0]
        for r in test.select(F.col(vec_col).cast("array<double>")).collect()
        if r[0] is not None
    ]
    if not ev_rows:
        return train.sparkSession.createDataFrame(
            [], f"{id_col} long, n_hits long, max_cosine double"
        )
    dims = {len(v) for v in ev_rows}
    if len(dims) != 1:
        raise ValueError(f"decontaminate_semantic: mixed eval dims {sorted(dims)}")
    dim = dims.pop()
    emat = np.asarray(ev_rows, dtype=np.float64)
    enorm = np.linalg.norm(emat, axis=1)
    thr = float(threshold)

    def kernel(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            vecs = batch.column(1)
            out_id, out_n, out_max = [], [], []
            for j in range(batch.num_rows):
                v = vecs[j].as_py()
                if v is None or len(v) != dim:
                    continue
                tv = np.asarray(v, dtype=np.float64)
                tn = np.linalg.norm(tv)
                if tn == 0.0:
                    continue
                cos = np.round(emat @ tv / (enorm * tn), 4)
                mask = cos >= thr
                n = int(mask.sum())
                if n:
                    out_id.append(int(ids[j]))
                    out_n.append(n)
                    out_max.append(float(cos[mask].max()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.asarray(out_id, dtype=np.int64)),
                    pa.array(np.asarray(out_n, dtype=np.int64)),
                    pa.array(np.asarray(out_max, dtype=np.float64)),
                ],
                [id_col, "n_hits", "max_cosine"],
            )

    src = train.select(
        F.col(id_col).cast("long"), F.col(vec_col).cast("array<double>")
    )
    return src.mapInArrow(kernel, f"{id_col} long, n_hits long, max_cosine double")
