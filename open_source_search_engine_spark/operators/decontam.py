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
