"""Composed training-data curation pipeline (the "prepare a training
mix" operator a 100-TB pretraining corpus actually runs).

Every stage already exists as a certified primitive — quality scoring
and language-ID (`operators/textstats.py`), exact dedup
(`operators/dedup.py`), deterministic stratified quota sampling
(`operators/sampling.py`).  This module composes them into ONE
declarative DataFrame plan, which is how they are used in practice:

    annotate -> quality gate -> language gate -> exact dedup
             -> per-source quota sample

Composition properties that matter at scale:

- stages 1–3 are pure column expressions fused into the SAME
  whole-stage-codegen scan (no materialization between "steps" — the
  pipeline is a plan, not a job sequence);
- the two window stages (dedup by content hash, quota by stratum) are
  the only shuffles, each keyed and rank-limited so Spark's window
  top-k rewrite applies a per-partition limit pushdown;
- selection is keyed on content hashes throughout (md5), so the output
  is deterministic, partitioning-invariant, and replayable row-for-row
  by an independent engine — rerunning the mix on a different cluster
  size yields the identical corpus (the reproducibility property
  `df.sample()`-based pipelines lack).

Reference analog: Gigablast's doc pipeline gates documents through
quality/spam scoring before indexing (Spam.cpp word-repetition,
SURVEY.md §2.8 X13) and dedups at query and build time (Msg Dedup,
§2.3 J8); the training-mix shape extends that gate-then-select pattern
to corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import textstats
from .sampling import stratified_sample


def training_mix(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "source",
    quality_min: float = 0.7,
    lang: str | None = "en",
    n_per_stratum: int = 5,
) -> DataFrame:
    """Curate a deterministic training mix from a raw document table.

    Returns (id_col, strata_col, quality, n_tokens), ordered by id — the
    selected corpus manifest.  Stages (all in one plan):

    1. annotate: composite quality score (length band + diversity +
       stopword presence, 4 dp) and stopword-ratio language ID;
    2. gate: ``quality >= quality_min`` and (if ``lang`` is not None)
       predicted language == ``lang``;
    3. exact dedup: one survivor per md5(text) group, smallest id wins
       (J8's query-time dedup rule, applied corpus-side);
    4. quota: at most ``n_per_stratum`` docs per ``strata_col``, chosen
       by (md5(text), id) — the content-keyed deterministic rank, so
       the mix is stable under corpus growth within untouched strata.
    """
    toks = textstats.tokens_simple(F.col(text_col))
    annotated = docs.select(
        F.col(id_col),
        F.col(strata_col),
        F.col(text_col),
        textstats.quality_score(toks).alias("quality"),
        # r5: full multi-language gate (langid_multi, 7 profiles) — the
        # old binary stopword-ratio heuristic only separated en from
        # not-en, which a multilingual pretraining mix cannot work with
        textstats.langid_multi(F.col(text_col)).alias("lang_pred"),
        textstats.token_count(toks).cast("long").alias("n_tokens"),
    )
    gated = annotated.filter(F.col("quality") >= quality_min)
    if lang is not None:
        gated = gated.filter(F.col("lang_pred") == lang)
    # the ONE exact-dedup definition (streaming/dedup.py): min-id wins
    # per content md5, NULL-safe key — three hand-rolled copies of this
    # window drifted apart once already (review r4h)
    from ..streaming.dedup import dedup_documents_batch

    deduped = dedup_documents_batch(gated, text_col=text_col, id_col=id_col)
    sampled = stratified_sample(
        deduped, strata_col, n_per_stratum, hash_col=text_col, id_col=id_col
    )
    return sampled.select(id_col, strata_col, "quality", "n_tokens").orderBy(
        id_col
    )


def mix_report(mix: DataFrame, strata_col: str = "source") -> DataFrame:
    """Per-stratum composition of a selected mix: (stratum, n_docs,
    n_tokens, mean_quality) — the manifest summary a pipeline logs
    before training starts."""
    return (
        mix.groupBy(strata_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.avg("quality"), 4).alias("mean_quality"),
        )
        .orderBy(strata_col)
    )
