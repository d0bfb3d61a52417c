"""Deterministic sampling operators for training-data pipelines.

A 100-TB pretraining pipeline needs REPRODUCIBLE sampling: re-running the
job (or re-running it on a different cluster size) must select the same
rows, and an independent engine must be able to replay the selection —
``df.sample()`` gives neither (partition-RNG seeded, partitioning-
dependent).  Both operators here key the selection on a content hash, so
they are pure column expressions: deterministic, partitioning-invariant,
and value-replayable in ANSI SQL (the driver's DuckDB oracle runs the
identical rule).

- `stratified_sample`: per-stratum quota (e.g. "3 docs per language") via
  ``row_number`` over a hash-ordered window — ONE shuffle keyed by the
  stratum, no global sort.  At skewed strata the window is still bounded:
  rank-k selection scans each stratum once (Spark's window top-k rewrite
  applies a per-partition limit pushdown for rn <= k filters).
- `hash_fraction_sample`: Bernoulli-by-hash — keep rows whose md5 bucket
  falls under the fraction threshold.  Zero shuffles, trivially
  scale-free, and the keep-set is stable under corpus growth (a row's
  verdict never changes when other rows arrive — the property reservoir
  or RNG sampling can't give).

Reference analog: Gigablast samples per-site docs for quality scoring
with deterministic docId-mod selection (SURVEY.md §2.6 A8 spider-quota
adjacent); the md5-keyed rules here are the same idea made
content-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    hash_col: str,
    id_col: str,
) -> DataFrame:
    """Keep the first ``n_per_stratum`` rows of each stratum, ordered by
    ``(md5(hash_col), id_col)`` — a deterministic, engine-replayable
    quota sample.  Strata smaller than the quota are kept whole.

    NULL ``hash_col`` values are hashed as '' (md5(NULL) is NULL, and
    engines DISAGREE on where NULL sorts — Spark ASC is nulls-first,
    DuckDB defaults nulls-last — so a raw NULL would silently break the
    replayability contract; coalescing pins one deterministic order in
    every engine)."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.coalesce(F.col(hash_col).cast("string"), F.lit(""))),
        F.col(id_col),
    )
    # temp rank column: suffix until free so a caller column named _rn
    # can never be silently overwritten + dropped
    rn = "_rn"
    while rn in df.columns:
        rn += "_"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= n_per_stratum)
        .drop(rn)
    )


def temperature_quotas(
    df: DataFrame,
    strata_col: str,
    n_target: int,
    micro: int = 1_000_000,
) -> DataFrame:
    """Per-stratum quotas for a temperature-rebalanced mix (τ = 2).

    Multilingual / multi-source pretraining mixes resample strata with
    probability ∝ (n_s/N)^(1/τ) so head strata are down-weighted and
    tail strata up-weighted (Conneau & Lample 2019; the mT5/XLM-R
    recipe).  τ is pinned to 2 — exponent 1/2 — because ``sqrt`` is
    IEEE-754 **correctly rounded** in every engine, which makes the
    weight bit-reproducible where a general ``pow`` is only
    ~1-ulp-reproducible.  The weight is then snapped to integer
    micro-units and every downstream step is BIGINT arithmetic, so the
    quota sheet is exact under any partitioning and replayable in ANSI
    SQL:

        ps_s    = round(sqrt(n_s / N) * micro)        -- the only float step
        quota_s = min(n_s, (n_target * ps_s) div sum(ps))

    Returns one row per stratum: (strata_col, _cnt, _quota).  The
    per-stratum count agg is the only real work (map-side combined, one
    shuffle of |strata| rows); the totals ride a window over the
    |strata|-row relation, which AQE collapses to one tiny task.
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_cnt"))
    w_all = Window.partitionBy()
    ps = F.round(
        F.sqrt(F.col("_cnt") / F.sum("_cnt").over(w_all)) * micro
    ).cast("long")
    return (
        counts.withColumn("_ps", ps)
        .withColumn(
            "_quota",
            F.least(
                F.col("_cnt"),
                F.expr(f"({n_target}L * _ps) div sum(_ps) over ()"),
            ),
        )
        .drop("_ps")
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    n_target: int,
    hash_col: str,
    id_col: str,
    quotas: DataFrame | None = None,
) -> DataFrame:
    """Temperature-rebalanced (τ = 2) deterministic corpus mix.

    Quotas come from `temperature_quotas` (data-derived, all-integer);
    pass a precomputed ``quotas`` relation to reuse one across calls (a
    caller that also reports the quota sheet would otherwise run the
    corpus-wide count aggregate twice).  Selection within each stratum
    is the same content-keyed ``(md5(hash_col), id_col)`` rank rule as
    `stratified_sample`, so the mix is partitioning-invariant and
    value-replayable.  Plan shape: one tiny quota relation (broadcast
    into the join), one window shuffle keyed by the stratum with the
    rank-k limit pushdown — the docs table is shuffled exactly once and
    never collected."""
    if quotas is None:
        quotas = temperature_quotas(df, strata_col, n_target)
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.coalesce(F.col(hash_col).cast("string"), F.lit(""))),
        F.col(id_col),
    )
    # temp rank/quota columns: suffix until free so caller columns named
    # _rn / _quota can never collide (ambiguous reference) or be dropped
    rn = "_rn"
    while rn in df.columns:
        rn += "_"
    qn = "_quota"
    while qn in df.columns:
        qn += "_"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .join(
            F.broadcast(
                quotas.select(strata_col, F.col("_quota").alias(qn))
            ),
            strata_col,
        )
        .filter(F.col(rn) <= F.col(qn))
        .drop(rn, qn)
    )


def hash_fraction_sample(
    df: DataFrame, hash_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose first 8 md5 hex
    digits (of ``salt || hash_col``) compare below the fraction
    threshold.  Fixed-width lowercase hex compares lexicographically ==
    numerically, so the rule is one string comparison — no shuffle, no
    RNG, replayable anywhere md5 exists.

    NULL ``hash_col`` values hash as '' (concat/md5 propagate NULL and a
    NULL comparison filters the row out REGARDLESS of fraction — a 99%
    sample silently losing every NULL-keyed row is a skewed mix, not a
    sample; coalescing gives those rows one deterministic verdict)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction == 1.0:
        # threshold would need 9 hex digits; keep-all is the exact semantics
        return df
    threshold = format(int(fraction * (1 << 32)), "08x")
    bucket = F.substring(
        F.md5(
            F.concat(
                F.lit(salt),
                F.coalesce(F.col(hash_col).cast("string"), F.lit("")),
            )
        ),
        1,
        8,
    )
    return df.filter(bucket < F.lit(threshold))
