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
