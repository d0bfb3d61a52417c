"""Deduplication operators for large-scale training-data pipelines.

Reference analog: Gigablast's index-time dup detection via content-hash
termlist lookup (XmlDoc::getDupList, SURVEY.md §2.3 J8) and query-time
percent-similar dedup (Msg40 deduping, §2.5 W3).  Rebuilt as first-class
distributed operators:

- exact:        hash-groupBy on md5(text) — one shuffle, maps to J8.
- minhash LSH:  shingle -> 64-perm minhash -> band buckets -> bucket join.
                Candidate pairs only ever form inside a bucket, so the
                quadratic blowup is bounded by band collisions (the scale
                path for 10^12 docs; exact pairwise is impossible there).
- simhash:      64-bit weighted fingerprint; near-dups share fingerprint
                up to k bit flips (banded for lookup).
- ngram jaccard: exact verify step on candidate pairs (small, post-LSH).

All heavy lifting stays in DataFrame ops; the only Python is the
vectorized minhash/simhash kernels (numpy over Arrow batches).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1
N_PERM = 64


def tokens_simple(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9]+"), F.lit(0))


def shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingle strings from a token array (built-ins only)."""
    k = F.size(tokens) - (n - 1)
    return F.when(k <= 0, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        )
    )


def exact_dedup_groups(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(text_md5, n_dups, canonical_id): canonical = min id per group (J8)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def _minhash_batch(hvals: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Min over ((a*h + b) mod p) for each of N_PERM permutations."""
    if hvals.size == 0:
        return np.full(N_PERM, _MERSENNE, dtype=np.uint64)
    h = hvals.astype(np.uint64) % _MERSENNE
    # (N_PERM, n) via broadcasting; python ints avoid uint64 overflow by
    # doing the mod-mul in object space? No — use 128-bit via two-step:
    # split a*h into high/low using float is unsafe; do it with Python ints
    # only per unique shingle set is too slow.  Instead use numpy uint64
    # with Mersenne-prime modular trick: (x mod 2^61-1) fits 61 bits, and
    # a < 2^61, so a*h needs 122 bits -> emulate with np.uint64 pairs.
    lo = (a[:, None] & 0xFFFFFFFF) * h[None, :]
    hi = (a[:, None] >> 32) * h[None, :]
    # x = hi*2^32 + lo; reduce mod 2^61-1 using 2^61 ≡ 1:
    # split into 61-bit chunks
    def mod61(x):
        return (x >> np.uint64(61)) + (x & np.uint64(_MERSENNE))

    val = mod61(mod61(hi) * np.uint64((1 << 32) % _MERSENNE) + mod61(lo)) + b[:, None]
    val = mod61(val)
    val = np.where(val >= _MERSENNE, val - _MERSENNE, val)
    return val.min(axis=1)


def minhash_signatures(
    docs: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """(id, sig: array<long>[N_PERM]) via a vectorized mapInPandas kernel.

    Shingle hashing uses xxhash64 JVM-side (cheap, codegen); only the
    permutation-min runs in numpy.
    """
    rng = np.random.default_rng(42)
    a = (rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64)).astype(np.uint64)
    b = (rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64)).astype(np.uint64)

    hashed = docs.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.array_distinct(shingles(tokens_simple(F.col(text_col)), shingle_n)),
            lambda s: F.xxhash64(s),
        ).alias("hs"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [
                _minhash_batch(np.asarray(hs, dtype=np.int64), a, b).astype(np.int64)
                for hs in pdf["hs"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "sig": sigs})

    return hashed.mapInPandas(kernel, "id long, sig array<long>")


def minhash_lsh_pairs(
    sigs: DataFrame, bands: int = 16, threshold_rows: int = 4
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: equal band-slice -> bucket;
    join within buckets only (a, b, n_bands_agree)."""
    rows_per_band = N_PERM // bands
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.concat_ws(",", F.slice("sig", i * rows_per_band + 1, rows_per_band))
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").alias("n_bands_agree"))
    )
    return pairs


def simhash_signatures(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash:long) — 64-bit simhash: per-bit vote = sum over distinct
    tokens of (+1 if bit set else -1); bit set iff vote > 0.

    Token hashing stays JVM-side (xxhash64, codegen); the bit-vote fold is
    a numpy kernel over Arrow batches (a 64-wide fold is hostile to
    Catalyst expression trees but trivial vectorized)."""
    hashed = docs.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.array_distinct(tokens_simple(F.col(text_col))), lambda t: F.xxhash64(t)
        ).alias("hs"),
    )
    bit_idx = np.arange(64, dtype=np.uint64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.empty(len(pdf), dtype=np.int64)
            for i, hs in enumerate(pdf["hs"]):
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                if h.size == 0:
                    out[i] = 0
                    continue
                bits = (h[:, None] >> bit_idx[None, :]) & np.uint64(1)
                votes = bits.sum(axis=0).astype(np.int64) * 2 - h.size
                sig = int(((votes > 0).astype(np.uint64) << bit_idx).sum(dtype=np.uint64))
                out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
            yield pd.DataFrame({"id": pdf["id"], "simhash": out})

    return hashed.mapInPandas(kernel, "id long, simhash long")


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs sharing >=1 shingle.

    The inverted-index join bounds candidates to docs sharing a shingle —
    at 10^12 scale this runs *after* LSH restricts candidates; here it is
    also the DuckDB-oracle-checkable exact formulation.
    Output: (a, b, jaccard) with a < b.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(tokens_simple(F.col(text_col)), n)).alias("sh"),
    )
    sizes = sh.select("id", F.size("sh").alias("nsh"))
    inv = sh.select("id", F.explode("sh").alias("g"))
    inter = (
        inv.alias("l")
        .join(inv.alias("r"), (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "a", "nsh": "na"}), "a")
        .join(sizes.withColumnsRenamed({"id": "b", "nsh": "nb"}), "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("a", "b", "jaccard")
    )
