"""Dedup kernel correctness + scale-guard tests.

- minhash permutation math checked against Python big-int (a*h+b) mod p
  exactly (the ADVICE_r01 overflow finding: partial products must stay
  under 2^64);
- simhash vectorized kernel checked against a per-row reference;
- LSH bucket cap / shingle-df cutoff checked on an adversarial corpus
  (one shingle shared by ALL docs) to prove candidate counts stay
  bounded — the 100 TB quadratic-blowup guards.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import dedup

P = (1 << 61) - 1


def test_minhash_batch_matches_bigint():
    rng = np.random.default_rng(7)
    a = rng.integers(1, P, size=dedup.N_PERM, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, P, size=dedup.N_PERM, dtype=np.int64).astype(np.uint64)
    # include adversarial values: near-p multipliers, near-2^63 hashes
    hvals = np.concatenate(
        [
            rng.integers(-(2**63), 2**63 - 1, size=200, dtype=np.int64),
            np.array([0, 1, -1, 2**62, -(2**63), 2**63 - 1], dtype=np.int64),
        ]
    )
    got = dedup._minhash_batch(hvals, a, b)
    h_mod = [int(np.uint64(h)) % P for h in hvals]
    for j in range(dedup.N_PERM):
        expect = min((int(a[j]) * h + int(b[j])) % P for h in h_mod)
        assert int(got[j]) == expect, f"perm {j}: {int(got[j])} != {expect}"


def test_mulmod_p_exhaustive_random():
    rng = np.random.default_rng(11)
    x = rng.integers(0, P, size=1000, dtype=np.int64).astype(np.uint64)
    y = rng.integers(0, P, size=1000, dtype=np.int64).astype(np.uint64)
    got = dedup._mulmod_p(x, y)
    got = dedup._fold61(dedup._fold61(got))
    got = np.where(got >= P, got - P, got)
    for xi, yi, gi in zip(x.tolist(), y.tolist(), got.tolist()):
        assert gi == (xi * yi) % P


def test_simhash_vectorized_matches_reference(spark):
    rows = [
        (1, "binary search tree in python"),
        (2, ""),
        (3, "hash hash hash map"),
        (4, "a b c d e f g h i j k l m n o p"),
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["simhash"]
        for r in dedup.simhash_signatures(docs, "id", "text").collect()
    }

    # reference: per-row bit-vote over xxhash64 of distinct tokens
    hashed = docs.select(
        "id",
        F.transform(
            F.array_distinct(dedup.tokens_simple(F.col("text"))),
            lambda t: F.xxhash64(t),
        ).alias("hs"),
    ).collect()
    for r in hashed:
        h = np.asarray(r["hs"], dtype=np.int64).astype(np.uint64)
        if h.size == 0:
            expect = 0
        else:
            bits = (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes = bits.sum(axis=0).astype(np.int64) * 2 - h.size
            sig = int(
                ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
                    dtype=np.uint64
                )
            )
            expect = sig - (1 << 64) if sig >= (1 << 63) else sig
        assert got[r["id"]] == expect


def test_md5_lower64_matches_hashlib(spark):
    """hash_mode="md5" token hash == low 8 digest bytes little-endian
    (DuckDB md5_number_lower parity — the basis of the simhash oracle)."""
    import hashlib

    words = ["abc", "hello_world", "", "0" * 40, "binarysearchtree"]
    df = spark.createDataFrame([(w,) for w in words], "t string").select(
        "t", dedup._md5_lower64(F.col("t")).alias("h")
    )
    got = {r["t"]: r["h"] for r in df.collect()}
    for w in words:
        u = int.from_bytes(hashlib.md5(w.encode()).digest()[8:], "little")
        assert got[w] == (u - (1 << 64) if u >= (1 << 63) else u)


def test_simhash_md5_mode_pairs(spark):
    """md5-mode signatures feed near_pairs: exact dups land at hamming 0,
    unrelated docs far away; radius-0 single-band edge case works."""
    rows = [
        (1, "binary search tree in python"),
        (2, "binary search tree in python"),
        (3, "completely different words entirely unrelated zebra"),
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    sigs = dedup.simhash_signatures(docs, "id", "text", hash_mode="md5")
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(sigs, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0 and (1, 3) not in pairs
    zero = dedup.simhash_near_pairs(sigs, max_hamming=0).collect()
    assert {(r["a"], r["b"]) for r in zero} == {(1, 2)}


@pytest.fixture(scope="module")
def adversarial_docs(spark):
    """60 docs that ALL share one hot 3-gram; docs pair up as near-dups
    only through rare shingles."""
    rows = []
    for i in range(60):
        # shared skeleton (hot shingles) + a rare pair marker every 2 docs
        marker = f"pairmark{i // 2} tokena{i // 2} tokenb{i // 2}"
        rows.append((i, f"common skeleton prefix {marker} common skeleton suffix"))
    return spark.createDataFrame(rows, "id long, text string")


def test_ngram_jaccard_df_cutoff_bounds_candidates(adversarial_docs):
    # with the cutoff, hot shingles (df=60) are excluded from candidate
    # generation: only the 30 rare-marker pairs (plus none other) remain
    pairs = dedup.ngram_jaccard_pairs(
        adversarial_docs, "id", "text", n=3, max_shingle_df=10
    ).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert got == {(2 * i, 2 * i + 1) for i in range(30)}
    # jaccard is still computed on FULL shingle sets (exact verify)
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            adversarial_docs, "id", "text", n=3, max_shingle_df=None
        ).collect()
    }
    for r in pairs:
        assert abs(r["jaccard"] - exact[(r["a"], r["b"])]) < 1e-12


def test_lsh_bucket_cap_bounds_candidates(spark):
    # 50 identical docs -> every band bucket holds all 50 -> capped out;
    # 2 distinct near-dups in their own buckets survive
    rows = [(i, "identical boilerplate page content here") for i in range(50)]
    rows += [(100, "unique alpha beta gamma delta payload"),
             (101, "unique alpha beta gamma delta payload extra")]
    docs = spark.createDataFrame(rows, "id long, text string")
    sigs = dedup.minhash_signatures(docs, "id", "text")
    pairs = dedup.minhash_lsh_pairs(sigs, bands=16, max_bucket_size=10).collect()
    ids = {(r["a"], r["b"]) for r in pairs}
    # no pair from the 50-clone hot buckets (they exceed the cap)...
    assert all(a >= 100 for a, _b in ids)
    # ...but the rare near-dup pair is still found
    assert (100, 101) in ids


def test_pairwise_cosine_bucketed_no_cartesian(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal(8)
    rows = []
    for i in range(20):
        v = base + rng.standard_normal(8) * 0.01  # tight cluster
        rows.append((i, [float(x) for x in v]))
    for i in range(20, 40):
        rows.append((i, [float(x) for x in rng.standard_normal(8)]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = dedup_pairs = None
    from open_source_search_engine_spark.operators import similarity

    pairs = similarity.pairwise_cosine_above(
        vecs, threshold=0.99, bands=4, n_planes=6
    ).collect()
    # every tight-cluster pair has cosine ~1 and identical LSH signs ->
    # all found; random vectors produce none above 0.99
    got = {(r["a"], r["b"]) for r in pairs}
    expect = {(a, b) for a in range(20) for b in range(a + 1, 20)}
    assert got == expect
