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
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_simple  # single definition; drift-proof

_MERSENNE = (1 << 61) - 1
N_PERM = 64


def _fan_out(df: DataFrame) -> DataFrame:
    """A single-file source exposes one input split, serializing the
    tokenize+hash work onto one core; round-robin to the cluster's
    parallelism before the heavy columns are computed (at real scale the
    source has many splits and this is a no-op)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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


def _fold61(x: np.ndarray) -> np.ndarray:
    """Partial reduction mod p = 2^61-1 via 2^61 ≡ 1: result < 2^61 + 8."""
    return (x >> np.uint64(61)) + (x & np.uint64(_MERSENNE))


def _mulmod_p(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Exact (a * h) mod p for p = 2^61-1, a,h < 2^61, pure uint64 numpy.

    Both operands are split into 32-bit limbs so every partial product
    stays below 2^64 (a single split of only `a` overflows: a_lo < 2^32
    times h < 2^61 needs 93 bits).  With a = a_hi*2^32 + a_lo and
    h = h_hi*2^32 + h_lo (a_hi, h_hi < 2^29):

        a*h = a_hi*h_hi*2^64 + (a_hi*h_lo + a_lo*h_hi)*2^32 + a_lo*h_lo

    reduced term-wise using 2^61 ≡ 1 (so 2^64 ≡ 8, and m*2^32 with
    m = u*2^29 + v becomes u + v*2^32).  Returns partially reduced
    values < 2^63; callers fold + conditional-subtract.
    """
    m32 = np.uint64(0xFFFFFFFF)
    a_hi, a_lo = a >> np.uint64(32), a & m32
    h_hi, h_lo = h >> np.uint64(32), h & m32
    t1 = (a_hi * h_hi) << np.uint64(3)  # < 2^61, exact
    mid = a_hi * h_lo + a_lo * h_hi  # < 2^62, exact
    t2 = (mid >> np.uint64(29)) + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32))
    t3 = _fold61(a_lo * h_lo)  # product < 2^64, exact in uint64
    return t1 + t2 + t3  # < 2^63


def _minhash_batch(hvals: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Min over ((a*h + b) mod p) for each of N_PERM permutations —
    exact modular arithmetic (verified against big-int in
    tests/test_dedup_kernels.py), so min-wise independence holds and
    band-agreement counts are unbiased Jaccard estimates."""
    if hvals.size == 0:
        return np.full(N_PERM, _MERSENNE, dtype=np.uint64)
    h = hvals.astype(np.uint64) % _MERSENNE
    val = _mulmod_p(a[:, None], h[None, :]) + b[:, None]  # < 2^63 + 2^61
    val = _fold61(_fold61(val))
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

    # NULL text coalesces to '' (empty shingle set -> sentinel signature):
    # one null row must not kill the kernel, and null/empty docs are
    # exact-dup territory anyway (caught by exact_dedup_groups, bounded
    # here by the bucket cap)
    hashed = _fan_out(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.transform(
            F.array_distinct(
                shingles(
                    tokens_simple(F.coalesce(F.col(text_col), F.lit(""))),
                    shingle_n,
                )
            ),
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
    sigs: DataFrame, bands: int = 16, max_bucket_size: int = 10_000
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: equal band-slice -> bucket;
    join within buckets only (a, b, n_bands_agree).

    ``max_bucket_size`` caps the quadratic blowup of a degenerate hot
    bucket (e.g. an empty-document band value shared by millions of rows
    at 10^12 scale): buckets above the cap are dropped BEFORE the
    self-join, bounding candidates at bands * max_bucket_size^2 / 2 per
    bucket.  Members of an over-full bucket are near-identical to each
    other by construction, so exact-dedup (one hash groupBy) already
    collapses them — the standard LSH fallback."""
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
    # bucket-size cap via a window over the SAME (band, bucket)
    # partitioning the self-join shuffles on — one exchange serves the
    # cap filter and the join probe (the former count-agg + left_semi
    # re-evaluated the minhash-kernel subtree an extra time; same fix as
    # simhash_near_pairs)
    bounded = (
        banded.withColumn(
            "_bn", F.count("*").over(Window.partitionBy("band", "bucket"))
        )
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )
    left = bounded.alias("l")
    right = bounded.alias("r")
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


def verify_pairs_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Exact-verify step of the candidate->verify dedup topology: join the
    candidate (a, b) pairs back to the full shingle sets and compute exact
    n-gram Jaccard (array_intersect on the two arrays — candidate volume
    is LSH-bounded, so the arrays only materialize for candidates)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(tokens_simple(F.coalesce(F.col(text_col), F.lit(""))), n)).alias("sh"),
    )
    return (
        pairs.select("a", "b")
        .join(sh.select(F.col("id").alias("a"), F.col("sh").alias("_sha")), "a")
        .join(sh.select(F.col("id").alias("b"), F.col("sh").alias("_shb")), "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("_sha", "_shb"))
                / (
                    F.size("_sha")
                    + F.size("_shb")
                    - F.size(F.array_intersect("_sha", "_shb"))
                )
            ).alias("jaccard"),
        )
    )


def simhash_near_pairs(
    sigs: DataFrame, max_hamming: int = 3, max_bucket_size: int = 10_000
) -> DataFrame:
    """All pairs within ``max_hamming`` bit flips of each other — EXACT by
    pigeonhole: the 64-bit signature splits into ``max_hamming + 1``
    disjoint bands, so two signatures differing in <= max_hamming bits
    must agree exactly on at least one band.  Banded bucket join (same
    (band, value) key) generates candidates; popcount(xor) filters to the
    exact bound.  ``max_bucket_size`` drops degenerate hot buckets before
    the self-join (the standard LSH cap; such members are caught by exact
    dedup).  Input: (id, simhash).  Output: (a, b, hamming), a < b."""
    nb = max_hamming + 1
    widths = [64 // nb] * nb
    widths[-1] += 64 - sum(widths)  # remainder bits ride the last band
    offs = [sum(widths[:i]) for i in range(nb)]
    band_vals = [
        # logical right shift then mask: band value as a non-negative long
        # (width 64 = radius 0 -> whole signature; mask is all-ones = -1L)
        F.shiftrightunsigned(F.col("simhash"), offs[i]).bitwiseAND(
            F.lit(((1 << widths[i]) - 1) if widths[i] < 64 else -1)
        )
        for i in range(nb)
    ]
    banded = sigs.select(
        "id", "simhash", F.posexplode(F.array(*band_vals)).alias("band", "bucket")
    )
    # bucket-size cap via a window over the SAME (band, bucket) partitioning
    # the self-join shuffles on: one exchange serves the cap filter and the
    # join probe (vs the former count-agg + left_semi, which cost an extra
    # aggregate pass and re-evaluated the signature subtree a third time)
    bounded = (
        banded.withColumn(
            "_bn",
            F.count("*").over(Window.partitionBy("band", "bucket")),
        )
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )
    # hamming filter BEFORE the dedup shuffle: the banded join emits one row
    # per agreeing band, and large radii force narrow bands (radius 16 ->
    # 17 bands of ~4 bits -> tiny bucket entropy), so bucket collisions are
    # quadratic in corpus size.  Hamming is a pure function of the pair, so
    # filtering first is equivalent and shrinks the distinct() exchange from
    # every bucket collision to true near-dup pairs only.
    return (
        bounded.alias("l")
        .join(
            bounded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _md5_lower64(t: Column) -> Column:
    """Signed-long view of the LOW 64 bits of md5(t) read as a little-endian
    128-bit number (digest bytes 8..15, little-endian) — byte-identical to
    DuckDB's ``md5_number_lower``, so an oracle can replay the hash in pure
    SQL.  Built from JVM-side expressions only (md5/substring/conv/shift):
    the 8 byte lanes occupy disjoint bit ranges, so bitwiseOR assembles the
    value without ANSI overflow."""
    h = F.md5(t)
    out = None
    for i in range(8):
        byte = F.conv(F.substring(h, 17 + 2 * i, 2), 16, 10).cast("long")
        lane = F.shiftleft(byte, 8 * i)
        out = lane if out is None else out.bitwiseOR(lane)
    return out


def simhash_signatures(
    docs: DataFrame, id_col: str, text_col: str, hash_mode: str = "xxhash64"
) -> DataFrame:
    """(id, simhash:long) — 64-bit simhash: per-bit vote = sum over distinct
    tokens of (+1 if bit set else -1); bit set iff vote > 0.

    Token hashing stays JVM-side (codegen); the bit-vote fold is a numpy
    kernel over Arrow batches (a 64-wide fold is hostile to Catalyst
    expression trees but trivial vectorized).  ``hash_mode``:
    "xxhash64" (default, fastest) or "md5" (lower-64 little-endian md5 ==
    DuckDB ``md5_number_lower`` — lets an external SQL oracle replay the
    whole signature pipeline exactly)."""
    if hash_mode == "xxhash64":
        tok_hash = lambda t: F.xxhash64(t)  # noqa: E731 (transform arity)
    elif hash_mode == "md5":
        tok_hash = _md5_lower64
    else:  # pragma: no cover - guard
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    # NULL text -> '' -> empty token set -> signature 0 (same as an empty
    # string); the kernel must never see a null array
    hashed = _fan_out(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.transform(
            F.array_distinct(
                tokens_simple(F.coalesce(F.col(text_col), F.lit("")))
            ),
            tok_hash,
        ).alias("hs"),
    )
    bit_idx = np.arange(64, dtype=np.uint64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # vectorized across rows in CHUNKS: the (tokens, 64) bit matrix is
        # bounded to ~CHUNK_TOKENS rows so memory stays flat regardless of
        # how many docs Arrow packs into one batch
        CHUNK_TOKENS = 1 << 18
        for pdf in batches:
            n = len(pdf)
            lens = np.fromiter((len(hs) for hs in pdf["hs"]), dtype=np.int64, count=n)
            out = np.zeros(n, dtype=np.int64)
            nz = np.flatnonzero(lens)
            lo = 0
            while lo < len(nz):
                hi = lo + 1
                tok = lens[nz[lo]]
                while hi < len(nz) and tok + lens[nz[hi]] <= CHUNK_TOKENS:
                    tok += lens[nz[hi]]
                    hi += 1
                rows = nz[lo:hi]
                h_all = np.concatenate(
                    [np.asarray(pdf["hs"].iloc[i], dtype=np.int64) for i in rows]
                )
                # bit matrix via unpackbits on the little-endian byte view:
                # this numpy build's broadcast uint64 shift is ~4000x slower
                bits = np.unpackbits(
                    h_all.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
                ).astype(np.int64)
                starts = np.zeros(len(rows), dtype=np.int64)
                np.cumsum(lens[rows][:-1], out=starts[1:])
                ones = np.add.reduceat(bits, starts, axis=0)
                votes = ones * 2 - lens[rows][:, None]
                sigs = ((votes > 0).astype(np.uint64) << bit_idx[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
                out[rows] = sigs.view(np.int64)  # two's-complement reinterpret
                lo = hi
            yield pd.DataFrame({"id": pdf["id"], "simhash": out})

    return hashed.mapInPandas(kernel, "id long, simhash long")


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_jaccard: float = 0.0,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """n-gram Jaccard for pairs sharing >=1 *discriminative* shingle.

    The inverted-index self-join bounds candidates to docs sharing a
    shingle, but a hot shingle (language keyword skeleton) with df=d
    produces d^2/2 pairs — quadratic at scale.  ``max_shingle_df`` drops
    shingles whose document frequency exceeds the cutoff BEFORE the join
    (the standard trick: a shingle present in >1000 docs carries no
    near-dup signal), enforcing bounded candidates in code rather than by
    docstring convention.  Intersection counts still use the FULL shingle
    sets of the surviving pairs, so jaccard values are exact — only pairs
    whose every common shingle is hot are missed (true near-dups always
    share rare shingles unless the whole doc is boilerplate, which LSH +
    exact dedup handle).  Pass ``max_shingle_df=None`` for the exact
    all-pairs formulation (small corpora / oracle checks).
    Output: (a, b, jaccard) with a < b.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(tokens_simple(F.coalesce(F.col(text_col), F.lit(""))), n)).alias("sh"),
    )
    sizes = sh.select("id", F.size("sh").alias("nsh"))
    inv = sh.select("id", F.explode("sh").alias("g"))
    cand_inv = inv
    if max_shingle_df is not None:
        rare = (
            inv.groupBy("g")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .drop("_df")
        )
        cand_inv = inv.join(rare, "g", "left_semi")
    if max_shingle_df is None:
        # exact all-pairs formulation: count co-occurrences directly
        inter = (
            inv.alias("l")
            .join(
                inv.alias("r"),
                (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")),
            )
            .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
            .agg(F.count("*").alias("inter"))
            .join(sizes.withColumnsRenamed({"id": "a", "nsh": "na"}), "a")
            .join(sizes.withColumnsRenamed({"id": "b", "nsh": "nb"}), "b")
        )
    else:
        # bounded candidate pairs from rare shingles only, then EXACT
        # intersection per pair via array_intersect of the full shingle
        # sets — the hot-shingle quadratic join never happens
        cand = (
            cand_inv.alias("l")
            .join(
                cand_inv.alias("r"),
                (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")),
            )
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
            .distinct()
        )
        inter = (
            cand.join(
                sh.select(F.col("id").alias("a"), F.col("sh").alias("_sha")), "a"
            )
            .join(sh.select(F.col("id").alias("b"), F.col("sh").alias("_shb")), "b")
            .select(
                "a",
                "b",
                F.size(F.array_intersect("_sha", "_shb")).alias("inter"),
                F.size("_sha").alias("na"),
                F.size("_shb").alias("nb"),
            )
        )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("a", "b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 30,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    component = the minimum node id reachable through the pair graph —
    the cluster step that turns near-dup PAIRS into dedup GROUPS with a
    canonical representative (reference analog: Gigablast dedups against
    a single stored content hash, J8; transitive near-dup clusters have
    no analog there — this is the LLM-pipeline extension).

    Two physical paths producing the IDENTICAL unique min-label
    fixpoint (so the choice is invisible to callers and oracles):

    - **distributed** (above ``driver_threshold`` deduped edges):
      alternating large-star / small-star (Kiveris et al., "Connected
      Components in MapReduce and Beyond", SOCC'14) — the two-operation
      fixpoint that provably converges in O(log^2 n) rounds even on
      adversarial shapes (a path graph defeats naive min-propagation at
      O(diameter)).  Each round is pure DataFrame shuffles (a
      groupBy-min + a join per star op), never a driver-side graph;
      lineage is truncated per round with localCheckpoint.  This is the
      100-TB path.
    - **driver union-find** (at or below the threshold): a near-dup
      pair set that small is driver-scale by definition, and each
      distributed round costs ~0.5-1 s of pure job dispatch at that
      size — the hybrid every production CC implementation ships.  Pass
      ``driver_threshold=0`` to force the distributed rounds.

    Determinism: min() labels make the fixpoint unique regardless of
    iteration count, partitioning, or which path ran.
    """
    e0 = pairs.select(
        F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    # canonical orientation big -> small: (u, v) with u > v
    edges = (
        e0.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    n_edges = edges.count()  # checkpoint is materialized: count is free
    if 0 < n_edges <= driver_threshold:
        collected = edges.collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in collected:
            u, v = r["u"], r["v"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        comp_min: dict[int, int] = {}
        for x in parent:
            root = find(x)
            if x < comp_min.get(root, x + 1):
                comp_min[root] = x
        return pairs.sparkSession.createDataFrame(
            [(x, comp_min[find(x)]) for x in sorted(parent)],
            "node long, component long",
        )
    nodes = (
        e0.select(F.col("u").alias("node"))
        .union(e0.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def large_star(e: DataFrame) -> DataFrame:
        # for every x: m = min(Γ(x) ∪ {x}); emit (y, m) for y ∈ Γ(x), y > x
        sym = e.select("u", "v").union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select(F.col("u").alias("_x"), F.least("u", "_mn").alias("_m"))
        )
        return (
            sym.join(m, sym["u"] == m["_x"])
            .filter(F.col("v") > F.col("u"))  # y > x, and y > x >= m
            .select(F.col("v").alias("u"), F.col("_m").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # edges come oriented big -> small; for every x: m = min of its
        # smaller neighbors; re-point those neighbors and x itself at m
        m = (
            e.groupBy("u")
            .agg(F.min("v").alias("_m"))
            .select(F.col("u").alias("_x"), "_m")
        )
        repointed = (
            e.join(m, e["u"] == m["_x"])
            .filter(F.col("v") != F.col("_m"))
            .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        )
        selfedge = m.select(F.col("_x").alias("u"), F.col("_m").alias("v"))
        return (
            repointed.union(selfedge)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    for _ in range(max_iter):
        nxt = small_star(large_star(edges)).localCheckpoint()
        # fixpoint iff the (distinct, canonically oriented) edge sets
        # match — ONE action via symmetric set difference (an empty edge
        # set is trivially a fixpoint, so no separate isEmpty probe)
        converged = (
            nxt.subtract(edges).union(edges.subtract(nxt)).isEmpty()
        )
        edges = nxt
        if converged:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # converged edge set is stars (member -> min); roots map to themselves
    return (
        nodes.join(edges, nodes["node"] == edges["u"], "left")
        .select("node", F.coalesce("v", "node").alias("component"))
    )


def dedup_clusters(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Near-dup pairs -> per-doc cluster rows: (doc_id, cluster_id,
    cluster_size, is_canonical) where cluster_id = min doc_id of the
    connected component and the canonical doc is that minimum — the
    keep/drop decision sheet of a training-data dedup pass (only docs
    that appear in >=1 pair are listed; singletons are trivially kept)."""
    comp = connected_components(pairs, a_col, b_col)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count("*").over(w).alias("cluster_size"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


def dup_span_positions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, pos) of every token n-gram whose exact text occurs in at
    least ``min_docs`` DISTINCT docs — the candidate map of substring-level
    dedup (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better": cross-doc duplicated spans, here at n-gram resolution
    instead of suffix-array resolution).

    Scale shape: one explode (linear in corpus tokens), one groupBy on the
    64-bit gram hash (the df count), one shuffle join back.  The hash is
    ``_md5_lower64`` so an oracle can replay it as DuckDB
    ``md5_number_lower``; grams never leave the executor as strings after
    the hash projection."""
    from .textstats import tokens_simple, word_ngrams

    # fan out BEFORE tokenizing (minhash convention): the exchange moves
    # raw text, not token arrays, and the heavy lambda work lands on all
    # cores; the staged _tk projection still evaluates the tokenizer once
    # per row (CollapseProject keeps a non-cheap multiply-referenced expr)
    staged = _fan_out(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        tokens_simple(F.coalesce(F.col(text_col), F.lit(""))).alias("_tk"),
    )
    grams = staged.select(
        "doc_id",
        F.posexplode(word_ngrams(F.col("_tk"), n)).alias("pos", "_gram"),
    ).select("doc_id", "pos", _md5_lower64(F.col("_gram")).alias("gram_h"))
    dup = (
        grams.groupBy("gram_h")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gram_h")
    )
    return grams.join(dup, "gram_h").select("doc_id", "pos")


def dup_span_doc_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc duplicated-span accounting, all exact integers:

    - n_tokens, total_ngrams: doc size in the n-gram domain.
    - dup_ngrams: n-gram starts whose text recurs in >= min_docs docs.
    - covered_tokens: EXACT size of the union of the [pos, pos+n) dup
      intervals — sorted starts p_1<..<p_m cover
      sum_i min(n, p_{i+1}-p_i) with p_{m+1}=inf, computed with one
      lead() window per doc (no list gymnastics, replayable in SQL).

    A doc with 2*covered_tokens > n_tokens is majority-duplicated — the
    drop rule of substring-dedup pipelines, as an integer inequality."""
    from .textstats import tokens_simple

    marks = dup_span_positions(docs, id_col, text_col, n, min_docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    per_doc = (
        marks.withColumn(
            "_cov",
            F.least(
                F.lit(n),
                F.coalesce(F.lead("pos").over(w) - F.col("pos"), F.lit(n)),
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("dup_ngrams"),
            F.sum("_cov").alias("covered_tokens"),
        )
    )
    tk = tokens_simple(F.coalesce(F.col(text_col), F.lit("")))
    base = _fan_out(docs.select(id_col, text_col, *keep_cols)).select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep_cols],
        F.size(tk).cast("long").alias("n_tokens"),
        F.greatest(F.size(tk) - (n - 1), F.lit(0)).cast("long").alias("total_ngrams"),
    )
    return base.join(per_doc, "doc_id", "left").fillna(
        0, ["dup_ngrams", "covered_tokens"]
    )


def remove_dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The corpus REWRITE half of substring dedup (Lee et al. 2021 drop
    the duplicated bytes, not the documents): every token inside a
    cross-doc duplicated n-gram span is removed and the doc is rebuilt
    from the surviving tokens.

    Output: (doc_id, *keep_cols, n_tokens, kept_tokens, kept_text) where
    kept_text is the space-joined survivor tokens (the rewrite is defined
    on the TOKEN stream — original whitespace/punct is not preserved, by
    design: both engines reconstruct from the same token array, so the
    result is engine-exact).

    Scale shape: the only shuffle of this stage joins RAW text with the
    per-doc covered POSITION sets (<= n rows per duplicated gram start,
    collected to a sorted int array) by doc_id; tokenization runs once
    per row AFTER that exchange, so token arrays are never shuffled and
    the tokenizer work is spread across the shuffle partitions.  The
    removal itself is a codegen array lambda
    `filter(_tk, (x, i) -> NOT array_contains(_cov, i))`.
    Per-doc cost is O(len * |cov|) in the worst (mostly-duplicated) doc;
    for those the accounting twin ``dup_span_doc_stats`` already says
    "drop the whole doc", so the rewrite path is for the long tail where
    |cov| << len."""
    from .textstats import tokens_simple

    marks = dup_span_positions(docs, id_col, text_col, n, min_docs)
    cov = (
        marks.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias(
                "_cpos"
            ),
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("_cpos")).alias("_cov"))
    )
    # join RAW text with the coverage sets first: the one exchange this
    # stage owns moves (text, _cov) keyed by doc_id, and the tokenizer
    # runs once per row AFTER the shuffle — already spread across the
    # shuffle partitions, so no round-robin fan-out is needed and token
    # arrays are never exchanged
    staged = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            *[F.col(c) for c in keep_cols],
            F.col(text_col).alias("_text"),
        )
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            *keep_cols,
            tokens_simple(F.coalesce(F.col("_text"), F.lit(""))).alias("_tk"),
            "_cov",
        )
    )
    kept = F.when(
        F.col("_cov").isNull(), F.col("_tk")
    ).otherwise(
        F.filter(
            "_tk", lambda x, i: ~F.array_contains(F.col("_cov"), i)
        )
    )
    return (
        staged
        .withColumn("_kept", kept)
        .select(
            "doc_id",
            *keep_cols,
            F.size("_tk").cast("long").alias("n_tokens"),
            F.size("_kept").cast("long").alias("kept_tokens"),
            F.array_join("_kept", " ").alias("kept_text"),
        )
    )
