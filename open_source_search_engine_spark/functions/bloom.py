"""Per-segment term bloom filters — the RdbMap *file-pruning* analog.

The reference's Msg5 consults each RdbBase file's RdbMap (per-file key
ranges, RdbMap.cpp getKeyRange / Msg5 readList in the public Gigablast
tree) to skip on-disk runs that cannot contain the requested termlist, so
a point termlist read touches only the files that hold the term.  The
parquet analog already prunes *within* a segment (term-sorted row groups,
PLANS.md §1), but an LSM index accumulates many small delta segments
between compactions, and every query was paying a footer-read + scan-task
per segment regardless of whether the segment contains any queried term.

term_ids are blake2b64 hashes — uniformly distributed — so a min/max
zonemap per segment cannot prune (every segment spans ~the whole int64
range).  What does prune is per-segment *membership*: each postings
segment carries a bloom filter over its distinct term_ids in a
``_bloom.json`` sidecar (written once, immutable with the segment), and
``SnapshotTable.read_pruned(spark, term_ids)`` skips segments whose
bloom excludes every queried term.  False positives only cost an extra
(pushed-filter, row-group-pruned) scan; false negatives are impossible.

Scale shape: sidecar size is ~1.2 bytes per distinct term at 1% fpp
(a few MB for a multi-million-term shard vocabulary), read once per
driver process per segment and cached.  At 10^12 docs with hourly delta
commits, a rare-term query touches the handful of segments that actually
contain the term instead of listing/scanning thousands — the exact
file-set narrowing RdbMap gives the reference.

Everything is vectorized numpy (splitmix64 double hashing) — no Python
loop over term_ids on either the build or the probe side.
"""

from __future__ import annotations

import base64
import json
import math
import os
import uuid

import numpy as np

SIDECAR = "_bloom.json"

# probe-side sidecar cache: segment dirs are immutable once committed, but
# an index root can be deleted and rebuilt in place, so the file identity
# (inode, mtime_ns) joins the key the same way SnapshotTable.snapshot_ident
# guards the read cache.
_SIDECAR_CACHE: dict[tuple, dict | None] = {}


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (wrapping arithmetic)."""
    z = x.copy()
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def _hash_pair(term_ids) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per id for double hashing
    (h_i = h1 + i*h2; h2 forced odd so the k probes never degenerate)."""
    x = np.asarray(term_ids, dtype=np.int64).astype(np.uint64)
    h1 = _splitmix64(x + np.uint64(0x9E3779B97F4A7C15))
    h2 = _splitmix64(x ^ np.uint64(0xD6E8FEB86659FD93)) | np.uint64(1)
    return h1, h2


def _geometry(n: int, fpp: float) -> tuple[int, int]:
    """Standard bloom sizing for n distinct keys at the given fpp;
    m rounded up to a whole number of 64-bit words."""
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _scatter(bits: np.ndarray, ids: np.ndarray, m: int, k: int) -> None:
    """OR the k probe bits of every id into ``bits`` in place.  Pure
    function of (ids-as-set, m, k): duplicate ids are idempotent, so
    partial bitmaps built from arbitrary overlapping slices OR-fold to
    exactly the single-pass bitmap — the property the distributed build
    relies on."""
    h1, h2 = _hash_pair(ids)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(
                bits,
                (pos >> np.uint64(3)).astype(np.int64),
                np.left_shift(
                    np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
                ),
            )


def build_bloom(term_ids, fpp: float = 0.01) -> dict:
    """Bloom over the distinct ``term_ids`` (n=0 → the always-empty bloom,
    which prunes unconditionally).  Returns the JSON-serializable sidecar
    dict: {n, m, k, bits(base64)}."""
    ids = np.unique(np.asarray(list(term_ids), dtype=np.int64))
    n = int(ids.size)
    if n == 0:
        return {"n": 0, "m": 0, "k": 0, "bits": ""}
    m, k = _geometry(n, fpp)
    bits = np.zeros(m // 8, dtype=np.uint8)
    _scatter(bits, ids, m, k)
    return {
        "n": n,
        "m": m,
        "k": k,
        "bits": base64.b64encode(bits.tobytes()).decode("ascii"),
    }


# distinct-count at or under which the segment writer just pulls the id
# list (bounded by the count it has already measured) instead of running
# the partial-bitmap fold — fewer jobs for the common small-delta commit.
DRIVER_IDS_CAP = 1 << 18

# vocabulary cap above which NO sidecar is written (build_bloom_distributed
# returns None; a segment without a sidecar is always scanned — correct,
# just unpruned).  Membership blooms pay off for the many SMALL delta
# segments a query would otherwise touch; a compacted base segment whose
# vocabulary exceeds ~16M terms contains nearly every queried term anyway,
# so its bloom would almost never prune while costing a ~20 MB bitmap
# per partial, per write.
BLOOM_MAX_KEYS = 1 << 24

# partial-bitmap fold width: the ids scan is coalesced to at most this
# many tasks before scattering, bounding the fold shuffle to
# PARTIAL_PARTITIONS x bitmap bytes and per-task memory to ONE bitmap.
# Under uniform hashing every >~100k-id partition touches essentially
# every chunk (partials are DENSE), so bounding the partial COUNT — not
# hoping for chunk sparsity — is what caps the cost at large vocab.
PARTIAL_PARTITIONS = 32


def build_bloom_distributed(
    df, col: str = "term_id", fpp: float = 0.01, chunk_bytes: int = 1 << 16
) -> dict | None:
    """Bloom sidecar built WITHOUT pulling the raw id list to the driver
    (r4 verdict #2: a large shard's vocabulary is 10^7+ distinct
    term_ids — a multi-hundred-MB ``distinct().toPandas()`` per segment
    write — while the *bitmap* is ~1.2 BYTES/key at 1% fpp).

    Shape: (1) exact distinct count (one agg job, one row back) fixes
    the geometry (m, k) and gates the build (None above BLOOM_MAX_KEYS —
    see its comment); (2) the scan, coalesced to ≤ PARTIAL_PARTITIONS
    tasks, scatters each task's ids into a local bitmap inside
    ``mapInArrow`` and emits its non-zero fixed-size chunks; (3) chunks
    OR-fold per chunk id on executors; (4) the driver receives exactly
    one bitmap's worth of bytes.  Bloom OR is idempotent, so
    cross-partition duplicate ids need no dedup and the result is
    bit-identical to ``build_bloom`` over the same id set
    (property-tested).  Small segments (distinct count <=
    DRIVER_IDS_CAP) take the direct path — the pull is bounded by the
    count already measured, never by the table size."""
    import pandas as pd
    import pyarrow as pa
    from pyspark.sql import functions as F

    ids_df = df.select(F.col(col).cast("long").alias("id"))
    n = int(ids_df.agg(F.count_distinct("id").alias("n")).first()["n"] or 0)
    if n == 0:
        return {"n": 0, "m": 0, "k": 0, "bits": ""}
    if n > BLOOM_MAX_KEYS:
        return None
    if n <= DRIVER_IDS_CAP:
        ids = ids_df.distinct().toPandas()["id"].to_numpy()
        out = build_bloom(ids, fpp=fpp)
        out["n"] = n
        return out
    m, k = _geometry(n, fpp)
    mbytes = m // 8
    nchunks = (mbytes + chunk_bytes - 1) // chunk_bytes

    def partial(batches):
        bits = np.zeros(mbytes, dtype=np.uint8)
        seen = False
        for b in batches:
            arr = b.column(0).to_numpy(zero_copy_only=False)
            if arr.size:
                _scatter(bits, np.asarray(arr, dtype=np.int64), m, k)
                seen = True
        if not seen:
            return
        chunk_ids, blobs = [], []
        for c in range(nchunks):
            chunk = bits[c * chunk_bytes : (c + 1) * chunk_bytes]
            if chunk.any():
                chunk_ids.append(c)
                blobs.append(chunk.tobytes())
        if chunk_ids:
            yield pa.RecordBatch.from_arrays(
                [pa.array(chunk_ids, pa.int32()), pa.array(blobs, pa.binary())],
                names=["chunk", "bits"],
            )

    def orfold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        acc = np.frombuffer(pdf["bits"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["bits"].iloc[1:]:
            np.bitwise_or(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pd.DataFrame(
            {"chunk": [int(pdf["chunk"].iloc[0])], "bits": [acc.tobytes()]}
        )

    # coalesce never raises the partition count, so this is a no-op for
    # small scans and a hard bound on partial-bitmap count for big ones
    ids_df = ids_df.coalesce(PARTIAL_PARTITIONS)
    folded = (
        ids_df.mapInArrow(partial, "chunk int, bits binary")
        .groupBy("chunk")
        .applyInPandas(orfold, "chunk int, bits binary")
    )
    bits = np.zeros(mbytes, dtype=np.uint8)
    for r in folded.collect():  # ≤ nchunks rows, total = one bitmap
        c = int(r["chunk"])
        a = np.frombuffer(r["bits"], dtype=np.uint8)
        bits[c * chunk_bytes : c * chunk_bytes + a.size] = a
    return {
        "n": n,
        "m": m,
        "k": k,
        "bits": base64.b64encode(bits.tobytes()).decode("ascii"),
    }


def might_contain(bloom: dict, term_ids) -> np.ndarray:
    """Vectorized membership probe: bool per queried id (True = the
    segment MAY contain it; False = definitely absent)."""
    ids = np.asarray(list(term_ids), dtype=np.int64)
    if bloom["m"] == 0 or ids.size == 0:
        return np.zeros(ids.size, dtype=bool)
    bits = np.frombuffer(base64.b64decode(bloom["bits"]), dtype=np.uint8)
    m = np.uint64(bloom["m"])
    h1, h2 = _hash_pair(ids)
    out = np.ones(ids.size, dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(bloom["k"]):
            pos = (h1 + np.uint64(i) * h2) % m
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            out &= (
                byte >> (pos & np.uint64(7)).astype(np.uint8)
            ) & np.uint8(1) == 1
    return out


def might_contain_any(bloom: dict, term_ids) -> bool:
    return bool(might_contain(bloom, term_ids).any())


def write_sidecar(segment_dir: str, bloom: dict) -> str:
    """Atomic sidecar write INTO the (not-yet-committed) segment dir.
    The leading underscore keeps it invisible to Spark's parquet reader
    (Hadoop's hidden-file filter skips ``_``/``.``-prefixed files), and
    expire_snapshots' rmtree removes it with the segment."""
    path = os.path.join(segment_dir, SIDECAR)
    tmp = os.path.join(segment_dir, f".bloom.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(bloom, f)
    os.replace(tmp, path)
    return path


def load_sidecar(segment_dir: str) -> dict | None:
    """Cached sidecar read; None = segment has no bloom (pre-bloom
    segment or non-postings table) and must always be scanned."""
    path = os.path.join(segment_dir, SIDECAR)
    try:
        st = os.stat(path)
    except OSError:
        return None
    key = (path, st.st_ino, st.st_mtime_ns)
    if key not in _SIDECAR_CACHE:
        # evict stale identities of the same path (deleted + rebuilt
        # root); list() snapshot + pop — concurrent federated driver
        # threads may insert mid-walk (review r4-s2)
        for stale in list(_SIDECAR_CACHE):
            if stale[0] == path:
                _SIDECAR_CACHE.pop(stale, None)
        try:
            with open(path) as f:
                _SIDECAR_CACHE[key] = json.load(f)
        except (OSError, ValueError):
            return None
    return _SIDECAR_CACHE[key]
