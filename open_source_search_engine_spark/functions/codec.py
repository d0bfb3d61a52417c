"""Delta + varint postings codec (SURVEY.md §2.8 X10).

Reference analog: posdb's key prefix compression — 18-byte full keys shrink
to 12B (same termId) and 6B (same termId+docId) inside an RdbList
(Posdb.h key-format comment; RdbList.cpp addRecord/constrain).  Here the
same redundancy is removed explicitly: within one termlist block, doc_ids
are ascending, so we store varint(delta(doc_ids)); tfs are small ints ->
varint; positions are stored as varint(delta) per doc, length-prefixed by tf.

All encode/decode is numpy-vectorized (no per-element Python loops beyond
byte assembly) and runs inside Arrow-batched pandas UDFs / applyInPandas —
never row-at-a-time (input_hint mandate).

Wire format (little-endian LEB128 varints):
  doc_ids_enc  : varint(d0), varint(d1-d0), varint(d2-d1), ...
  tfs_enc      : varint(tf0), varint(tf1), ...
  positions_enc: for each doc in order: varint(p0), varint(p1-p0), ...
                 (count of positions for doc i == tf_i, so no length prefix)
"""

from __future__ import annotations

import numpy as np

_MASK = 0x7F


def encode_varint_with_lengths(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a non-negative uint64 array, fully vectorized.

    Returns (byte_array uint8, per-value byte lengths) so callers can slice
    the stream at arbitrary value boundaries — the whole-batch encode path
    uses this to encode millions of termlists in one numpy pass.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # byte length per value: ceil(bitlength/7), min 1.  log2-on-float is
    # unsafe past 2^53, so count 7-bit groups with a shift loop (<=10
    # iterations, each fully vectorized).
    tmp = v.copy()
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp >>= np.uint64(7)
    while tmp.any():
        nbytes[tmp > 0] += 1
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # for each of up to 10 groups, write byte k of every value with nbytes>k
    shifted = v.copy()
    max_groups = int(nbytes.max())
    for k in range(max_groups):
        sel = nbytes > k
        idx = starts[sel] + k
        byte = (shifted[sel] & np.uint64(_MASK)).astype(np.uint8)
        cont = (nbytes[sel] > k + 1).astype(np.uint8) << 7
        out[idx] = byte | cont
        shifted >>= np.uint64(7)
    return out, nbytes


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int64/uint64 array -> bytes."""
    out, _ = encode_varint_with_lengths(np.asarray(values, dtype=np.uint64))
    return out.tobytes()


def decode_varint(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 buffer into an int64 array — vectorized.

    Finds value boundaries from continuation bits, then folds 7-bit groups.
    """
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.int64)
    is_end = (raw & 0x80) == 0
    ends = np.flatnonzero(is_end)
    n = ends.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max())
    payload = (raw & _MASK).astype(np.uint64)
    for k in range(max_len):
        sel = lengths > k
        vals[sel] |= payload[starts[sel] + k] << np.uint64(7 * k)
    out = vals.astype(np.int64)
    if count is not None and out.size != count:
        raise ValueError(f"decoded {out.size} varints, expected {count}")
    return out


_SHIFT = np.uint64(1 << 63)


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Delta-encode an ascending int64 array.

    doc_ids are xxhash64 values spanning the whole signed-int64 range, so
    gaps can overflow int64; we map through the order-preserving bijection
    x -> uint64(x) + 2^63 and diff in uint64 (never overflows for
    ascending input).  Returns uint64 deltas.
    """
    a = np.asarray(sorted_vals, dtype=np.int64)
    if a.size == 0:
        return a.astype(np.uint64)
    u = a.astype(np.uint64) + _SHIFT  # wraps: two's-complement shift
    if (u[1:] < u[:-1]).any():
        raise ValueError("delta_encode requires ascending input")
    d = np.empty_like(u)
    d[0] = u[0]
    np.subtract(u[1:], u[:-1], out=d[1:])
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode` -> int64 array."""
    du = np.asarray(deltas).astype(np.uint64)
    s = np.cumsum(du)  # telescopes back to shifted values, no overflow
    return (s - _SHIFT).astype(np.int64)


def encode_postings_block(
    doc_ids: np.ndarray, tfs: np.ndarray, positions_concat: np.ndarray,
    pos_doc_boundaries: np.ndarray,
) -> tuple[bytes, bytes, bytes]:
    """Encode one termlist block.

    positions_concat: all docs' position lists concatenated in doc order;
    pos_doc_boundaries: start offset of each doc's positions (len == n_docs),
    used to delta-encode positions per doc without a Python loop: subtract
    the previous position except at each doc's first position.
    """
    doc_enc = encode_varint(delta_encode(doc_ids))
    tf_enc = encode_varint(np.asarray(tfs, dtype=np.int64))
    pos = np.asarray(positions_concat, dtype=np.int64)
    if pos.size:
        deltas = np.empty_like(pos)
        deltas[0] = pos[0]
        np.subtract(pos[1:], pos[:-1], out=deltas[1:])
        # reset delta at each doc's first position to the absolute value
        firsts = np.asarray(pos_doc_boundaries, dtype=np.int64)
        deltas[firsts] = pos[firsts]
        pos_enc = encode_varint(deltas)
    else:
        pos_enc = b""
    return doc_enc, tf_enc, pos_enc


def decode_postings_block(
    doc_enc: bytes, tf_enc: bytes, pos_enc: bytes, n_docs: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block -> (doc_ids, tfs, positions_concat, boundaries)."""
    doc_ids = delta_decode(decode_varint(doc_enc, n_docs))
    tfs = decode_varint(tf_enc, n_docs)
    boundaries = np.zeros(n_docs, dtype=np.int64)
    if n_docs:
        np.cumsum(tfs[:-1], out=boundaries[1:])
    pos_deltas = decode_varint(pos_enc)
    if pos_deltas.size:
        # segmented cumsum: cumsum within each doc's slice.  Standard trick:
        # global cumsum, then subtract the running total at each segment start.
        g = np.cumsum(pos_deltas)
        offsets = np.zeros(pos_deltas.size, dtype=np.int64)
        seg_starts = boundaries[tfs > 0] if n_docs else boundaries
        # value to subtract for segment i = g[start_i - 1] (0 for first seg)
        nonfirst = seg_starts[seg_starts > 0]
        offsets[nonfirst] = g[nonfirst - 1]
        # propagate per-segment offsets forward with a cummax
        offsets = np.maximum.accumulate(offsets)
        positions = g - offsets
    else:
        positions = pos_deltas
    return doc_ids, tfs.astype(np.int64), positions, boundaries
