"""Segment compaction + tombstone maintenance (SURVEY.md §2.9 R3/R4, U4).

Reference analog: RdbBase::attemptMerge k-way-merges sorted runs and
annihilates delbit tombstone pairs; Msg5 resolves tree+files on the fly
until then.  The Spark rebuild:

- incremental adds append immutable segments (streaming/incremental.py);
  deletes append doc_id tombstones to the ``deletes`` table (merge-on-read);
- ``compact_postings`` rewrites all live segments into one
  term_id-range-sorted segment, dropping tombstoned docs, then atomically
  swaps the snapshot (and clears consumed tombstones) — the LSM merge.

Updates never collide on doc_id: doc_id = hash(repo, path, commit), so a
changed file arrives under a new commit => new doc_id, and the old
doc_id is tombstoned (the reference's 'delete old TitleRec keys then add
new' diff, XmlDoc::getMetaList).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import SnapshotTable
from .build import Index, _write_tiny_segment, encode_blocks, finalize_stats

# tombstone count above which compaction stops collecting the dead set to
# the driver for a broadcast anti-join and instead anti-joins against the
# deletes table directly (distributed).  Mirrors topk.MAX_DEAD_INLINE.
DEAD_BROADCAST_CAP = 100_000


def deletes_table(idx: Index) -> SnapshotTable:
    # time-travel views (operators/timetravel.IndexAsOf) pin the deletes
    # snapshot too — tombstones are part of what the index served at a
    # point in time
    override = getattr(idx, "_deletes_override", None)
    if override is not None:
        return override
    return SnapshotTable(idx.root, "deletes")


def delete_docs(spark: SparkSession, idx: Index, doc_ids: list[int]) -> None:
    """Append tombstones (merge-on-read): queries exclude these doc_ids
    until the next compaction physically drops them.  An empty list
    commits nothing (same no-churn contract as delete_docs_df)."""
    if not doc_ids:
        return
    pdf = pd.DataFrame({"doc_id": np.asarray(doc_ids, dtype=np.int64)})
    t = deletes_table(idx)
    seg = _write_tiny_segment(t, pdf, "del")
    t.commit(add=[seg], meta={"n": len(doc_ids)})


def delete_docs_df(spark: SparkSession, idx: Index, doc_ids: DataFrame) -> int:
    """Distributed tombstone append (PageReindex-scale delete batches):
    the match set is written as a delete segment straight from the
    executors — nothing collects to the driver.  Returns the tombstone
    count, read back from the WRITTEN segment so the upstream plan never
    re-executes.  An empty match set commits nothing (no snapshot churn,
    no cache invalidation)."""
    import shutil

    t = deletes_table(idx)
    df = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    seg = t.write_segment(df, "del")
    n = int(spark.read.parquet(seg).count())
    if n == 0:
        shutil.rmtree(seg, ignore_errors=True)
        return 0
    t.commit(add=[seg], meta={"n": n})
    return n


# per-snapshot tombstone cache: the WAND kernel needs the dead set as a
# driver-side array (it must exclude dead docs BEFORE the bounded heap so
# survivors are true local top-k), but collecting it per query was a Spark
# job on the hot path — cache keyed by the deletes snapshot version.
# Values are either the materialized array or an ("over", cap) marker
# recording that the DISTINCT count is known to exceed ``cap``.
_DEAD_CACHE: dict[tuple, object] = {}


def deleted_doc_ids(
    spark: SparkSession,
    idx: Index,
    version: int | None = None,
    cap: int | None = None,
) -> np.ndarray | None:
    """Sorted DISTINCT live tombstones (small between compactions by
    design), cached per deletes-table snapshot.  The key carries the
    snapshot file identity: an index root deleted and rebuilt in place
    restarts version numbering, and a bare (root, version) key would
    serve the old build's dead set (the same aliasing every other
    version-keyed cache here guards against).  Dedup matters too:
    delete_docs appends without checking prior segments, and a repeated
    delete must not inflate the count toward MAX_DEAD_INLINE.
    ``version`` pins a specific snapshot (compaction uses this so the
    set it annihilates is exactly the set whose segments it clears).

    ``cap``: when given, returns ``None`` if the DISTINCT tombstone
    count exceeds it — and, critically, decides that WITHOUT ever
    materializing more than ``cap + 1`` ids on the driver (distinct +
    ``limit(cap+1)`` runs server-side).  The r4 verdict's last latent
    driver-OOM was the old shape: collect the WHOLE deletes table, THEN
    compare ``len()`` to the cap — at bulk-delete scale the driver died
    inside the very collect the cap exists to prevent.  Callers that hit
    ``None`` must take their distributed path (anti-join against the
    deletes table)."""
    t = deletes_table(idx)
    snap = t.latest() if version is None else t.at(version)
    ident = t.snapshot_ident(snap.version) if snap else ()
    key = (idx.root, snap.version if snap else -1, ident)
    hit = _DEAD_CACHE.get(key)
    if hit is not None:
        if isinstance(hit, np.ndarray):
            if cap is not None and hit.size > cap:
                return None
            return hit
        # ("over", t): distinct count known to exceed t.  A tighter or
        # equal cap is answered from the marker; a looser cap (or a full
        # materialization request) must re-probe.
        if cap is not None and cap <= hit[1]:
            return None
    # versions only move forward: evict this root's stale-version entries
    # (list() snapshot + pop: concurrent federated driver threads may
    # insert/evict during the walk — review r4-s2)
    for k in list(_DEAD_CACHE):
        if k[0] == idx.root and k != key:
            _DEAD_CACHE.pop(k, None)
    df = t.read(spark, version=snap.version if snap else None) if snap else None
    if df is None:
        out = np.empty(0, dtype=np.int64)
    elif cap is not None:
        rows = df.select("doc_id").distinct().limit(cap + 1).collect()
        if len(rows) > cap:
            _DEAD_CACHE[key] = ("over", cap)
            return None
        out = _sorted_dead(rows)
    else:
        out = _sorted_dead(df.collect())
    _DEAD_CACHE[key] = out
    return out


def _sorted_dead(rows) -> np.ndarray:
    """Collected rows -> sorted DISTINCT int64 dead-doc array.
    np.unique's ascending SIGNED order is exactly what the WAND
    kernel's unsigned-shifted searchsorted needs: x -> x + 2^63 in
    uint64 space is monotone in signed x, so no re-sort is required."""
    return np.unique(np.array([r["doc_id"] for r in rows], dtype=np.int64))


def decode_to_postings(blocks: DataFrame, with_positions: bool = True) -> DataFrame:
    """Stored blocks -> posting rows (term_id, doc_id, doclen, tf
    [, pos_enc]) — the exact inverse of the encode kernel, so a
    compaction round-trips through the same fast Arrow path.

    The per-doc position streams are NOT decoded: the wire format is
    per-doc self-contained inside a block, so each doc's byte range is
    recovered from varint continuation bits + tf counts and re-sliced
    zero-copy.  ``with_positions=False`` skips the positions column
    entirely (never read from parquet, never scanned for continuation
    bits) — the scoring paths use this mode."""
    import pyarrow as pa

    from ..functions import codec

    cols = ["term_id", "n_docs", "doc_ids_enc", "tfs_enc", "doclens_enc"]
    if with_positions:
        cols.append("positions_enc")

    def decode(batches):
        for batch in batches:
            c = {n: batch.column(i) for i, n in enumerate(batch.schema.names)}
            t_out, d_out, l_out, f_out = [], [], [], []
            pos_chunks: list[np.ndarray] = []
            row_pos_lens: list[np.ndarray] = []
            for i in range(batch.num_rows):
                nd = int(c["n_docs"][i].as_py())
                d, tf, _pos, _b = codec.decode_postings_block(
                    c["doc_ids_enc"][i].as_py(), c["tfs_enc"][i].as_py(), b"", nd
                )
                dl = codec.decode_varint(c["doclens_enc"][i].as_py(), nd)
                if with_positions:
                    raw = np.frombuffer(c["positions_enc"][i].as_py(), dtype=np.uint8)
                    # per-value byte length from continuation bits -> per-doc
                    # byte lengths by summing tf consecutive value lengths
                    if raw.size:
                        vends = np.flatnonzero((raw & 0x80) == 0) + 1
                        tfcum = np.cumsum(tf)
                        doc_byte_end = vends[tfcum - 1]
                        doc_byte_start = np.empty(nd, dtype=np.int64)
                        doc_byte_start[0] = 0
                        doc_byte_start[1:] = doc_byte_end[:-1]
                        lens = doc_byte_end - doc_byte_start
                    else:
                        lens = np.zeros(nd, dtype=np.int64)
                    pos_chunks.append(raw)
                    row_pos_lens.append(lens)
                t_out.append(np.full(nd, c["term_id"][i].as_py(), dtype=np.int64))
                d_out.append(d)
                l_out.append(dl.astype(np.int32))
                f_out.append(tf.astype(np.int32))
            if not t_out:
                continue
            arrays = [
                pa.array(np.concatenate(t_out)),
                pa.array(np.concatenate(d_out)),
                pa.array(np.concatenate(l_out)),
                pa.array(np.concatenate(f_out)),
            ]
            names = ["term_id", "doc_id", "doclen", "tf"]
            if with_positions:
                values = (
                    np.concatenate(pos_chunks) if pos_chunks else np.empty(0, np.uint8)
                )
                lens_all = np.concatenate(row_pos_lens)
                total_b = int(lens_all.sum())
                assert total_b < 2**31, (
                    f"pos stream {total_b}B overflows int32 Arrow offsets"
                )
                offs = np.zeros(len(lens_all) + 1, dtype=np.int32)
                np.cumsum(lens_all, out=offs[1:])
                arrays.append(
                    pa.BinaryArray.from_buffers(
                        pa.binary(),
                        len(lens_all),
                        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(values.tobytes())],
                    )
                )
                names.append("pos_enc")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    schema = "term_id long, doc_id long, doclen int, tf int"
    if with_positions:
        schema += ", pos_enc binary"
    return blocks.select(*cols).mapInArrow(decode, schema)


def compact_deltas(
    spark: SparkSession,
    idx: Index,
    keep_largest: int = 2,
    salt_target: int = 50_000,
    block_size: int = 4096,
    run_id: str = "minor",
) -> int:
    """Tiered (minor) merge — the RdbBase 'merge a SUBSET of files'
    mode: rewrite all but the ``keep_largest`` biggest postings segments
    into ONE sorted, shard-pure segment.  Cost is O(merged deltas), not
    O(index) — the steady-state maintenance op for an index taking
    continuous small adds, with ``compact_postings`` as the major
    compaction that also annihilates tombstones.

    Semantics: pure merge.  Tombstones are NOT consumed (they stay in
    the deletes table and both query paths keep honoring them);
    docstats / termstats / collstats are untouched (no postings are
    added or dropped, so df/cf/N/avgdl are unchanged by construction).
    The merged segment takes FRESH shard ids (max existing + 1 ...)
    disjoint from every kept segment's, preserving the per-(shard,term)
    salt-modulus invariant the WAND probe routing relies on; docs from
    different add-batches never collide because each batch owns its
    doc_ids.

    Returns the number of segments merged (0 = no-op).
    """
    import os

    from pyspark import StorageLevel

    snap = idx.postings.latest()
    if snap is None or len(snap.segments) <= keep_largest + 1:
        return 0

    def seg_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total

    by_size = sorted(snap.segments, key=seg_bytes, reverse=True)
    merge_these = by_size[keep_largest:]
    blocks_df = spark.read.parquet(*merge_these)
    # fresh shard ids from commit-history metadata (driver-side JSON
    # walk) — scanning every live segment for max(shard) would make the
    # 'O(merged deltas)' minor merge pay an O(index) parquet scan just to
    # pick an id
    from ..streaming.incremental import _next_shard_id

    first_shard = _next_shard_id(idx)
    n_sub = max(int(blocks_df.select("shard").distinct().count()), 1)
    posts = decode_to_postings(blocks_df).withColumn(
        "shard",
        (F.lit(int(first_shard)) + F.pmod(F.col("doc_id"), F.lit(n_sub))).cast(
            "int"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # persist: repartitionByRange's boundary-sampling pass would
    # otherwise run the whole merge-encode twice (same hazard build.py
    # and compact_postings guard against)
    merged = encode_blocks(
        posts, salt_target=salt_target, block_size=block_size, sharded=True
    ).persist(StorageLevel.MEMORY_AND_DISK)
    merged_sorted = merged.repartitionByRange("term_id").sortWithinPartitions(
        "term_id", "salt", "block_id"
    )
    seg = idx.postings.write_segment(
        merged_sorted, label="minor", bloom_col="term_id"
    )
    merged.unpersist()
    posts.unpersist()
    idx.postings.commit(
        add=[seg],
        remove=list(merge_these),
        operation="minor-merge",
        meta={
            "run_id": run_id,
            "merged_segments": len(merge_these),
            "max_shard": int(first_shard) + n_sub - 1,
        },
    )
    return len(merge_these)


def compact_postings(
    spark: SparkSession,
    idx: Index,
    salt_target: int = 50_000,
    block_size: int = 4096,
    run_id: str = "compact",
    n_shards: int | None = None,
) -> None:
    """Rewrite all live postings segments into one merged, tombstone-free,
    term_id-range-sorted segment and swap snapshots atomically (R3).

    Doc-shard parallelism is PRESERVED (r3 verdict #1): the compacted
    segment re-shards every posting by ``pmod(doc_id, n_shards)`` — one
    sorted shard-pure run per doc-partition, all encoded in a single
    shuffle — so post-compaction WAND queries still scatter one kernel
    task per shard (Msg39; RdbBase keeps per-host file sets through its
    merges too).  ``n_shards`` defaults to the number of distinct shard
    ids in the pre-compaction snapshot (incremental adds allocate fresh
    ids per batch, so this also renormalizes shard proliferation back to
    the index's steady-state width).

    Docstats/termstats are rebuilt consistently; consumed tombstones are
    cleared in the same logical operation (snapshot commits are per-table
    but idempotent — a crash mid-way leaves a readable index either way).
    """
    from pyspark import StorageLevel

    # a half-committed delta batch (add_documents died before its
    # postings commit) must be healed BEFORE compaction, or its orphan
    # docstats/termstats_partial segments get baked into the rebuilt stats
    from ..streaming.incremental import repair_orphan_deltas

    repair_orphan_deltas(idx)
    # capture the snapshots FIRST, read those exact versions: a commit
    # landing between read() and latest() (concurrent add_documents /
    # delete) would otherwise have its segment removed by the swap below
    # without its contents being merged — silent data loss
    prev_snap = idx.postings.latest()
    if prev_snap is None:
        return
    blocks_df = idx.postings.read(spark, version=prev_snap.version)
    if blocks_df is None:
        return
    dt = deletes_table(idx)
    del_snap = dt.latest()
    if n_shards is None:
        n_shards = max(int(blocks_df.select("shard").distinct().count()), 1)
    dead = (
        deleted_doc_ids(
            spark, idx, version=del_snap.version, cap=DEAD_BROADCAST_CAP
        )
        if del_snap is not None
        else np.empty(0, dtype=np.int64)
    )
    if dead is None:
        # bulk-delete scale: the tombstone set never touches the driver —
        # the anti-joins below run against the deletes table itself
        # (sort-merge/shuffled hash under AQE; a broadcast of this side
        # would be exactly the OOM the cap guards against)
        dead_df = (
            dt.read(spark, version=del_snap.version)
            .select(F.col("doc_id").cast("long"))
            .distinct()
        )
        n_dead = int(dead_df.count())
    else:
        dead_df = (
            F.broadcast(
                spark.createDataFrame(
                    pd.DataFrame({"doc_id": dead.astype(np.int64)})
                )
            )
            if len(dead)
            else None
        )
        n_dead = int(len(dead))
    posts = decode_to_postings(blocks_df)
    if dead_df is not None:
        posts = posts.join(dead_df, "doc_id", "left_anti")
    posts = posts.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    merged = encode_blocks(
        posts, salt_target=salt_target, block_size=block_size, sharded=True
    ).persist(StorageLevel.MEMORY_AND_DISK)
    merged_sorted = merged.repartitionByRange("term_id").sortWithinPartitions(
        "term_id", "salt", "block_id"
    )
    seg = idx.postings.write_segment(
        merged_sorted, label="compacted", bloom_col="term_id"
    )
    ts_partial = merged.groupBy("term_id").agg(
        F.sum("n_docs").alias("df"),
        F.sum("sum_tf").alias("cf"),
        F.count("*").alias("n_blocks"),
    )
    tsp_seg = idx.termstats_partial.write_segment(ts_partial.coalesce(4), label="compacted")
    merged.unpersist()
    posts.unpersist()

    idx.postings.commit(
        add=[seg], remove=list(prev_snap.segments), operation="compact",
        meta={
            "run_id": run_id,
            "tombstones_dropped": n_dead,
            "n_shards": int(n_shards),
            # a later add_documents allocates shard ids ABOVE this: the
            # compacted segment occupies 0..n_shards-1, and a colliding
            # delta shard id would break the per-(shard,term) salt-modulus
            # invariant the WAND probe routing relies on
            "max_shard": int(n_shards) - 1,
        },
    )
    prev_tsp = idx.termstats_partial.latest()
    idx.termstats_partial.commit(
        add=[tsp_seg], remove=list(prev_tsp.segments), operation="compact"
    )
    # docstats: physically drop tombstoned docs (snapshot captured
    # before the read, same as postings above)
    if dead_df is not None:
        prev_ds = idx.docstats.latest()
        ds = idx.docstats.read(spark, version=prev_ds.version)
        live = ds.join(dead_df, "doc_id", "left_anti")
        ds_seg = idx.docstats.write_segment(live, label="compacted")
        idx.docstats.commit(add=[ds_seg], remove=list(prev_ds.segments), operation="compact")
        # clear ONLY the tombstone segments whose ids were annihilated
        # (del_snap, captured before `dead`): a delete committed while
        # the compaction jobs ran keeps its segment — and its docs stay
        # excluded merge-on-read instead of resurrecting
        if del_snap is not None and del_snap.segments:
            dt.commit(remove=list(del_snap.segments), operation="clear")
    finalize_stats(spark, idx, run_id)
