"""Iceberg-style snapshot/manifest table layer (SURVEY.md §1.3).

The reference's Rdb is an LSM tree: immutable sorted runs on disk plus a
manifest of live files, atomically swapped by background merge
(RdbBase.cpp attemptMerge / RdbDump.cpp).  No Iceberg runtime jar ships in
this sandbox, so the same contract — atomic commit, snapshot isolation,
time travel, segment-list resolution — is provided by a tiny JSON snapshot
log over plain parquet segment directories.  The API is Iceberg-shaped
(append / rewrite / snapshot ids) so a real catalog can be swapped in with
one config change.

Layout:
    <root>/<table>/seg-<uuid>/...parquet        immutable segment data
    <root>/<table>/_snapshots/v<k>.json         snapshot k: list of live segments
    <root>/<table>/_snapshots/HEAD              text file: current version k

Commit protocol: write v<k>.json (fails if exists — optimistic concurrency),
then atomically replace HEAD via os.replace.  Readers resolve HEAD once and
only ever see a complete snapshot.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


# (applicationId, table dir, snapshot version) -> analyzed DataFrame.
# Dead-session and stale-version entries are evicted inside read().
_READ_CACHE: dict = {}
_READ_KEEP_VERSIONS = 4  # HEAD + AS-OF pins coexist; bound per table


def _read_cache_put(key: tuple, df) -> None:
    """Insert with eviction.  Dead-session entries (other application
    ids) go; same-table entries at the SAME version but a different
    snapshot identity are aliases from an in-place rebuild (truly stale);
    OLDER versions stay resident up to ``_READ_KEEP_VERSIONS`` distinct
    versions per table — time-travel AS-OF reads pin immutable old
    snapshots alongside HEAD, and evicting one on every head/pin
    alternation would re-pay the footer re-analysis this memo exists to
    avoid."""
    # list() snapshots + pop-tolerant deletes: federated queries reach
    # this memo from concurrent driver threads (review r4-s2), and a
    # bytecode-level comprehension over the live dict raises
    # RuntimeError if another thread inserts mid-iteration
    for stale in list(_READ_CACHE):
        if stale[0] != key[0] or (
            stale[1] == key[1] and stale[2] == key[2] and stale[3] != key[3]
        ):
            _READ_CACHE.pop(stale, None)
    _READ_CACHE[key] = df
    versions = sorted({k[2] for k in list(_READ_CACHE) if k[1] == key[1]})
    for v in versions[: -_READ_KEEP_VERSIONS] if len(versions) > _READ_KEEP_VERSIONS else []:
        for k in list(_READ_CACHE):
            if k[1] == key[1] and k[2] == v:
                _READ_CACHE.pop(k, None)


@dataclass
class Snapshot:
    version: int
    segments: list[str]
    operation: str
    meta: dict = field(default_factory=dict)


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.snap_dir = os.path.join(self.dir, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- write side ---------------------------------------------------------
    def new_segment_path(self, label: str = "seg") -> str:
        return os.path.join(self.dir, f"{label}-{uuid.uuid4().hex[:12]}")

    def write_segment(
        self, df: DataFrame, label: str = "seg", bloom_col: str | None = None
    ) -> str:
        path = self.new_segment_path(label)
        df.write.mode("errorifexists").parquet(path)
        if bloom_col is not None:
            # membership sidecar for read_pruned (functions/bloom.py —
            # the RdbMap file-pruning analog).  Ids are read back from
            # the segment's OWN parquet (one cheap single-column scan)
            # rather than from ``df``, so the upstream plan is never
            # recomputed; written before commit, immutable with the dir.
            # The build is distributed (r4 verdict #2): the driver never
            # receives an unbounded id list — only the fixed-size bitmap
            # (or a count-bounded pull for small segments).
            from ..functions import bloom as _bloom

            sidecar = _bloom.build_bloom_distributed(
                df.sparkSession.read.parquet(path), bloom_col
            )
            # None = vocabulary over BLOOM_MAX_KEYS: no sidecar, the
            # segment is always scanned (read_pruned treats a missing
            # sidecar as unprunable — correct, just unpruned)
            if sidecar is not None:
                _bloom.write_sidecar(path, sidecar)
        return path

    def _rel(self, path: str) -> str:
        """Store segment paths RELATIVE to the table dir so an index
        directory can be renamed/copied/moved atomically (absolute paths
        froze the tree in place).  Paths outside the table dir stay
        absolute."""
        rel = os.path.relpath(path, self.dir)
        return path if rel.startswith("..") else rel

    def _abs(self, path: str) -> str:
        return path if os.path.isabs(path) else os.path.join(self.dir, path)

    def commit(
        self,
        add: list[str] | None = None,
        remove: list[str] | None = None,
        operation: str = "append",
        meta: dict | None = None,
        _retries: int = 50,
    ) -> Snapshot:
        """Atomic snapshot commit (the RdbDump 'file set swap' analog).

        Optimistic concurrency: the version file is created with 'x' mode;
        losing a race re-reads HEAD and retries on top of the winner (the
        way Iceberg commits retry) — concurrent shard jobs commit safely.
        """
        for _ in range(_retries):
            try:
                return self._commit_once(add, remove, operation, meta)
            except FileExistsError:
                time.sleep(0.05)
        raise RuntimeError(f"snapshot commit contention on {self.dir}")

    def _commit_once(
        self,
        add: list[str] | None,
        remove: list[str] | None,
        operation: str,
        meta: dict | None,
    ) -> Snapshot:
        cur = self._latest_raw()
        segs = list(cur.segments) if cur else []
        for r in remove or []:
            r = self._rel(r)
            segs.remove(r if r in segs else self._abs(r))
        segs.extend(self._rel(a) for a in add or [])
        version = (cur.version + 1) if cur else 0
        snap = Snapshot(version, segs, operation, meta or {})
        path = os.path.join(self.snap_dir, f"v{version}.json")
        with open(path, "x") as f:
            json.dump(
                {
                    "version": version,
                    "segments": segs,
                    "operation": operation,
                    "meta": snap.meta,
                    "ts": time.time(),
                },
                f,
            )
        tmp = os.path.join(self.snap_dir, f".HEAD.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.snap_dir, "HEAD"))
        return snap

    # -- read side ----------------------------------------------------------
    def snapshot_ident(self, version: int) -> tuple:
        """Filesystem identity (inode, mtime_ns) of a snapshot's version
        file.  Caches keyed by (table, version) alone would alias across
        an index root deleted and rebuilt in place (version numbering
        restarts at 0); joining this identity to the key makes that
        impossible."""
        try:
            st = os.stat(os.path.join(self.snap_dir, f"v{version}.json"))
            return (st.st_ino, st.st_mtime_ns)
        except OSError:
            return ()

    def latest(self) -> Snapshot | None:
        snap = self._latest_raw()
        if snap is None:
            return None
        return Snapshot(
            snap.version,
            [self._abs(s) for s in snap.segments],
            snap.operation,
            snap.meta,
        )

    def _latest_raw(self) -> Snapshot | None:
        head = os.path.join(self.snap_dir, "HEAD")
        if not os.path.exists(head):
            return None
        with open(head) as f:
            version = int(f.read().strip())
        return self._at_raw(version)

    def at(self, version: int) -> Snapshot:
        """Time travel to snapshot ``version`` (segment paths resolved)."""
        snap = self._at_raw(version)
        return Snapshot(
            snap.version,
            [self._abs(s) for s in snap.segments],
            snap.operation,
            snap.meta,
        )

    def _at_raw(self, version: int) -> Snapshot:
        with open(os.path.join(self.snap_dir, f"v{version}.json")) as f:
            d = json.load(f)
        return Snapshot(d["version"], d["segments"], d["operation"], d.get("meta", {}))

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        """DataFrame over the snapshot's live segments.

        The returned (unresolved-plan) DataFrame is memoized per
        (application, table, snapshot version): re-analyzing
        ``spark.read.parquet(paths...)`` re-lists segment directories and
        re-reads footers — a driver-side job (~0.3-0.5 s on this VM) that
        every warm query was paying per table touch.  Snapshot versions
        are immutable, so reuse is always sound; stale versions for the
        same table are evicted on advance (the Msg5 'termlist reader
        keeps its file handles open' analog)."""
        snap = self.latest() if version is None else self.at(version)
        if snap is None or not snap.segments:
            return None
        key = (
            spark.sparkContext.applicationId,
            self.dir,
            snap.version,
            self.snapshot_ident(snap.version),
        )
        df = _READ_CACHE.get(key)
        if df is None:
            df = spark.read.parquet(*snap.segments)
            _read_cache_put(key, df)
        return df

    def pruned_segments(
        self, term_ids, version: int | None = None
    ) -> tuple[list[str], int]:
        """(segments that may contain any of ``term_ids``, total live
        segments) for the snapshot — bloom-sidecar file pruning (the
        Msg5/RdbMap 'which runs hold this key' narrowing).  Segments
        without a sidecar are never pruned."""
        from ..functions import bloom as _bloom

        snap = self.latest() if version is None else self.at(version)
        if snap is None:
            return [], 0
        ids = list(term_ids)
        keep = []
        for seg in snap.segments:
            b = _bloom.load_sidecar(seg)
            if b is None or _bloom.might_contain_any(b, ids):
                keep.append(seg)
        return keep, len(snap.segments)

    def read_pruned(
        self, spark: SparkSession, term_ids, version: int | None = None
    ) -> DataFrame | None:
        """``read()`` restricted to the segments whose bloom sidecar may
        contain any of ``term_ids``.  Strictly a superset-of-the-truth
        file set, so every downstream pushed ``term_id`` filter returns
        identical rows — only the files listed/scanned shrink.

        When nothing prunes, this delegates to ``read()`` and shares its
        per-snapshot memo; pruned subsets get their own memo entries
        (snapshot + file subset are both immutable)."""
        snap = self.latest() if version is None else self.at(version)
        if snap is None or not snap.segments:
            return None
        keep, total = self.pruned_segments(term_ids, version=snap.version)
        if len(keep) == total:
            return self.read(spark, version=snap.version)
        if not keep:
            # every bloom excludes every queried term.  Callers expect a
            # DataFrame with the table's schema (they've usually already
            # resolved the terms in the dictionary), so serve the single
            # cheapest-possible scan: one segment, whose pushed filter
            # then matches zero rows.
            keep = [snap.segments[0]]
        key = (
            spark.sparkContext.applicationId,
            self.dir,
            snap.version,
            self.snapshot_ident(snap.version),
            tuple(keep),
        )
        df = _READ_CACHE.get(key)
        if df is None:
            df = spark.read.parquet(*keep)
            _read_cache_put(key, df)
        return df

    def history(self) -> list[int]:
        out = []
        for fn in os.listdir(self.snap_dir):
            if fn.startswith("v") and fn.endswith(".json"):
                out.append(int(fn[1:-5]))
        return sorted(out)

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Physically delete expired manifests and the segment files only
        they reference (Iceberg expire_snapshots) — the disk-growth bound
        time travel needs at scale: without expiry every compaction
        doubles stored postings forever.

        Keeps the newest ``keep_last`` snapshots; AS-OF reads older than
        the retention window fail fast afterwards (FileNotFoundError on
        the manifest).  Run with retention >= the longest as-of horizon
        in use.  Segment dirs referenced by NO snapshot (in-flight
        uncommitted writes) are never touched — only segments reachable
        exclusively from expired manifests are removed.
        """
        import shutil

        head = self._latest_raw()
        if head is None:
            return {"expired_snapshots": 0, "removed_segments": 0}
        versions = self.history()
        keep = set(versions[-max(1, keep_last):])
        expired = [v for v in versions if v not in keep]
        kept_segs = set()
        for v in keep:
            kept_segs.update(self._at_raw(v).segments)
        expired_segs = set()
        for v in expired:
            expired_segs.update(self._at_raw(v).segments)
        removed = 0
        for rel in expired_segs - kept_segs:
            path = self._abs(rel)
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
                removed += 1
        for v in expired:
            try:
                os.remove(os.path.join(self.snap_dir, f"v{v}.json"))
            except OSError:
                pass
        return {"expired_snapshots": len(expired), "removed_segments": removed}
