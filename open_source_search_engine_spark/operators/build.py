"""Index build pipeline (SURVEY.md §3.2 — the XmlDoc::hashAll ->
Msg4 route -> Rdb store chain, rebuilt as one DataFrame program).

Shape:
    documents -> derive(doc_id, content_sha256, doclen, tokens)
              -> posexplode -> groupBy(term, doc_id) agg(tf, positions)   # A1
              -> shard-local df per term -> salted repartition            # skew
              -> applyInPandas encode (sorted, delta+varint blocks)       # X10/T5
              -> repartitionByRange(term_id) sorted segment write         # S4
    + docstats / termstats partials / collstats / checkpoints / metrics.

Scale design (100 TB story):
- The corpus is processed in ``n_shards`` doc-hash shards, each an
  independent job writing an immutable sorted segment — exactly posdb's
  document-partitioned sharding (Hostdb::getShardNum on docId) and the LSM
  dump of one sorted run (RdbDump).  A failed run resumes by skipping
  shards whose checkpoint row exists (north-rule resumability; Repair.cpp
  analog S11).
- Heavy terms (zipf head) are salted: a term whose shard-local df exceeds
  ``salt_target`` is split into ceil(df/salt_target) sub-lists keyed by
  (term, pmod(doc_id, n_salts)) before the encode groupBy, so no single
  task materializes a monster termlist.  Salt is a build-time partitioning
  device only — queries match blocks by term_id and never see salts.
- doclen is denormalized into each block (the way posdb packs densityRank
  into every key) so scoring never joins docstats.
- Everything shuffles on term or doc_id; nothing collects to the driver.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from ..functions.hashing import content_sha256, doc_id_col, term_hash_py
from ..functions.tokenize import tokenize_to_postings
from ..sources.tables import SnapshotTable

BLOCK_SCHEMA = (
    "term_id long, salt int, n_salts int, block_id int, n_docs int, sum_tf long, "
    "min_doc_id long, "
    "max_doc_id long, max_tf int, min_doclen int, doc_ids_enc binary, tfs_enc binary, "
    "doclens_enc binary, positions_enc binary"
)


@dataclass
class Index:
    root: str

    def features(self) -> dict:
        """Index-level format flags (e.g. {"bigrams": true}) — written at
        build time, consulted by query planning (a query can't know
        whether pair termlists exist without it)."""
        import json

        try:
            with open(os.path.join(self.root, "_features.json")) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def write_features(self, **kv) -> None:
        import json

        d = {**self.features(), **kv}
        os.makedirs(self.root, exist_ok=True)
        tmp = os.path.join(self.root, f".features.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(d, f)
        os.replace(tmp, os.path.join(self.root, "_features.json"))

    @property
    def postings(self) -> SnapshotTable:
        return SnapshotTable(self.root, "postings")

    @property
    def docstats(self) -> SnapshotTable:
        return SnapshotTable(self.root, "docstats")

    @property
    def termdict(self) -> SnapshotTable:
        return SnapshotTable(self.root, "termdict")

    @property
    def termstats_partial(self) -> SnapshotTable:
        return SnapshotTable(self.root, "termstats_partial")

    @property
    def termstats(self) -> SnapshotTable:
        return SnapshotTable(self.root, "termstats")

    @property
    def collstats(self) -> SnapshotTable:
        return SnapshotTable(self.root, "collstats")

    @property
    def checkpoints(self) -> SnapshotTable:
        return SnapshotTable(self.root, "checkpoints")

    @property
    def metrics(self) -> SnapshotTable:
        return SnapshotTable(self.root, "metrics")

    @property
    def lineage(self) -> SnapshotTable:
        return SnapshotTable(self.root, "lineage")


# Per-snapshot cached docmeta projection (J5 enrich probe side) — the
# title-rec cache analog (Msg20/Msg22 keep doc metadata resident instead of
# re-reading it per query).  Without this every enriched query pays a fresh
# parquet scan of docstats; with it the broadcast top-k probes in-memory
# columnar partitions.  Spark's .cache() spills per-partition, so the same
# code holds on a cluster where docstats exceeds executor memory.
_DOCMETA_CACHE: dict[tuple[str, int], DataFrame] = {}


def docmeta_cached(spark: SparkSession, index: Index) -> DataFrame:
    """Cached ``(doc_id, repo, path, lang)`` projection of the latest
    docstats snapshot.  Stale-version entries for the same index root are
    unpersisted on insert (snapshot versions only move forward).  Keyed by
    the Spark application id too: a cached DataFrame belongs to one
    SparkContext, and handing it to a later session (stop/start cycles,
    e.g. multi-level benchmarks) would raise "stopped SparkContext"."""
    snap = index.docstats.latest()
    app = spark.sparkContext.applicationId
    # snapshot-file identity joins the key (r4): an index root deleted and
    # rebuilt in place restarts version numbering, and a bare version key
    # would alias the old build's cached projection
    ident = index.docstats.snapshot_ident(snap.version) if snap else ()
    key = (f"{app}|{index.root}", snap.version if snap else -1, ident)
    df = _DOCMETA_CACHE.get(key)
    if df is None:
        # evict: dead-session entries (other app ids) + this root's
        # same-version different-ident aliases (in-place rebuild); other
        # live roots stay resident, and up to TWO versions of this root
        # coexist — time-travel AS-OF enrich pins an immutable older
        # snapshot alongside HEAD, and alternating head/pin reads must
        # not unpersist each other's cached projection
        for stale in [
            k
            for k in _DOCMETA_CACHE
            if k != key
            and (
                not k[0].startswith(f"{app}|")
                or (k[0] == key[0] and k[1] == key[1] and k[2] != key[2])
            )
        ]:
            try:
                _DOCMETA_CACHE.pop(stale).unpersist()
            except Exception:
                pass
        # read the SAME version the key was computed from — a commit
        # racing between latest() and read() would otherwise cache the
        # newer snapshot's rows under the older version's key (and an
        # AS-OF view pinned at that version would then serve them)
        base = (
            index.docstats.read(spark, version=snap.version)
            if snap is not None
            else None
        )
        if base is None:
            raise RuntimeError(
                f"docstats snapshot absent under {index.root!r} — build the "
                "index (build_index / finalize_stats) before querying"
            )
        df = base.select("doc_id", "repo", "path", "lang").cache()
        _DOCMETA_CACHE[key] = df
        same_root = sorted(
            [k for k in _DOCMETA_CACHE if k[0] == key[0]], key=lambda k: k[1]
        )
        for k in same_root[:-2]:
            try:
                _DOCMETA_CACHE.pop(k).unpersist()
            except Exception:
                pass
    return df


def derive_ids(docs: DataFrame) -> DataFrame:
    """documents -> + doc_id, content_sha256 (cheap JVM columns only —
    computed BEFORE any shard filter so shard pruning costs nothing).

    A pre-existing ``doc_id`` column is preserved — external corpora with
    their own stable ids (e.g. the driver fixture tables) index under
    those ids, so query results join back without an id-mapping table."""
    if "doc_id" not in docs.columns:
        docs = docs.withColumn(
            "doc_id", doc_id_col(F.col("repo"), F.col("path"), F.col("commit"))
        )
    return docs.withColumn("content_sha256", content_sha256(F.col("content")))


_BLOCK_COLS = [
    "term_id",
    "salt",
    "n_salts",
    "block_id",
    "n_docs",
    "sum_tf",
    "min_doc_id",
    "max_doc_id",
    "max_tf",
    "min_doclen",
    "doc_ids_enc",
    "tfs_enc",
    "doclens_enc",
    "positions_enc",
]


def _encode_sorted_postings(
    term_ids: np.ndarray,
    salts: np.ndarray,
    n_salts_arr: np.ndarray,
    doc_ids: np.ndarray,
    doclens: np.ndarray,
    tfs: np.ndarray,
    pos_values: np.ndarray,
    pos_offsets: np.ndarray,
    block_size: int,
    shards: np.ndarray | None = None,
) -> pa.RecordBatch:
    """Encode posting rows sorted by (term_id, salt, doc_id) into termlist
    blocks — ONE numpy pass, primitives + pre-encoded position bytes.

    Positions arrive already delta+varint encoded per doc (tokenizer
    kernel), and the wire format is per-doc self-contained, so a block's
    positions stream is a pure byte-range concat: zero-copy via the input
    binary column's values buffer + offset vector.  Doc-id deltas reset to
    absolute at each block boundary; all varint streams are encoded
    globally with per-value lengths and sliced via offset vectors — no
    per-block python beyond assembling the Arrow arrays.
    """
    nd = len(term_ids)

    # ---- block boundaries: new (term,salt) group, or block_size docs ----
    # (multi-shard mode additionally breaks at shard changes so a block
    # never spans doc-partitions — the WAND kernel's per-shard scatter
    # depends on blocks being shard-pure)
    change = np.empty(nd, dtype=bool)
    change[0] = True
    np.not_equal(term_ids[1:], term_ids[:-1], out=change[1:])
    change[1:] |= salts[1:] != salts[:-1]
    if shards is not None:
        change[1:] |= shards[1:] != shards[:-1]
    group_starts = np.flatnonzero(change)
    group_sizes = np.diff(np.append(group_starts, nd))
    within = np.arange(nd) - np.repeat(group_starts, group_sizes)
    block_mask = change | (within % block_size == 0)
    bstarts = np.flatnonzero(block_mask)
    bends = np.append(bstarts[1:], nd)
    block_id = (within[bstarts] // block_size).astype(np.int64)

    # ---- doc ids: shifted-uint64 deltas, reset to absolute per block ----
    u = doc_ids.astype(np.uint64) + np.uint64(1 << 63)
    # sorted-run invariant: within a (term, salt[, shard]) group doc ids
    # must be STRICTLY ascending.  A duplicate (term, doc) — e.g.
    # extra_postings colliding with a term the doc's own content produced
    # — would double-count df and break per-doc probes; fail the build
    # loudly instead of writing a corrupt block.
    if nd > 1:
        dup = (~change[1:]) & (u[1:] == u[:-1])
        if dup.any():
            i = int(np.flatnonzero(dup)[0]) + 1
            raise ValueError(
                "duplicate (term_id, doc_id) posting in encode input: "
                f"term_id={int(term_ids[i])} doc_id={int(doc_ids[i])} — "
                "injected extra_postings must use terms the document's "
                "own content never produces (prefix them, e.g. 'anchor:')"
            )
    ddelta = np.empty(nd, dtype=np.uint64)
    ddelta[0] = u[0]
    np.subtract(u[1:], u[:-1], out=ddelta[1:])
    ddelta[bstarts] = u[bstarts]
    doc_bytes, doc_nb = codec.encode_varint_with_lengths(ddelta)
    doc_off = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(doc_nb, out=doc_off[1:])

    tf_bytes, tf_nb = codec.encode_varint_with_lengths(tfs.astype(np.uint64))
    tf_off = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(tf_nb, out=tf_off[1:])

    dl_bytes, dl_nb = codec.encode_varint_with_lengths(doclens.astype(np.uint64))
    dl_off = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(dl_nb, out=dl_off[1:])

    # ---- per-block metadata + WAND bounds (§4.1 getMaxPossibleScore):
    # impact(tf,dl) is monotone up in tf / down in dl, so the query-time
    # bound idf*impact(max_tf, min_doclen) dominates every doc in a block.
    max_tf = np.maximum.reduceat(tfs, bstarts)
    min_dl = np.minimum.reduceat(doclens, bstarts)
    sum_tf = np.add.reduceat(tfs, bstarts).astype(np.int64)  # -> cf (A2)
    n_docs = (bends - bstarts).astype(np.int64)

    def bin_col(stream: np.ndarray, value_off: np.ndarray) -> pa.Array:
        # pa.binary() carries int32 offsets: a >2 GiB encoded stream in one
        # Arrow batch would wrap silently on the cast below.  Batches are
        # sized well under this (maxRecordsPerBatch), so fail loudly rather
        # than corrupt blocks if a pathological carry-run ever exceeds it.
        assert stream.nbytes < 2**31, (
            f"encoded stream {stream.nbytes}B overflows int32 Arrow offsets; "
            "lower spark.sql.execution.arrow.maxRecordsPerBatch"
        )
        offs = np.empty(len(bstarts) + 1, dtype=np.int32)
        offs[:-1] = value_off[bstarts]
        offs[-1] = value_off[bends[-1]] if len(bends) else 0
        return pa.BinaryArray.from_buffers(
            pa.binary(),
            len(bstarts),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(stream.tobytes())],
        )

    arrays = [
        pa.array(term_ids[bstarts]),
        pa.array(salts[bstarts].astype(np.int32)),
        pa.array(n_salts_arr[bstarts].astype(np.int32)),
        pa.array(block_id.astype(np.int32)),
        pa.array(n_docs.astype(np.int32)),
        pa.array(sum_tf),
        pa.array(doc_ids[bstarts]),
        pa.array(doc_ids[bends - 1]),
        pa.array(max_tf.astype(np.int32)),
        pa.array(min_dl.astype(np.int32)),
        bin_col(doc_bytes, doc_off),
        bin_col(tf_bytes, tf_off),
        bin_col(dl_bytes, dl_off),
        bin_col(pos_values, pos_offsets),
    ]
    names = list(_BLOCK_COLS)
    if shards is not None:
        arrays.append(pa.array(shards[bstarts].astype(np.int32)))
        names.append("shard")
    return pa.RecordBatch.from_arrays(arrays, names=names)


def encode_blocks(
    postings: DataFrame,
    salt_target: int = 50_000,
    block_size: int = 4096,
    sharded: bool = False,
) -> DataFrame:
    """Salted repartition + sorted varint-block encode (S4/T5/X10).

    Input: posting rows (term_id, doc_id, doclen, tf, pos_enc) — fixed
    width primitives + one small binary column.  Physical shape: ONE
    shuffle keyed by (term_id, salt) with a partition-local sort, then a
    streaming Arrow encode.  A straddle buffer carries the trailing
    (term_id, salt) run across Arrow batches so batch boundaries never
    split a termlist — the RdbDump 'write one sorted run' loop, vectorized.

    Salting: a term whose df exceeds ``salt_target`` splits into
    ceil(df/salt_target) doc-hash sub-lists, so the zipf head cannot pin a
    single task (north-rule explicit skew handling).  The stats join rides
    the same hash key as the repartition.

    ``sharded=True``: input additionally carries a ``shard`` column (the
    doc-partition id, pmod(doc_id, n_shards)) and blocks come out
    shard-pure with the shard in the output schema — the multi-shard
    compaction path encodes every doc-partition's sorted run in the SAME
    single shuffle (RdbBase keeps per-host file sets; one merge rewrites
    them all).  Salting then uses shard-local df, matching what a per-shard
    build would have produced.
    """
    n_row = 7 if sharded else 6  # leading fixed-width row arrays per batch
    shard_key = ["shard"] if sharded else []
    # only the zipf head needs salting: aggregate df per term, keep just
    # the heavy terms (df > salt_target) and broadcast THAT — a few
    # hundred rows — instead of joining the full per-term stats (a ~1M-row
    # broadcast serialized on the driver cost ~10 s flat regardless of
    # cluster size).  Light terms default to n_salts = 1.
    heavy = (
        postings.groupBy(*shard_key, "term_id")
        .agg(F.count("*").alias("df_local"))
        .filter(F.col("df_local") > salt_target)
    )
    salted = (
        postings.join(F.broadcast(heavy), shard_key + ["term_id"], "left")
        .withColumn(
            "n_salts",
            F.coalesce(
                F.ceil(F.col("df_local") / F.lit(salt_target)), F.lit(1)
            ).cast("int"),
        )
        .withColumn("salt", F.pmod(F.col("doc_id"), F.col("n_salts")).cast("int"))
        .select(
            *shard_key,
            "term_id", "salt", "n_salts", "doc_id", "doclen", "tf", "pos_enc",
        )
    )
    part = salted.repartition(*shard_key, "term_id", "salt").sortWithinPartitions(
        *shard_key, "term_id", "salt", "doc_id"
    )

    def _extract(batch: pa.RecordBatch):
        cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
        pe = cols["pos_enc"]
        # binary column -> (values uint8, per-row byte offsets len n+1);
        # offsets may not start at 0 for sliced arrays — rebase
        offs = np.frombuffer(pe.buffers()[1], dtype=np.int32, count=len(pe) + 1 + pe.offset)[
            pe.offset :
        ].astype(np.int64)
        data = np.frombuffer(pe.buffers()[2], dtype=np.uint8)
        values = data[offs[0] : offs[-1]].copy()
        offs = offs - offs[0]
        rows = (
            cols["term_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            cols["salt"].to_numpy(zero_copy_only=False).astype(np.int64),
            cols["n_salts"].to_numpy(zero_copy_only=False).astype(np.int64),
            cols["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            cols["doclen"].to_numpy(zero_copy_only=False).astype(np.int64),
            cols["tf"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        if sharded:
            rows += (cols["shard"].to_numpy(zero_copy_only=False).astype(np.int64),)
        return rows + (values, offs)

    def _concat(a, b):
        # first n_row are row arrays; then the byte stream; then offsets
        rows = tuple(np.concatenate([x, y]) for x, y in zip(a[:n_row], b[:n_row]))
        values = np.concatenate([a[n_row], b[n_row]])
        offs = np.concatenate([a[n_row + 1][:-1], b[n_row + 1] + a[n_row + 1][-1]])
        return rows + (values, offs)

    def _slice(arrs, lo, hi):
        blo, bhi = arrs[n_row + 1][lo], arrs[n_row + 1][hi]
        return tuple(x[lo:hi] for x in arrs[:n_row]) + (
            arrs[n_row][blo:bhi],
            arrs[n_row + 1][lo : hi + 1] - blo,
        )

    def _encode(arrs) -> pa.RecordBatch:
        return _encode_sorted_postings(
            *arrs[:6],
            arrs[n_row],
            arrs[n_row + 1],
            block_size,
            shards=arrs[6] if sharded else None,
        )

    def encode_stream(batches):
        carry = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            arrs = _extract(batch)
            if carry is not None:
                arrs = _concat(carry, arrs)
                carry = None
            term_ids, salts = arrs[0], arrs[1]
            n = len(term_ids)
            # hold back the trailing (shard,term_id,salt) run — it may
            # continue in the next Arrow batch (runs are contiguous in
            # sorted input)
            same = (term_ids == term_ids[-1]) & (salts == salts[-1])
            if sharded:
                same &= arrs[6] == arrs[6][-1]
            n_tail = int(same[::-1].cumprod().sum())
            if n_tail == n:
                carry = arrs
                continue
            split = n - n_tail
            head = _slice(arrs, 0, split)
            carry = _slice(arrs, split, n)
            yield _encode(head)
        if carry is not None and len(carry[0]):
            yield _encode(carry)

    schema = BLOCK_SCHEMA + (", shard int" if sharded else "")
    return part.mapInArrow(encode_stream, schema)


def numeric_postings(d: DataFrame, numeric_fields) -> DataFrame | None:
    """F7/T4 numeric field terms (posdb packs sortby/facet values into key
    bits — Posdb.h getFloat/getInt, SURVEY §2.2): one posting per doc under
    term ``num:<field>`` whose tf slot carries the non-negative int32 field
    value and whose position stream is empty.  Block metadata ``max_tf``
    then bounds the value per block, so ``gbminint``-style range predicates
    and descending top-k prune whole blocks without decoding.  These are
    lookup termlists, not scoring lists: doclen is 0, positions are absent,
    and search paths never decode positions for them.  Null or negative
    values are dropped (no posting for that doc)."""
    out = None
    for fld in numeric_fields:
        p = d.select(
            F.lit(term_hash_py(f"num:{fld}")).cast("long").alias("term_id"),
            "doc_id",
            F.lit(0).cast("int").alias("doclen"),
            F.col(fld).cast("int").alias("tf"),
            F.lit(b"").alias("pos_enc"),
            F.lit(f"num:{fld}").alias("term"),
        ).filter(F.col("tf").isNotNull() & (F.col("tf") >= 0))
        out = p if out is None else out.unionByName(p)
    return out


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_root: str,
    run_id: str | None = None,
    n_shards: int = 4,
    code_aware: bool = True,
    field_terms: bool = True,
    bigram_terms: bool = False,
    numeric_fields: tuple = (),
    salt_target: int = 50_000,
    block_size: int = 4096,
    resume: bool = True,
    fail_after_shard: int | None = None,
    shard_parallelism: int = 2,
    extra_postings: DataFrame | None = None,
    extra_label: str = "",
) -> Index:
    """Full resumable build.

    ``extra_postings`` injects externally-derived posting rows (schema
    ``term_id long, doc_id long, doclen int, tf int, pos_enc binary,
    term string``) into the build — the Msg4-injected-termlist analog:
    Gigablast's link-text indexer hashes INBOUND anchor words into the
    target doc's posdb lists (XmlDoc::hashLinkInfo), terms the doc's own
    content never produced.  Rows are routed to the target doc's shard
    (same ``pmod(doc_id, n_shards)`` as the corpus) so doc-disjoint WAND
    sharding still holds.  ``extra_label`` names the source in the index
    features for the resume-configuration guard.

    Shards are independent jobs; ``shard_parallelism`` > 1 submits them
    from concurrent driver threads so Spark interleaves their stages and
    fills scheduler gaps (snapshot commits are optimistic-retry safe).
    ``fail_after_shard`` injects a crash after that shard commits
    (checkpoint/resume test hook, FIXTURES.md §7) and forces sequential
    execution for determinism.
    """
    idx = Index(index_root)
    run_id = run_id or uuid.uuid4().hex[:12]
    if extra_postings is not None and not extra_label:
        raise ValueError(
            "extra_postings requires a non-empty extra_label: the label is "
            "what lets a resume verify the same injected posting source "
            "(an empty label makes that guard vacuous)"
        )
    done = _completed_shards(spark, idx)

    # Guard against appending a second full build into a non-empty root:
    # re-used shard ids would mix blocks with different per-(shard,term)
    # salt moduli and silently mis-route WAND candidate probes.  Legal
    # paths into an existing root are (a) resume of THIS sharding (some
    # checkpoints with matching n_shards exist) and (b) incremental
    # add_documents, which allocates fresh shard ids.
    existing = idx.postings.latest()
    if existing is not None and existing.segments:
        if not resume:
            raise ValueError(
                f"index root {index_root} already has postings; "
                "build with resume=True to finish an interrupted run, use "
                "streaming.incremental.add_documents to append, or start a "
                "fresh root"
            )
        if not any(ns == n_shards for _s, ns in done):
            # no checkpoint landed — resumable iff every tagged commit in
            # the postings history belongs to THIS sharding (the crash
            # window before the FIRST checkpoint); the orphan cleanup
            # below then removes the half-done commits before re-running
            metas = [
                (idx.postings.at(v).meta or {})
                for v in idx.postings.history()
            ]
            # only build_shard commits carry a "shard" key; compaction
            # also writes "n_shards" (its doc-partition width), and
            # accepting it here would let a fresh build reuse shard ids
            # the compacted segment already occupies (colliding salt
            # moduli -> mis-routed WAND probes)
            ours = [m for m in metas if "shard" in m and "n_shards" in m]
            other = [
                m for m in metas if "shard" not in m and "cleanup_shard" not in m
            ]
            if not (
                ours
                and not other
                and all(m.get("n_shards") == n_shards for m in ours)
            ):
                raise ValueError(
                    f"index root {index_root} has postings from a different "
                    f"build configuration (no completed shards for n_shards="
                    f"{n_shards}); start a fresh root"
                )
        if idx.features().get("bigrams", False) != bigram_terms:
            raise ValueError(
                f"index root {index_root} was built with bigram_terms="
                f"{idx.features().get('bigrams', False)}; a resume must "
                "use the same setting (mixed segments would make phrase "
                "pair-termlist lookups incomplete)"
            )
        if list(idx.features().get("numeric_fields", [])) != sorted(numeric_fields):
            raise ValueError(
                f"index root {index_root} was built with numeric_fields="
                f"{idx.features().get('numeric_fields', [])}; a resume must "
                "use the same setting (mixed segments would make num: "
                "termlists incomplete)"
            )
        if idx.features().get("extra_postings", "") != (
            extra_label if extra_postings is not None else ""
        ):
            raise ValueError(
                f"index root {index_root} was built with extra_postings="
                f"{idx.features().get('extra_postings', '')!r}; a resume "
                "must supply the same posting source (mixed segments would "
                "make the injected termlists incomplete)"
            )
    else:
        idx.write_features(
            bigrams=bigram_terms,
            numeric_fields=sorted(numeric_fields),
            code_aware=code_aware,
            n_shards=n_shards,
            extra_postings=extra_label if extra_postings is not None else "",
        )

    # a small source parquet may expose fewer splits than cores, capping
    # the tokenizer stage's parallelism — round-robin repartition so every
    # core gets work regardless of the input's file layout
    target_parts = max(2 * spark.sparkContext.defaultParallelism, 16)
    if docs.rdd.getNumPartitions() < target_parts:
        docs = docs.repartition(target_parts)
    ids = derive_ids(docs).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
    )

    def build_shard(shard: int) -> None:
        t0 = time.time()
        # shard filter BEFORE the tokenizer kernel — each shard job
        # tokenizes only its 1/n_shards of the corpus.  The kernel emits
        # posting primitives directly (term hashed in-kernel; positions
        # pre-encoded; term string non-null only on first occurrence per
        # partition), so no array column ever crosses Arrow.  Persist =
        # the RdbTree memtable analog, one shard's worth, spills to disk.
        d = ids.filter(F.col("shard") == shard)
        posts = tokenize_to_postings(
            d,
            code_aware=code_aware,
            field_terms=field_terms,
            bigram_terms=bigram_terms,
        )
        if numeric_fields:
            num = numeric_postings(d, numeric_fields)
            if num is not None:
                posts = posts.unionByName(num)
        if extra_postings is not None:
            posts = posts.unionByName(
                extra_postings.filter(
                    F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
                    == F.lit(shard)
                ).select("term_id", "doc_id", "doclen", "tf", "pos_enc", "term")
            )
        posts = posts.persist(StorageLevel.MEMORY_AND_DISK)
        dict_df = (
            posts.filter(F.col("term").isNotNull())
            .select("term_id", "term")
            .distinct()
        )
        td_seg = idx.termdict.write_segment(dict_df.coalesce(4), label=f"shard{shard}")
        # groupBy-max, not distinct: numeric lookup postings carry doclen 0
        # alongside the doc's real doclen, and distinct would emit both rows
        # (duplicating the doc in docstats)
        doclens = posts.groupBy("doc_id").agg(F.max("doclen").alias("doclen"))
        # LEFT join: a doc producing zero postings (empty content with
        # field_terms=False) must still exist in docstats — dropping it
        # would skew n_docs/avgdl vs the true corpus and lose its
        # content_sha256 row (the north-rule per-row invariant)
        docstats = (
            d.select(
                "doc_id", "repo", "path", "commit", "lang", "content_sha256"
            )
            .join(doclens, "doc_id", "left")
            .withColumn("doclen", F.coalesce(F.col("doclen"), F.lit(0)).cast("int"))
        )
        ds_seg = idx.docstats.write_segment(docstats, label=f"shard{shard}")
        # persist encoded blocks: repartitionByRange's boundary-sampling
        # pass would otherwise run the whole encode twice
        blocks = encode_blocks(
            posts.select("term_id", "doc_id", "doclen", "tf", "pos_enc"),
            salt_target=salt_target,
            block_size=block_size,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # range-partition + sort by term_id so query-time term lookups prune
        # to a handful of row groups (RdbMap sparse-index seek analog, S2).
        # The shard column marks the doc-partition each block belongs to —
        # WAND runs one task per shard over doc-disjoint lists (Msg39).
        blocks_sorted = (
            blocks.withColumn("shard", F.lit(shard))
            .repartitionByRange("term_id")
            .sortWithinPartitions("term_id", "salt", "block_id")
        )
        # NOTE (r5 encode profile, tools/profile_encode.py): raising
        # spark.sql.execution.arrow.maxRecordsPerBatch to 64k for this
        # materialization measured ~8% on the 8-core encode stage (the
        # stage is shuffle+Arrow-transfer bound; kernel compute is fully
        # overlapped).  It is NOT applied: the conf is session-global,
        # and a concurrent block-READING kernel in another driver thread
        # (compaction decode, federated maintenance) would receive 64k
        # batches of KB-sized block rows — hundreds of MB per Arrow
        # transfer.  A per-plan batch-size knob would make this safe;
        # Spark has none today.
        po_seg = idx.postings.write_segment(
            blocks_sorted, label=f"shard{shard}", bloom_col="term_id"
        )
        ts_partial = blocks.groupBy("term_id").agg(
            F.sum("n_docs").alias("df"),
            F.sum("sum_tf").alias("cf"),
            F.count("*").alias("n_blocks"),
        )
        tsp_seg = idx.termstats_partial.write_segment(
            ts_partial.coalesce(4), label=f"shard{shard}"
        )
        blocks.unpersist()
        posts.unpersist()
        # meta carries (shard, n_shards) so a crash BETWEEN these commits
        # and the checkpoint leaves identifiable orphans: resume removes
        # them before re-running the shard (see _drop_orphan_shard_commits)
        tag = {"shard": shard, "n_shards": n_shards, "run_id": run_id}
        snaps = {
            "docstats": idx.docstats.commit(add=[ds_seg], meta=tag),
            "termdict": idx.termdict.commit(add=[td_seg], meta=tag),
            "postings": idx.postings.commit(add=[po_seg], meta=tag),
            "termstats_partial": idx.termstats_partial.commit(
                add=[tsp_seg], meta=tag
            ),
        }
        _checkpoint(
            spark, idx, run_id, shard, n_shards, time.time() - t0, snaps
        )

    todo = [s for s in range(n_shards) if not (resume and (s, n_shards) in done)]
    if resume and existing is not None and existing.segments:
        # Crash-window repair: a shard whose table commits landed but whose
        # checkpoint didn't would re-run and APPEND duplicate segments
        # (doubled postings/df/cf).  Remove any live segments tagged with
        # this (shard, n_shards) before re-running the shard.
        for shard in todo:
            _drop_orphan_shard_commits(idx, shard, n_shards)
    if fail_after_shard is not None or shard_parallelism <= 1 or len(todo) <= 1:
        for shard in todo:
            build_shard(shard)
            if fail_after_shard is not None and shard == fail_after_shard:
                raise RuntimeError(f"injected failure after shard {shard}")
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=shard_parallelism) as ex:
            list(ex.map(build_shard, todo))

    finalize_stats(spark, idx, run_id)
    return idx


def finalize_stats(spark: SparkSession, idx: Index, run_id: str) -> None:
    """Global termstats/collstats from per-shard partials (A2/A3/A5)."""
    partials = idx.termstats_partial.read(spark)
    tdict = idx.termdict.read(spark).select("term_id", "term").distinct()
    termstats = (
        partials.groupBy("term_id")
        .agg(
            F.sum("df").alias("df"),
            F.sum("cf").alias("cf"),
            F.sum("n_blocks").alias("n_blocks"),
        )
        .join(tdict, "term_id")
    )
    # small stat tables coalesce to few files: cold-query latency is
    # dominated by per-file open cost on this VM
    ts_seg = idx.termstats.write_segment(termstats.coalesce(4), label="final")
    # replace any previous final snapshot
    prev = idx.termstats.latest()
    idx.termstats.commit(
        add=[ts_seg],
        remove=(prev.segments if prev else []),
        operation="replace",
        meta={"run_id": run_id},
    )
    docstats = idx.docstats.read(spark)
    coll = docstats.agg(
        F.count("*").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
    cs_seg = idx.collstats.write_segment(coll.coalesce(1), label="final")
    prev = idx.collstats.latest()
    idx.collstats.commit(
        add=[cs_seg], remove=(prev.segments if prev else []), operation="replace"
    )


def _write_tiny_segment(table, pdf: pd.DataFrame, label: str) -> str:
    """Driver-side parquet write for operational rows (checkpoints,
    metrics, lineage): a handful of rows the driver already holds — a
    Spark job per write cost seconds of pure scheduling overhead."""
    import pyarrow.parquet as pq

    path = table.new_segment_path(label)
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(pdf),
        os.path.join(path, "part-0.parquet"),
        # Spark cannot read TIMESTAMP(NANOS) parquet
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    return path


def _drop_orphan_shard_commits(idx: Index, shard: int, n_shards: int) -> None:
    """Remove live segments committed by an interrupted run of ``shard``
    (commits tagged (shard, n_shards) whose checkpoint never landed) from
    every per-shard table — the shard build becomes idempotent under
    resume.  Driver-side JSON walks only; no Spark job."""
    for tname in ("postings", "docstats", "termdict", "termstats_partial"):
        t = getattr(idx, tname)
        latest = t.latest()
        if latest is None:
            continue
        live = set(latest.segments)
        orphans: list[str] = []
        prev: set[str] = set()
        first = True
        for v in t.history():
            snap = t.at(v)
            cur = set(snap.segments)
            m = snap.meta or {}
            if first and v != 0:
                # expire_snapshots removed earlier manifests: cur - prev
                # would attribute EVERY surviving segment (other shards'
                # included) to this commit — only later diffs are
                # trustworthy, so the earliest survivor is baseline only
                prev = cur
                first = False
                continue
            first = False
            if m.get("shard") == shard and m.get("n_shards") == n_shards:
                orphans.extend(cur - prev)
            prev = cur
        orphans = [s for s in orphans if s in live]
        if orphans:
            t.commit(
                remove=orphans,
                operation="orphan-cleanup",
                meta={"cleanup_shard": shard},
            )


def _completed_shards(spark: SparkSession, idx: Index) -> set[tuple[int, int]]:
    df = idx.checkpoints.read(spark)
    if df is None:
        return set()
    rows = df.filter(F.col("status") == "done").select("partition_id", "rows_out").collect()
    return {(r["partition_id"], int(r["rows_out"])) for r in rows}


def _checkpoint(
    spark: SparkSession,
    idx: Index,
    run_id: str,
    shard: int,
    n_shards: int,
    secs: float,
    snaps: dict | None = None,
) -> None:
    # rows_out carries n_shards so a resume with a different shard count
    # never wrongly skips (lineage of the partitioning itself).
    now = pd.Timestamp.utcnow().tz_localize(None)
    ck = pd.DataFrame(
        {
            "run_id": [run_id],
            "stage": ["build_shard"],
            "partition_id": np.array([shard], dtype=np.int32),
            "status": ["done"],
            "rows_out": np.array([n_shards], dtype=np.int64),
            "ts": [now],
        }
    )
    seg = _write_tiny_segment(idx.checkpoints, ck, f"ck{shard}")
    idx.checkpoints.commit(add=[seg], meta={"run_id": run_id})
    mt = pd.DataFrame(
        {
            "run_id": [run_id] * 2,
            "stage": ["build_shard"] * 2,
            "metric": ["wall_secs", "shard"],
            "value": [float(secs), float(shard)],
            "ts": [now] * 2,
        }
    )
    mseg = _write_tiny_segment(idx.metrics, mt, f"m{shard}")
    idx.metrics.commit(add=[mseg])
    # lineage: which snapshot of each output table this shard's commit
    # produced, from which logical input (north rule: per-partition
    # lineage; Repair.cpp's rebuild bookkeeping analog)
    rows = []
    for tname in ("postings", "docstats", "termdict", "termstats_partial"):
        # the snapshot THIS shard's commit produced — under parallel
        # shards, latest() may already be a sibling's later commit
        snap = (snaps or {}).get(tname) or getattr(idx, tname).latest()
        rows.append(
            {
                "run_id": run_id,
                "output_table": tname,
                "input_table": "documents",
                "input_snapshot": f"shard={shard}/{n_shards}",
                "transform": "build_shard",
                "ts": now,
            }
        )
        rows[-1]["output_snapshot"] = str(snap.version if snap else -1)
    ln = pd.DataFrame(rows)
    lseg = _write_tiny_segment(idx.lineage, ln, f"l{shard}")
    idx.lineage.commit(add=[lseg], meta={"run_id": run_id, "shard": shard})


def decode_blocks(blocks: DataFrame, with_positions: bool = False) -> DataFrame:
    """Stored blocks -> (term_id, doc_id, tf, doclen[, positions]) rows via
    an Arrow-batched mapInPandas decode (the Msg5 'list -> records' read)."""
    cols = ["term_id", "n_docs", "doc_ids_enc", "tfs_enc", "doclens_enc"]
    if with_positions:
        cols.append("positions_enc")
    schema = "term_id long, doc_id long, tf int, doclen int"
    if with_positions:
        schema += ", positions array<int>"

    def decode(batches):
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                doc_ids, tfs, pos, bounds = codec.decode_postings_block(
                    row.doc_ids_enc,
                    row.tfs_enc,
                    row.positions_enc if with_positions else b"",
                    int(row.n_docs),
                )
                doclens = codec.decode_varint(row.doclens_enc, int(row.n_docs))
                d = {
                    "term_id": np.full(len(doc_ids), row.term_id, dtype=np.int64),
                    "doc_id": doc_ids,
                    "tf": tfs.astype(np.int32),
                    "doclen": doclens.astype(np.int32),
                }
                if with_positions:
                    ends = np.empty(len(doc_ids), dtype=np.int64)
                    if len(doc_ids):
                        ends[:-1] = bounds[1:]
                        ends[-1] = len(pos)
                    d["positions"] = [
                        pos[s:e].astype(np.int32) for s, e in zip(bounds, ends)
                    ]
                outs.append(pd.DataFrame(d))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return blocks.select(*cols).mapInPandas(decode, schema)
