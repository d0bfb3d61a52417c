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
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from ..functions.hashing import content_sha256, doc_id_col
from ..functions.tokenize import tokenize_code, tokenize_simple
from ..sources.tables import SnapshotTable

K1 = 1.2
B = 0.75

BLOCK_SCHEMA = (
    "term string, salt int, block_id int, n_docs int, min_doc_id long, max_doc_id long, "
    "max_tf int, min_doclen int, doc_ids_enc binary, tfs_enc binary, "
    "doclens_enc binary, positions_enc binary"
)


@dataclass
class Index:
    root: str

    @property
    def postings(self) -> SnapshotTable:
        return SnapshotTable(self.root, "postings")

    @property
    def docstats(self) -> SnapshotTable:
        return SnapshotTable(self.root, "docstats")

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


def derive_docs(docs: DataFrame, code_aware: bool = True) -> DataFrame:
    """documents -> + doc_id, content_sha256, tokens, doclen."""
    tok = tokenize_code if code_aware else tokenize_simple
    return (
        docs.withColumn("doc_id", doc_id_col(F.col("repo"), F.col("path"), F.col("commit")))
        .withColumn("content_sha256", content_sha256(F.col("content")))
        .withColumn("tokens", tok(F.col("content")))
        .withColumn("doclen", F.size("tokens"))
    )


def posting_rows(derived: DataFrame, field_terms: bool = True) -> DataFrame:
    """(term, doc_id, doclen, tf, positions) — occurrence grain folded to
    (term,doc) grain (A1).  Field terms (F4) are presence-only postings."""
    occ = derived.select(
        "doc_id",
        "doclen",
        F.posexplode("tokens").alias("pos", "term"),
    )
    rows = occ.groupBy("term", "doc_id", "doclen").agg(
        F.count("*").cast("int").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    if field_terms:
        fielded = derived.select(
            F.explode(
                F.array_distinct(
                    F.concat(
                        F.array(
                            F.concat(F.lit("lang:"), F.lower("lang")),
                            F.concat(F.lit("repo:"), F.lower("repo")),
                        ),
                        F.transform(
                            F.regexp_extract_all(F.lower("path"), F.lit("[a-z0-9_]+"), F.lit(0)),
                            lambda t: F.concat(F.lit("path:"), t),
                        ),
                    )
                )
            ).alias("term"),
            "doc_id",
            "doclen",
        ).select(
            "term",
            "doc_id",
            "doclen",
            F.lit(1).cast("int").alias("tf"),
            F.array().cast("array<int>").alias("positions"),
        )
        rows = rows.unionByName(fielded)
    return rows


_BLOCK_COLS = [
    "term",
    "salt",
    "block_id",
    "n_docs",
    "min_doc_id",
    "max_doc_id",
    "max_tf",
    "min_doclen",
    "doc_ids_enc",
    "tfs_enc",
    "doclens_enc",
    "positions_enc",
]


def _encode_sorted_pdf(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """Encode a pandas frame already sorted by (term, salt, doc_id) into
    block rows.  Group boundaries found vectorized; per-termlist work is
    numpy slicing + the varint codec — no pandas groupby machinery (that
    cost ~15ms/group × millions of terms at scale)."""
    n = len(pdf)
    terms = pdf["term"].to_numpy()
    salts = pdf["salt"].to_numpy()
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    doclens = pdf["doclen"].to_numpy(dtype=np.int64)
    positions = pdf["positions"].to_numpy()
    pos_lens = np.fromiter((len(p) for p in positions), dtype=np.int64, count=n)
    # group starts where (term, salt) changes
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(terms[1:], terms[:-1], out=change[1:])
    change[1:] |= salts[1:] != salts[:-1]
    group_starts = np.flatnonzero(change)
    group_ends = np.empty_like(group_starts)
    group_ends[:-1] = group_starts[1:]
    group_ends[-1] = n
    out: list[tuple] = []
    for gs, ge in zip(group_starts.tolist(), group_ends.tolist()):
        term = terms[gs]
        salt = int(salts[gs])
        for bid, start in enumerate(range(gs, ge, block_size)):
            end = min(start + block_size, ge)
            d = doc_ids[start:end]
            t = tfs[start:end]
            dl = doclens[start:end]
            lens = pos_lens[start:end]
            if lens.any():
                pos_concat = np.concatenate(
                    [np.asarray(p, dtype=np.int64) for p in positions[start:end]]
                )
            else:
                pos_concat = np.empty(0, dtype=np.int64)
            bounds = np.zeros(end - start, dtype=np.int64)
            np.cumsum(lens[:-1], out=bounds[1:])
            d_enc, t_enc, p_enc = codec.encode_postings_block(d, t, pos_concat, bounds)
            dl_enc = codec.encode_varint(dl)
            # block-max WAND metadata (§4.1 getMaxPossibleScore analog):
            # impact(tf,dl) is monotone up in tf / down in dl, so the
            # query-time bound idf*impact(max_tf, min_doclen) dominates
            # every doc in the block.
            out.append(
                (
                    term,
                    salt,
                    bid,
                    end - start,
                    int(d[0]),
                    int(d[-1]),
                    int(t.max()),
                    int(dl.min()),
                    d_enc,
                    t_enc,
                    dl_enc,
                    p_enc,
                )
            )
    return pd.DataFrame(out, columns=_BLOCK_COLS)


def encode_blocks(
    rows: DataFrame,
    salt_target: int = 50_000,
    block_size: int = 4096,
) -> DataFrame:
    """Salted repartition + sorted varint-block encode (S4/T5/X10).

    Physical shape: ONE shuffle keyed by (term, salt) with a partition-local
    sort, then a streaming Arrow mapInPandas encode.  A straddle buffer
    carries the last (possibly incomplete) termlist across Arrow batches so
    batch boundaries never split a block — this is the RdbDump 'write one
    sorted run' loop, vectorized.

    Salting: a term whose df exceeds ``salt_target`` is split into
    ceil(df/salt_target) doc-hash sub-lists, so the zipf head cannot pin a
    single task (north-rule explicit skew handling).  The df join rides the
    same hash key as the repartition.
    """
    tdf = rows.groupBy("term").agg(F.count("*").alias("df_local"))
    salted = (
        rows.join(tdf, "term")
        .withColumn(
            "n_salts",
            F.greatest(F.ceil(F.col("df_local") / F.lit(salt_target)), F.lit(1)).cast("int"),
        )
        .withColumn("salt", F.pmod(F.col("doc_id"), F.col("n_salts")).cast("int"))
        .select("term", "salt", "doc_id", "tf", "doclen", "positions")
    )
    part = salted.repartition("term", "salt").sortWithinPartitions(
        "term", "salt", "doc_id"
    )

    def encode_stream(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # hold back the trailing (term, salt) group — it may continue
            # in the next Arrow batch
            last_term = pdf["term"].iloc[-1]
            last_salt = pdf["salt"].iloc[-1]
            tail_mask = (pdf["term"] == last_term) & (pdf["salt"] == last_salt)
            # tail is contiguous at the end for sorted input
            tail_start = len(pdf) - int(tail_mask.iloc[::-1].cumprod().sum())
            carry = pdf.iloc[tail_start:]
            head = pdf.iloc[:tail_start]
            if len(head):
                yield _encode_sorted_pdf(head, block_size)
        if carry is not None and len(carry):
            yield _encode_sorted_pdf(carry, block_size)

    blocks = part.mapInPandas(encode_stream, BLOCK_SCHEMA)
    return blocks.withColumn("term_id", F.xxhash64("term"))


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_root: str,
    run_id: str | None = None,
    n_shards: int = 4,
    code_aware: bool = True,
    field_terms: bool = True,
    salt_target: int = 50_000,
    block_size: int = 4096,
    resume: bool = True,
    fail_after_shard: int | None = None,
) -> Index:
    """Full resumable build.  ``fail_after_shard`` injects a crash after
    that shard commits (checkpoint/resume test hook, FIXTURES.md §7)."""
    idx = Index(index_root)
    run_id = run_id or uuid.uuid4().hex[:12]
    done = _completed_shards(spark, idx)

    derived = derive_docs(docs, code_aware=code_aware).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
    )

    for shard in range(n_shards):
        if resume and (shard, n_shards) in done:
            continue
        t0 = time.time()
        # persist the tokenized shard: it feeds docstats AND two posting
        # branches; recomputing the tokenizer 3x would dominate the build.
        # (The RdbTree memtable analog — one shard's worth, spills to disk.)
        d = derived.filter(F.col("shard") == shard).persist(StorageLevel.MEMORY_AND_DISK)
        docstats = d.select(
            "doc_id", "repo", "path", "commit", "lang", "content_sha256", "doclen"
        )
        ds_seg = idx.docstats.write_segment(docstats, label=f"shard{shard}")
        rows = posting_rows(d, field_terms=field_terms).persist(StorageLevel.MEMORY_AND_DISK)
        blocks = encode_blocks(rows, salt_target=salt_target, block_size=block_size)
        # range-partition + sort by term_id so query-time term lookups prune
        # to a handful of row groups (RdbMap sparse-index seek analog, S2)
        blocks_sorted = blocks.repartitionByRange("term_id").sortWithinPartitions(
            "term_id", "salt", "block_id"
        )
        po_seg = idx.postings.write_segment(blocks_sorted, label=f"shard{shard}")
        ts_partial = (
            spark.read.parquet(po_seg)
            .groupBy("term_id", "term")
            .agg(
                F.sum("n_docs").alias("df"),
                F.count("*").alias("n_blocks"),
            )
        )
        tsp_seg = idx.termstats_partial.write_segment(ts_partial, label=f"shard{shard}")
        rows.unpersist()
        d.unpersist()
        idx.docstats.commit(add=[ds_seg], meta={"shard": shard, "run_id": run_id})
        idx.postings.commit(add=[po_seg], meta={"shard": shard, "run_id": run_id})
        idx.termstats_partial.commit(add=[tsp_seg], meta={"shard": shard})
        _checkpoint(spark, idx, run_id, shard, n_shards, time.time() - t0)
        if fail_after_shard is not None and shard == fail_after_shard:
            raise RuntimeError(f"injected failure after shard {shard}")

    finalize_stats(spark, idx, run_id)
    return idx


def finalize_stats(spark: SparkSession, idx: Index, run_id: str) -> None:
    """Global termstats/collstats from per-shard partials (A2/A3/A5)."""
    partials = idx.termstats_partial.read(spark)
    termstats = partials.groupBy("term_id", "term").agg(
        F.sum("df").alias("df"), F.sum("n_blocks").alias("n_blocks")
    )
    ts_seg = idx.termstats.write_segment(termstats, label="final")
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
    cs_seg = idx.collstats.write_segment(coll, label="final")
    prev = idx.collstats.latest()
    idx.collstats.commit(
        add=[cs_seg], remove=(prev.segments if prev else []), operation="replace"
    )


def _completed_shards(spark: SparkSession, idx: Index) -> set[tuple[int, int]]:
    df = idx.checkpoints.read(spark)
    if df is None:
        return set()
    rows = df.filter(F.col("status") == "done").select("partition_id", "rows_out").collect()
    return {(r["partition_id"], int(r["rows_out"])) for r in rows}


def _checkpoint(
    spark: SparkSession, idx: Index, run_id: str, shard: int, n_shards: int, secs: float
) -> None:
    # rows_out carries n_shards so a resume with a different shard count
    # never wrongly skips (lineage of the partitioning itself).
    ck = spark.createDataFrame(
        [(run_id, "build_shard", shard, "done", n_shards)],
        "run_id string, stage string, partition_id int, status string, rows_out long",
    ).withColumn("ts", F.current_timestamp())
    seg = idx.checkpoints.write_segment(ck, label=f"ck{shard}")
    idx.checkpoints.commit(add=[seg], meta={"run_id": run_id})
    mt = spark.createDataFrame(
        [
            (run_id, "build_shard", "wall_secs", float(secs)),
            (run_id, "build_shard", "shard", float(shard)),
        ],
        "run_id string, stage string, metric string, value double",
    ).withColumn("ts", F.current_timestamp())
    mseg = idx.metrics.write_segment(mt, label=f"m{shard}")
    idx.metrics.commit(add=[mseg])


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
