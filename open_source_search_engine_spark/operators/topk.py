"""Block-max WAND top-k (SURVEY.md §4.1 / M5).

Reference analog: PosdbTable::intersectLists10_r drives the intersection
from the rarest termlist, rejects docs whose getMaxPossibleScore can't
beat the TopTree minimum, and keeps a bounded per-shard heap merged by
Msg3a.  The Spark rebuild expresses the same physical shape:

  pruned scan of postings blocks by term_id      (Catalyst pushdown)
  groupBy(shard).applyInArrow(wand_kernel)       (per-doc-shard DAAT task)
  orderBy(score desc, doc_id).limit(k)           (Msg3a k-way merge =
                                                  TakeOrderedAndProject)

Kernel strategy (conjunctive queries — the reference's default semantics):
- candidates can only come from the rarest term's blocks (AND), so those
  blocks are processed in DESCENDING upper-bound order; once the top-k
  heap holds k docs with min score θ, any remaining block with
  ub_rarest(b) + Σ_other global_max_ub < θ is skipped WITHOUT decoding —
  that is exactly the block-max WAND prune, sound for AND because a doc
  absent from the rarest list cannot match.
- membership/tf lookup of candidates in the other terms' lists is fully
  vectorized: candidates are routed to the right salt sub-list by
  pmod(doc_id, n_salts) (the salt function is deterministic, so the
  sub-list holding a doc is computable, not searched) and located with
  np.searchsorted galloping.

Per-block upper bound = idf * impact(max_tf, min_doclen): impact is
monotone increasing in tf and decreasing in doclen, so it dominates every
doc in the block (metadata written at build time, build.py).
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from .build import Index

K1 = 1.2
B = 0.75


def _impact(tf: np.ndarray | float, dl: np.ndarray | float, avgdl: float):
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _wand_kernel(
    blocks: pa.Table,
    qmeta: dict,
    k: int,
) -> pa.Table:
    """One doc-shard's DAAT intersection + block-max pruning."""
    idf = qmeta["idf"]  # positive term_id -> idf
    rarest = qmeta["rarest"]  # term_id with min df
    avgdl = qmeta["avgdl"]
    neg_ids = qmeta.get("neg_ids", [])
    dead = qmeta.get("dead", np.empty(0, dtype=np.int64))
    term_ids = blocks.column("term_id").to_numpy()
    salts = blocks.column("salt").to_numpy()
    n_salts_col = blocks.column("n_salts").to_numpy()
    n_docs_col = blocks.column("n_docs").to_numpy()
    max_tf = blocks.column("max_tf").to_numpy()
    min_dl = blocks.column("min_doclen").to_numpy()
    d_enc = blocks.column("doc_ids_enc")
    t_enc = blocks.column("tfs_enc")
    l_enc = blocks.column("doclens_enc")

    # global per-term upper bounds over this shard
    ub_block = np.array(
        [
            idf.get(t, 0.0) * _impact(float(mt), float(md), avgdl)
            for t, mt, md in zip(term_ids.tolist(), max_tf.tolist(), min_dl.tolist())
        ]
    )
    other_terms = [t for t in idf if t != rarest]
    lookup_terms = other_terms + [t for t in neg_ids]
    global_ub_other = 0.0
    for t in other_terms:
        sel = term_ids == t
        if not sel.any():  # term absent from this shard -> no AND match here
            return _empty_out()
        global_ub_other += float(ub_block[sel].max())

    # ---- decode the non-rarest lists up front, organized per (term,salt).
    # (Scale note: these decodes could also be lazied per overlapping
    # range; candidate-side pruning below is where WAND wins.)
    decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    # build-time salt modulus per term (stored in block metadata — the
    # modulus is shard-local and NOT inferable from observed salt values:
    # doc-sharding can restrict which residues appear in a shard)
    n_salts: dict[int, int] = {}
    for i in np.flatnonzero(np.isin(term_ids, np.array(lookup_terms or [0], dtype=np.int64))):
        key = (int(term_ids[i]), int(salts[i]))
        n_salts[int(term_ids[i])] = int(n_salts_col[i])
        d, t, _p, _b = codec.decode_postings_block(
            d_enc[i].as_py(), t_enc[i].as_py(), b"", int(n_docs_col[i])
        )
        if key in decoded:
            pd_, pt_ = decoded[key]
            decoded[key] = (np.concatenate([pd_, d]), np.concatenate([pt_, t]))
        else:
            decoded[key] = (d, t)
    # blocks arrive sorted by block_id per (term,salt) only if input was
    # ordered; re-sort each sub-list to be safe (cheap: already nearly so)
    for key, (d, t) in decoded.items():
        if len(d) > 1 and not np.all(d[1:] >= d[:-1]):
            o = np.argsort(d, kind="mergesort")
            decoded[key] = (d[o], t[o])

    # ---- rarest blocks in descending upper bound ----
    r_idx = np.flatnonzero(term_ids == rarest)
    order = r_idx[np.argsort(-ub_block[r_idx], kind="mergesort")]
    heap: list[tuple[float, int]] = []  # (score, -?) min-heap of top-k
    scored_blocks = 0
    skipped_blocks = 0
    results: dict[int, float] = {}

    for i in order.tolist():
        theta = heap[0][0] if len(heap) >= k else -math.inf
        # strict <: a block whose bound ties θ could still win on doc_id
        if ub_block[i] + global_ub_other < theta:
            skipped_blocks += 1
            continue  # no doc in this block can reach the top-k
        scored_blocks += 1
        cd, ct, _p, _bnd = codec.decode_postings_block(
            d_enc[i].as_py(), t_enc[i].as_py(), b"", int(n_docs_col[i])
        )
        cl = codec.decode_varint(l_enc[i].as_py(), int(n_docs_col[i]))
        score = idf[rarest] * _impact(ct.astype(np.float64), cl.astype(np.float64), avgdl)
        alive = np.ones(len(cd), dtype=bool)
        if len(dead):  # merge-on-read tombstones (U4)
            du = dead.astype(np.uint64) + np.uint64(1 << 63)
            cu = cd.astype(np.uint64) + np.uint64(1 << 63)
            pos_d = np.clip(np.searchsorted(du, cu), 0, len(dead) - 1)
            alive &= dead[pos_d] != cd

        def probe(t: int) -> tuple[np.ndarray, np.ndarray]:
            """(tf, present) of candidates cd in term t's salt sub-lists:
            the sub-list holding a doc is pmod(doc, n_salts) — computed,
            not searched — then located by galloping searchsorted."""
            ns = n_salts.get(t, 1)
            tf_t = np.zeros(len(cd), dtype=np.float64)
            present = np.zeros(len(cd), dtype=bool)
            salt_of = np.mod(cd, ns)  # numpy mod is non-negative for ns>0
            for s in range(ns):
                m = salt_of == s
                if not m.any():
                    continue
                arr = decoded.get((t, s))
                if arr is None:
                    continue
                d_arr, t_arr = arr
                pos = np.searchsorted(
                    d_arr.astype(np.uint64) + np.uint64(1 << 63),
                    cd[m].astype(np.uint64) + np.uint64(1 << 63),
                )
                pos_c = np.clip(pos, 0, len(d_arr) - 1)
                found = d_arr[pos_c] == cd[m]
                idxs = np.flatnonzero(m)[found]
                present[idxs] = True
                tf_t[idxs] = t_arr[pos_c[found]]
            return tf_t, present

        for t in other_terms:
            tf_t, present = probe(t)
            alive &= present
            if not alive.any():
                break
            score += idf[t] * np.where(
                alive, _impact(tf_t, cl.astype(np.float64), avgdl), 0.0
            )
        for t in neg_ids:  # F3: drop docs present in any negative list
            if alive.any():
                _tf, present = probe(t)
                alive &= ~present
        # push survivors into the heap; entry (score, -doc) makes heap[0]
        # the WORST by the canonical (score desc, doc asc) order
        for doc, sc in zip(cd[alive].tolist(), score[alive].tolist()):
            if len(heap) < k:
                heapq.heappush(heap, (sc, -doc))
                results[doc] = sc
            elif (sc, -doc) > heap[0]:
                old = heapq.heappushpop(heap, (sc, -doc))
                results.pop(-old[1], None)
                results[doc] = sc

    if not results:
        return _empty_out()
    docs = np.fromiter(results.keys(), dtype=np.int64, count=len(results))
    scores = np.fromiter(results.values(), dtype=np.float64, count=len(results))
    return pa.Table.from_arrays(
        [
            pa.array(docs),
            pa.array(scores),
            pa.array(np.full(len(docs), scored_blocks, dtype=np.int32)),
            pa.array(np.full(len(docs), skipped_blocks, dtype=np.int32)),
        ],
        names=["doc_id", "score", "blocks_scored", "blocks_skipped"],
    )


def _empty_out() -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([], type=pa.int64()),
            pa.array([], type=pa.float64()),
            pa.array([], type=pa.int32()),
            pa.array([], type=pa.int32()),
        ],
        names=["doc_id", "score", "blocks_scored", "blocks_skipped"],
    )


def search_wand(
    spark: SparkSession,
    index: Index,
    query: str,
    k: int = 10,
    enrich: bool = True,
    with_prune_stats: bool = False,
) -> DataFrame:
    """Conjunctive BM25 top-k via per-shard block-max WAND.

    Supports plain AND queries incl. fielded terms and ``-neg`` terms
    (anti-joined after the WAND pass); OR-groups and phrases take the
    general plan in plans.exec.search.
    """
    from ..plans.exec import _collstats_cached, _termstats_cached
    from ..plans.query import parse_query

    plan = parse_query(query)
    if any(len(g.members) > 1 or g.members[0].phrase for g in plan.groups):
        raise ValueError("search_wand handles conjunctive term queries only")
    terms = [g.members[0].text for g in plan.groups]
    if not terms:
        raise ValueError("query has no positive terms")
    neg_terms = [t.text for t in plan.negatives]

    n_docs, avgdl = _collstats_cached(spark, index)
    stats = _termstats_cached(spark, index, terms + neg_terms)
    if any(t not in stats for t in terms):
        return _empty_result(spark, enrich, with_prune_stats)

    idf = {
        stats[t][0]: math.log(1.0 + (n_docs - stats[t][1] + 0.5) / (stats[t][1] + 0.5))
        for t in terms
    }
    rarest = stats[min(terms, key=lambda t: stats[t][1])][0]
    neg_ids = [stats[t][0] for t in neg_terms if t in stats]
    from .merge import deleted_doc_ids

    qmeta = {
        "idf": idf,
        "rarest": rarest,
        "avgdl": avgdl,
        "neg_ids": neg_ids,
        "dead": deleted_doc_ids(spark, index),
    }
    pos_ids = list(idf.keys())

    blocks = index.postings.read(spark).filter(
        F.col("term_id").isin(pos_ids + neg_ids)
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        return _wand_kernel(tbl, qmeta, k)

    out_schema = (
        "doc_id long, score double, blocks_scored int, blocks_skipped int"
    )
    per_shard = blocks.groupBy("shard").applyInArrow(
        lambda _key, tbl: kernel(tbl), out_schema
    )
    # negation already applied inside the kernel (same shard's neg lists),
    # so each shard's k survivors are true local top-k — Msg3a merge:
    topk = per_shard.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    if not with_prune_stats:
        topk = topk.select("doc_id", "score")
    if not enrich:
        return topk
    docmeta = index.docstats.read(spark).select("doc_id", "repo", "path", "lang")
    cols = ["doc_id", "score", "repo", "path", "lang"] + (
        ["blocks_scored", "blocks_skipped"] if with_prune_stats else []
    )
    return (
        F.broadcast(topk)
        .join(docmeta, "doc_id")
        .select(*cols)
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def _empty_result(spark: SparkSession, enrich: bool, with_prune_stats: bool) -> DataFrame:
    base = "doc_id long, score double"
    if with_prune_stats:
        base += ", blocks_scored int, blocks_skipped int"
    if enrich:
        base += ", repo string, path string, lang string"
    return spark.createDataFrame([], base)
