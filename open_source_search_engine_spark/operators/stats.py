"""Collection statistics as DataFrame aggregates (SURVEY.md §2.4 A1-A3).

Reference: Posdb::getTermFreq *estimates* df from RdbMap page counts and
Rdb::getNumTotalRecs counts docs; densityRank approximates length
normalization.  The rebuild computes all of it exactly with native
partial->final hash aggregation (the Msg3a merge topology, A5, for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import term_id_col


def termstats_from_occurrences(occ: DataFrame) -> DataFrame:
    """df/cf per term from occurrence rows (term, doc_id, ...).  A2."""
    return occ.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count("*").alias("cf"),
    ).withColumn("term_id", term_id_col(F.col("term")))


def collstats_from_docstats(docstats: DataFrame) -> DataFrame:
    """N docs + average doc length.  A3."""
    return docstats.agg(
        F.count("*").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )


def describe_index(spark, index) -> dict:
    """Operational snapshot of a stored index — the PageStats/Statsdb
    'stats page' analog: per-table segment counts + snapshot versions
    (driver-side JSON walks), plus postings shape from BLOCK METADATA
    only (one pruned-column scan; no posting bytes are decoded).

    Returns a plain dict so CLIs/tests/serving dashboards can render it:
    {tables: {name: {segments, version, operation}},
     postings: {blocks, postings, bytes_encoded, n_shards, n_terms,
                max_block_docs}, collstats: {n_docs, avgdl},
     features: {...}, tombstones: n}."""
    out: dict = {"tables": {}, "features": index.features()}
    for name in (
        "postings", "docstats", "termdict", "termstats",
        "termstats_partial", "collstats", "deletes", "checkpoints",
    ):
        try:
            t = getattr(index, name)
        except AttributeError:
            # only 'deletes' legitimately lacks an Index attribute (it is
            # derived); any other missing table is a real misconfiguration
            # and must surface, not masquerade as deletes stats
            if name != "deletes":
                raise
            from .merge import deletes_table

            t = deletes_table(index)
        snap = t.latest()
        out["tables"][name] = {
            "segments": len(snap.segments) if snap else 0,
            "version": snap.version if snap else -1,
            "operation": snap.operation if snap else None,
        }
    blocks = index.postings.read(spark)
    if blocks is not None:
        row = blocks.agg(
            F.count("*").alias("blocks"),
            F.sum("n_docs").alias("postings"),
            F.sum("sum_tf").alias("occurrences"),
            F.sum(
                F.octet_length("doc_ids_enc")
                + F.octet_length("tfs_enc")
                + F.octet_length("doclens_enc")
                + F.octet_length("positions_enc")
            ).alias("bytes_encoded"),
            F.sum(
                F.octet_length("doc_ids_enc")
                + F.octet_length("tfs_enc")
                + F.octet_length("doclens_enc")
            ).alias("bytes_core"),
            F.sum(F.octet_length("positions_enc")).alias("bytes_positions"),
            F.countDistinct("shard").alias("n_shards"),
            F.countDistinct("term_id").alias("n_terms"),
            F.max("n_docs").alias("max_block_docs"),
        ).collect()[0]
        out["postings"] = {k: (int(v) if v is not None else 0) for k, v in row.asDict().items()}
        p = out["postings"]
        # two densities, two units (mixing them overstates the posting
        # cost): core = (doc_id gap, tf, doclen) per POSTING — the
        # "~7 B/posting at 40-bit gaps" claim and the unit of the
        # reference's 6-12 B prefix-compressed posdb keys; positions are
        # per-OCCURRENCE payload (cf occurrences, not df postings)
        p["bytes_per_posting"] = (
            round(p["bytes_encoded"] / p["postings"], 2) if p["postings"] else 0.0
        )
        p["bytes_per_posting_core"] = (
            round(p["bytes_core"] / p["postings"], 2) if p["postings"] else 0.0
        )
        p["bytes_per_occurrence_positions"] = (
            round(p["bytes_positions"] / p["occurrences"], 2)
            if p["occurrences"]
            else 0.0
        )
        # the reference-band unit: posdb stores ONE 18-byte key per
        # occurrence (prefix-compressed to 6-12 B), so total encoded
        # bytes / occurrences is the number comparable to that band
        p["bytes_per_occurrence_total"] = (
            round(p["bytes_encoded"] / p["occurrences"], 2)
            if p["occurrences"]
            else 0.0
        )
    cs = index.collstats.read(spark)
    if cs is not None:
        # a committed-but-empty segment (crash between write and
        # finalize) must not crash the stats page
        rows = cs.collect()
        if rows and rows[0]["n_docs"] is not None:
            r = rows[0]
            out["collstats"] = {
                "n_docs": int(r["n_docs"]),
                "avgdl": round(float(r["avgdl"] or 0.0), 2),
            }
    from .merge import deletes_table

    # distributed count, NOT deleted_doc_ids(): the stats page only needs
    # the number — collecting + sorting every tombstone id to the driver
    # (and warming the WAND dead-cache as a side effect) is exactly the
    # driver-side materialization a large un-compacted delete backlog
    # can't afford
    ddf = deletes_table(index).read(spark)
    out["tombstones"] = (
        0 if ddf is None else int(ddf.select("doc_id").distinct().count())
    )
    return out


def fsck_index(spark, index, deep: bool = False) -> dict:
    """Consistency check of a stored index — the Repair.cpp
    verify-before-rebuild analog for the snapshot-log layout.  Checks,
    cheapest first:

    - manifest integrity: every table's HEAD snapshot resolves and every
      referenced segment directory exists on disk;
    - cross-table invariants (driver-side, tiny reads): collstats.n_docs
      == docstats row count; termstats.n_blocks sum == postings block
      count; every posting term_id appears in the termstats dictionary;
    - ``deep=True`` additionally decodes every posting block and
      re-verifies the sorted-run invariant (doc_ids strictly increasing
      within a block) — O(index), the full RdbMap scan.

    Returns {ok: bool, issues: [str], checked: {…counts…}} — never
    raises on findings, so operators can run it against a live index.
    """
    import os

    issues: list[str] = []
    checked: dict = {}
    tables = (
        "postings", "docstats", "termdict", "termstats",
        "termstats_partial", "collstats", "checkpoints",
    )
    broken: set[str] = set()
    for name in tables:
        t = getattr(index, name)
        snap = t.latest()
        if snap is None:
            if name in ("postings", "docstats", "collstats", "termstats"):
                issues.append(f"{name}: no snapshot (index incomplete?)")
            continue
        missing = [s for s in snap.segments if not os.path.isdir(s)]
        if missing:
            broken.add(name)
            issues.append(
                f"{name}: v{snap.version} references {len(missing)} "
                f"missing segment dir(s), e.g. {os.path.basename(missing[0])}"
            )
    # the deletes table is root-addressed, not an Index attribute — but a
    # broken deletes snapshot crashes EVERY query path's tombstone
    # anti-join, the exact verify-before-rebuild failure fsck exists for
    from .merge import deletes_table

    dsnap = deletes_table(index).latest()
    if dsnap is not None:
        missing = [s for s in dsnap.segments if not os.path.isdir(s)]
        if missing:
            issues.append(
                f"deletes: v{dsnap.version} references {len(missing)} "
                f"missing segment dir(s), e.g. {os.path.basename(missing[0])}"
            )
    checked["tables"] = len(tables) + 1

    # half-committed delta batches (add_documents died before its
    # postings commit): their orphan segments double-count stats until
    # repaired (streaming.incremental.repair_orphan_deltas)
    from ..streaming.incremental import find_orphan_deltas

    for name, segs in find_orphan_deltas(index).items():
        issues.append(
            f"{name}: {len(segs)} orphan segment(s) from a half-committed "
            "add batch (run repair_orphan_deltas)"
        )

    # cross-table scans only over tables whose segments all exist — a
    # missing dir is already reported above and would otherwise abort the
    # whole check with a mid-scan FileNotFound
    def _read(name):
        return None if name in broken else getattr(index, name).read(spark)

    blocks = _read("postings")
    ds = _read("docstats")
    cs = _read("collstats")
    ts = _read("termstats")
    if ds is not None and cs is not None:
        n_ds = ds.count()
        cs_rows = cs.collect()
        checked["docstats_rows"] = n_ds
        if not cs_rows or cs_rows[0]["n_docs"] is None:
            # the checker must report an empty collstats segment, not
            # die on it ('never raises on findings')
            issues.append(
                "collstats: segment exists but holds no stats row "
                "(crash between write and finalize?)"
            )
        elif n_ds != int(cs_rows[0]["n_docs"]):
            issues.append(
                f"collstats.n_docs={int(cs_rows[0]['n_docs'])} != "
                f"docstats rows={n_ds} "
                "(stats not finalized after last mutation?)"
            )
    if blocks is not None and ts is not None:
        n_blocks = blocks.count()
        ts_blocks = ts.agg(F.sum("n_blocks").alias("b")).collect()[0]["b"]
        checked["postings_blocks"] = n_blocks
        # a tiered minor merge re-blocks the merged deltas WITHOUT
        # touching stats (df/cf are merge-invariant; n_blocks is a
        # physical count) — after one, the mismatch is expected, not an
        # orphan signal, until the next finalize/compact
        minor_merged = any(
            index.postings.at(v).operation == "minor-merge"
            for v in index.postings.history()
        )
        if (
            ts_blocks is not None
            and int(ts_blocks) != n_blocks
            and not minor_merged
        ):
            issues.append(
                f"termstats n_blocks sum={int(ts_blocks)} != postings "
                f"block count={n_blocks} (orphan or missing segments?)"
            )
        orphan_terms = (
            blocks.select("term_id")
            .distinct()
            .join(ts.select("term_id"), "term_id", "left_anti")
            .count()
        )
        if orphan_terms:
            issues.append(
                f"{orphan_terms} posting term_id(s) absent from termstats"
            )
    if deep and blocks is not None:
        # full decode in an Arrow kernel: per block the delta-decoded
        # doc_ids must be strictly increasing in shifted-uint64 space
        # (the sorted-run invariant T5) and the first/last ids must equal
        # the stored [min_doc_id, max_doc_id] bounds the WAND kernel
        # prunes by
        import numpy as np
        import pandas as pd

        from ..functions import codec

        def _verify(batches):
            for pdf in batches:
                bad = 0
                for row in pdf.itertuples(index=False):
                    ids, _tfs, _pos, _b = codec.decode_postings_block(
                        row.doc_ids_enc, row.tfs_enc, b"", int(row.n_docs)
                    )
                    u = ids.astype(np.uint64) + np.uint64(1 << 63)
                    if (
                        ids.size != int(row.n_docs)
                        or (ids.size and ids[0] != row.min_doc_id)
                        or (ids.size and ids[-1] != row.max_doc_id)
                        or (ids.size > 1 and not (np.diff(u) > 0).all())
                    ):
                        bad += 1
                yield pd.DataFrame({"bad": [bad]})

        bad = int(
            blocks.select(
                "n_docs", "min_doc_id", "max_doc_id", "doc_ids_enc", "tfs_enc"
            )
            .mapInPandas(_verify, "bad long")
            .agg(F.sum("bad").alias("bad"))
            .collect()[0]["bad"]
            or 0
        )
        checked["deep_blocks"] = True
        if bad:
            issues.append(
                f"{bad} block(s) fail decode invariants (unsorted ids or "
                "[min,max] metadata mismatch)"
            )
    return {"ok": not issues, "issues": issues, "checked": checked}
