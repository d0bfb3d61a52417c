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
            F.sum(
                F.octet_length("doc_ids_enc")
                + F.octet_length("tfs_enc")
                + F.octet_length("doclens_enc")
                + F.octet_length("positions_enc")
            ).alias("bytes_encoded"),
            F.countDistinct("shard").alias("n_shards"),
            F.countDistinct("term_id").alias("n_terms"),
            F.max("n_docs").alias("max_block_docs"),
        ).collect()[0]
        out["postings"] = {k: (int(v) if v is not None else 0) for k, v in row.asDict().items()}
        p = out["postings"]
        p["bytes_per_posting"] = (
            round(p["bytes_encoded"] / p["postings"], 2) if p["postings"] else 0.0
        )
    cs = index.collstats.read(spark)
    if cs is not None:
        r = cs.collect()[0]
        out["collstats"] = {"n_docs": int(r["n_docs"]), "avgdl": round(float(r["avgdl"]), 2)}
    from .merge import deleted_doc_ids

    out["tombstones"] = int(len(deleted_doc_ids(spark, index)))
    return out
