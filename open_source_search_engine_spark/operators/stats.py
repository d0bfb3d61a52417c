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
