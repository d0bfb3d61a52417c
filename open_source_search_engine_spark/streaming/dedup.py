"""Streaming exact-dedup: suppress duplicate documents across
micro-batches before they reach the index.

Reference analog: Gigablast's spider dedups re-fetched pages against the
stored content hash before indexing (XmlDoc::getDupList, SURVEY §2.3 J8)
— in a streaming ingest the same guard must hold ACROSS micro-batches,
which plain per-batch dropDuplicates cannot do.  Structured Streaming's
``dropDuplicatesWithinWatermark`` keeps the content-hash keys in state
for the watermark delay and ages them out, so state is bounded by the
duplicate-arrival horizon instead of growing with the stream (the 100-TB
posture: an unbounded seen-set is the classic streaming-dedup OOM).

Composable with streaming/incremental.stream_documents: dedup the source
stream first, then hand it to the exactly-once foreachBatch sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_key(
    docs: DataFrame, text_col: str, id_col: str = "doc_id"
) -> Column:
    """md5 dedup key, NULL-safe: md5(NULL) is NULL, and BOTH
    dropDuplicatesWithinWatermark and a window partition treat all NULL
    keys as ONE group — every later null-content document (a failed
    fetch, say) would be silently dropped as a 'duplicate' of the first.
    NULL content is 'no content to be a duplicate OF', so each such row
    gets a unique per-row key (its doc_id when present, else a
    nondeterministic uuid) and always survives."""
    uniq = (
        F.concat(F.lit("null:"), F.col(id_col).cast("string"))
        if id_col in docs.columns
        else F.concat(F.lit("null:"), F.expr("uuid()"))
    )
    return F.when(
        F.col(text_col).isNotNull(), F.md5(F.col(text_col))
    ).otherwise(uniq)


def dedup_documents_stream(
    stream: DataFrame,
    text_col: str = "content",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop documents whose ``text_col`` content (md5) was already seen
    within the watermark horizon.  ``ts_col`` must be an event-time
    timestamp column; duplicates arriving later than ``delay`` after the
    first copy may pass (by design — bounded state).  NULL-content rows
    are never treated as duplicates of each other (see _content_key)."""
    return (
        stream.withColumn("_text_md5", _content_key(stream, text_col))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["_text_md5"])
        .drop("_text_md5")
    )


def dedup_documents_batch(
    docs: DataFrame, text_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Batch twin (same keep-one-per-content semantics, no horizon):
    deterministic — keeps the min doc_id row per content hash when a
    doc_id column exists, else an arbitrary single row.  NULL-content
    rows all survive (see _content_key)."""
    keyed = docs.withColumn(
        "_text_md5", _content_key(docs, text_col, id_col)
    )
    if id_col in docs.columns:
        from pyspark.sql import Window

        w = Window.partitionBy("_text_md5").orderBy(id_col)
        return (
            keyed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_text_md5")
        )
    return keyed.dropDuplicates(["_text_md5"]).drop("_text_md5")
