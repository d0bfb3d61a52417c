"""Sequence packing for pretraining-data pipelines.

A training pipeline turns documents into fixed-length token sequences by
CONCATENATING documents in a deterministic order and CHUNKING the stream
every ``seq_len`` tokens (the standard GPT-style pack: documents may
span chunk boundaries, no padding except the final partial chunk).  The
operator here emits the pack *layout* — which token span of which doc
lands where in which sequence — as pure column expressions:

- The corpus is split into ``n_streams`` independent packing streams by
  a content hash of the doc id, so the only shuffle is one window
  partitioned by stream, and streams pack in parallel (at 100 TB pick
  n_streams >> executors; each stream's running sum is a single ordered
  scan, the same shape as a sort-merge aggregation).
- Order within a stream is (md5-hex of id, id): deterministic,
  partitioning-invariant, and replayable by any engine with md5 — the
  same content-stable-keying rule as `operators/sampling.py`
  (``df.sample``-style partition RNG would make the layout depend on the
  physical plan).
- Chunk math is exact integer arithmetic (SQL ``div``, no float floor):
  a doc covering stream offsets [start, end) intersects chunks
  ``start div L .. (end-1) div L``; one output row per (doc, chunk)
  via explode(sequence(...)).

No tokens move — the layout is a join key back into the corpus; the
actual slice-and-concatenate happens wherever sequences are materialized
(typically the training-data writer).  Reference analog: none (the
reference is a search engine); this is one of the brief's first-class
LLM-pipeline operators, like dedup/ANN/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _md5_lower64
from .textstats import token_count, tokens_simple


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_streams: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Pack layout: one row per (doc, sequence) overlap.

    Output columns:
      stream     packing stream id in [0, n_streams)
      seq_id     chunk index within the stream (0-based)
      doc_id     (named by ``id_col``)
      tok_start  first token of this doc in this sequence (within-doc)
      tok_end    one past the last token (within-doc; tok_end - tok_start
                 tokens of this doc land in this sequence)
      seq_off    position inside the sequence where the slice begins

    Invariants (tested): within a (stream, seq_id) the slices tile
    [0, seq_len) exactly — except each stream's final partial chunk —
    and every token of every non-empty doc appears in exactly one slice.

    ``n_streams`` must be a power of two: the stream id is the md5
    lower-64 mod n_streams, and two's-complement pmod equals unsigned mod
    only for power-of-two divisors — which is what keeps the rule
    bit-replayable by an unsigned-arithmetic oracle (DuckDB
    ``md5_number_lower(...) % n``).

    ``n_tokens_col`` skips tokenization when the corpus already carries a
    token count column (the 100-TB path: count once, pack many times).

    Precondition: ``id_col`` values are unique (the corpus has been
    deduplicated — packing runs AFTER dedup in the curation order).
    Duplicate ids would tie the (md5, id) window order key and the
    layout of the tied rows would depend on physical partition order.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_streams <= 0 or (n_streams & (n_streams - 1)) != 0:
        raise ValueError(f"n_streams must be a power of two, got {n_streams}")

    sid = F.col(id_col).cast("string")
    n_tok = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col
        else token_count(tokens_simple(F.col(text_col))).cast("long")
    )
    base = (
        docs.select(
            F.col(id_col),
            F.pmod(_md5_lower64(sid), F.lit(n_streams)).cast("long").alias("stream"),
            F.md5(sid).alias("_h"),
            n_tok.alias("n_tokens"),
        )
        # zero-token docs occupy no stream offsets: drop them here so the
        # running sum never emits an empty [x, x) slice
        .filter(F.col("n_tokens") > 0)
    )
    w = (
        Window.partitionBy("stream")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = base.withColumn("_end", F.sum("n_tokens").over(w)).withColumn(
        "_start", F.col("_end") - F.col("n_tokens")
    )
    # exact integer chunk bounds (div, not float floor: stream offsets at
    # corpus scale exceed double's 2^53 exact-integer range)
    first = F.expr(f"_start div {seq_len}")
    last = F.expr(f"(_end - 1) div {seq_len}")
    out = spans.withColumn("seq_id", F.explode(F.sequence(first, last)))
    seq_start = F.col("seq_id") * seq_len
    return out.select(
        "stream",
        "seq_id",
        F.col(id_col),
        F.greatest(F.lit(0).cast("long"), seq_start - F.col("_start")).alias(
            "tok_start"
        ),
        F.least(
            F.col("n_tokens"), seq_start + seq_len - F.col("_start")
        ).alias("tok_end"),
        F.greatest(F.lit(0).cast("long"), F.col("_start") - seq_start).alias(
            "seq_off"
        ),
    )


def packing_stats(layout: DataFrame, seq_len: int) -> DataFrame:
    """Per-stream pack summary over a `pack_sequences` layout:
    (stream, n_seqs, n_slices, n_tokens, fill_ratio).  fill_ratio is
    packed tokens / capacity — with chunked packing it is 1 minus the
    final partial chunk's slack, so it tends to 1 as streams grow."""
    return (
        layout.groupBy("stream")
        .agg(
            (F.max("seq_id") + 1).alias("n_seqs"),
            F.count("*").alias("n_slices"),
            F.sum(F.col("tok_end") - F.col("tok_start")).alias("n_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("n_tokens") / (F.col("n_seqs") * seq_len), 6),
        )
        .orderBy("stream")
    )
