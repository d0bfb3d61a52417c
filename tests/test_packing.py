"""Sequence packing: the layout must tile every stream exactly —
each doc's tokens appear once, each non-final sequence is full — and be
partitioning-invariant (content-hash order, not physical order)."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)

SEQ_LEN = 7


@pytest.fixture(scope="module")
def corpus(spark):
    # token counts 1..40ish with several docs longer than SEQ_LEN (must
    # span chunks) and one zero-token doc (must vanish from the layout)
    rows = [(i, " ".join(f"w{j}" for j in range(i % 41))) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def layout(spark, corpus):
    return pack_sequences(corpus, SEQ_LEN, n_streams=4).cache()


def test_every_token_packed_exactly_once(spark, corpus, layout):
    per_doc = (
        layout.groupBy("doc_id")
        .agg(F.sum(F.col("tok_end") - F.col("tok_start")).alias("packed"))
        .collect()
    )
    expect = {
        r["doc_id"]: r["n"]
        for r in corpus.select(
            "doc_id",
            F.size(
                F.regexp_extract_all(
                    F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0)
                )
            ).alias("n"),
        ).collect()
    }
    got = {r["doc_id"]: r["packed"] for r in per_doc}
    assert got == {d: n for d, n in expect.items() if n > 0}


def test_slices_tile_each_sequence(layout):
    # within a (stream, seq_id): slice lengths sum to seq_len for every
    # chunk except each stream's last, and seq_off ranges tile [0, fill)
    agg = (
        layout.groupBy("stream", "seq_id")
        .agg(
            F.sum(F.col("tok_end") - F.col("tok_start")).alias("fill"),
            F.min("seq_off").alias("off0"),
            F.max(F.col("seq_off") + F.col("tok_end") - F.col("tok_start")).alias(
                "off_end"
            ),
        )
        .collect()
    )
    last = {}
    for r in agg:
        last[r["stream"]] = max(last.get(r["stream"], -1), r["seq_id"])
    for r in agg:
        assert r["off0"] == 0
        assert r["off_end"] == r["fill"]
        if r["seq_id"] < last[r["stream"]]:
            assert r["fill"] == SEQ_LEN, (r["stream"], r["seq_id"])
        else:
            assert 0 < r["fill"] <= SEQ_LEN


def test_slice_bounds_within_doc(layout):
    bad = layout.filter(
        (F.col("tok_start") < 0)
        | (F.col("tok_end") <= F.col("tok_start"))
        | (F.col("seq_off") < 0)
        | (F.col("seq_off") + F.col("tok_end") - F.col("tok_start") > SEQ_LEN)
    )
    assert bad.count() == 0


def test_partitioning_invariant(spark, corpus, layout):
    a = sorted(map(tuple, layout.collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(corpus.repartition(13), SEQ_LEN, n_streams=4).collect(),
        )
    )
    assert a == b


def test_precounted_tokens_match_tokenized(spark, corpus, layout):
    counted = corpus.select(
        "doc_id",
        "text",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("ntok"),
    )
    via_col = pack_sequences(
        counted, SEQ_LEN, n_streams=4, n_tokens_col="ntok"
    )
    assert sorted(map(tuple, via_col.collect())) == sorted(
        map(tuple, layout.collect())
    )


def test_stats_fill_ratio(spark, layout):
    stats = packing_stats(layout, SEQ_LEN).collect()
    assert {r["stream"] for r in stats} <= {0, 1, 2, 3}
    for r in stats:
        assert r["n_tokens"] <= r["n_seqs"] * SEQ_LEN
        # chunked packing wastes only the final partial chunk
        assert r["n_tokens"] > (r["n_seqs"] - 1) * SEQ_LEN
        assert 0 < r["fill_ratio"] <= 1.0


def test_validation(spark, corpus):
    with pytest.raises(ValueError):
        pack_sequences(corpus, 0)
    with pytest.raises(ValueError):
        pack_sequences(corpus, 8, n_streams=6)
