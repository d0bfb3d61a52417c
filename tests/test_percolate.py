"""Percolation (reverse search): compile + match semantics, hand-checked
on a tiny corpus, plus the streaming foreachBatch composition."""

import pytest

from open_source_search_engine_spark.operators.percolate import (
    compile_queries,
    percolate,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark join table scan"),  # q1 (spark+join), q3? has join -> no
        (2, "the vector index"),  # q2 (vector OR stream)
        (3, "stream and vector"),  # q2
        (4, "table scan only"),  # q3 (table, no join)
        (5, "hash merge"),  # q4 needs sort too -> no
        (6, "hash merge sort pipeline"),  # q4
        (7, "nothing relevant"),
        (8, "spark spark spark"),  # q1 needs join -> no
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


QUERIES = [
    (1, "spark join"),
    (2, "vector OR stream"),
    (3, "table -join"),
    (4, "hash merge sort"),
]

EXPECT = {(1, 1), (2, 2), (3, 2), (4, 3), (6, 4)}


def test_hand_checked_matches(spark, docs):
    pq = compile_queries(QUERIES)
    got = {(r.doc_id, r.query_id) for r in percolate(docs, pq).collect()}
    assert got == EXPECT


def test_compiled_relations(spark):
    pq = compile_queries(QUERIES)
    assert (1, 0, "spark") in pq.pos and (1, 1, "join") in pq.pos
    # OR group members share a slot
    assert (2, 0, "vector") in pq.pos and (2, 0, "stream") in pq.pos
    assert pq.neg == [(3, "join")]
    assert sorted(pq.meta) == [(1, 2), (2, 1), (3, 1), (4, 3)]


def test_phrase_and_field_rejected(spark):
    with pytest.raises(NotImplementedError):
        compile_queries([(1, '"fast table"')])
    with pytest.raises(NotImplementedError):
        compile_queries([(1, "lang:python spark")])
    with pytest.raises(ValueError):
        compile_queries([(1, "-onlynegative")])


def test_repeated_token_one_hit(spark):
    # a doc repeating a term 100x must match exactly once
    docs = spark.createDataFrame(
        [(1, " ".join(["spark"] * 100) + " join")], "doc_id long, text string"
    )
    out = percolate(docs, compile_queries([(7, "spark join")])).collect()
    assert [(r.doc_id, r.query_id) for r in out] == [(1, 7)]


def test_broadcast_plan(spark, docs):
    # the rule-set joins must be broadcast: no shuffle keyed by the rules
    pq = compile_queries(QUERIES)
    plan = (
        percolate(docs, pq)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_streaming_foreachbatch(spark, docs, tmp_path):
    """Percolate composes with Structured Streaming: each micro-batch is
    matched independently and appended to the alert sink."""
    src = str(tmp_path / "src")
    docs.repartition(2).write.parquet(src)
    pq = compile_queries(QUERIES)
    matches: set[tuple[int, int]] = set()

    def sink(batch_df, _bid):
        for r in percolate(batch_df, pq).collect():
            matches.add((r.doc_id, r.query_id))

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert matches == EXPECT


def test_underscore_token_parity_with_query_parser(spark):
    # parse_query keeps '_' inside a token ([a-z0-9_]+); the doc-side
    # tokenizer must use the SAME charset or underscore rules never fire
    docs = spark.createDataFrame(
        [(1, "use foo_bar here"), (2, "foo bar split")],
        "doc_id long, text string",
    )
    out = percolate(docs, compile_queries([(9, "foo_bar")])).collect()
    assert [(r.doc_id, r.query_id) for r in out] == [(1, 9)]
