"""Percolation — reverse search: match DOCUMENTS against a stored table
of STANDING QUERIES (the Elasticsearch-percolator shape; no Gigablast
analog — the closest reference concept is the query side of SURVEY §2.3
turned inside out).

Use cases this engine needs it for: alerting ("tell me when a doc
matching my query is ingested"), routing rules in a training-data
pipeline ("docs matching rule R go to bucket B"), and saved-search
notification fan-out.  The key inversion: queries become the DATA
(small, broadcastable — alert rule sets are 10^3..10^6 rows), documents
become the probe stream scanned exactly once.

Query surface (v1): conjunctive AND of slots, each slot a term or an
OR-group, plus ``-neg`` terms — the same grammar as ``plans/query.py``
minus phrases and fielded terms (both raise; they need positional /
metadata context a token join does not carry).

Plan per batch of docs:

    toks  = docs -> explode(array_distinct(tokenize(text)))
    hits  = toks JOIN broadcast(pos+neg rule terms, sign column)
    match = hits.groupBy(doc, query):
              countDistinct(positive slot) == n_slots AND no neg hit

ONE corpus scan (positives and negatives share the broadcast relation),
broadcast-only joins against the rule set, and the single shuffle is
keyed by (doc, query) HIT pairs — proportional to matches, not to
|docs| x |queries|.  Composes with Structured Streaming
via ``foreachBatch`` (each micro-batch percolates independently;
matching is stateless per doc).  Every step is integer/set algebra, so
the driver oracle replays it verbatim in SQL.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import SIMPLE_TOKEN_RE
from ..plans.query import QueryPlan, parse_query


@dataclass
class PercolateQueries:
    """Compiled standing-query tables (driver-side lists; broadcast at
    match time).  pos: (query_id, slot, term) — OR within a slot, AND
    across slots.  neg: (query_id, term).  meta: (query_id, n_slots)."""

    pos: list[tuple[int, int, str]]
    neg: list[tuple[int, str]]
    meta: list[tuple[int, int]]


def compile_queries(
    queries: list[tuple[int, str | QueryPlan]],
) -> PercolateQueries:
    """Parse standing queries into the three match relations.

    Raises on phrases / fielded terms (v1 surface) and on a query with
    no positive slot (it would match everything)."""
    pos: list[tuple[int, int, str]] = []
    neg: list[tuple[int, str]] = []
    meta: list[tuple[int, int]] = []
    for qid, q in queries:
        plan = parse_query(q) if isinstance(q, str) else q
        if not plan.groups:
            raise ValueError(f"query {qid} has no positive terms")
        for t in plan.all_terms:
            if t.phrase and len(t.phrase) > 1:
                raise NotImplementedError(
                    "percolate v1 does not support quoted phrases"
                )
            if ":" in t.text:
                raise NotImplementedError(
                    "percolate v1 does not support fielded terms"
                )
        for slot, g in enumerate(plan.groups):
            for m in g.members:
                pos.append((int(qid), slot, m.text))
        for t in plan.negatives:
            neg.append((int(qid), t.text))
        meta.append((int(qid), len(plan.groups)))
    return PercolateQueries(pos=pos, neg=neg, meta=meta)


def percolate(
    docs: DataFrame,
    pq: PercolateQueries,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, query_id) for every (doc, standing query) match.

    Tokenization is the engine's SIMPLE token grammar
    (``[a-z0-9_]+`` — the same charset ``parse_query`` normalizes query
    terms with, so a standing query containing an underscore matches
    exactly the docs the stored index would match); per-doc tokens are
    distinct-ed BEFORE the join so a term repeated in a doc produces one
    hit row, keeping the shuffle keyed by distinct (doc, query, slot)
    hits.  Positive and negative rule terms ride ONE broadcast relation
    (sign column) so the probe stream is scanned and tokenized exactly
    once, negations included."""
    spark = docs.sparkSession
    rule_rows = [(q, s, t, False) for (q, s, t) in pq.pos] + [
        (q, -1, t, True) for (q, t) in pq.neg
    ]
    rules_df = spark.createDataFrame(
        rule_rows, "query_id long, slot int, term string, is_neg boolean"
    )
    meta_df = spark.createDataFrame(pq.meta, "query_id long, n_slots int")

    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)),
                    F.lit(SIMPLE_TOKEN_RE),
                    F.lit(0),
                )
            )
        ).alias("_tok"),
    )
    hits = (
        toks.join(F.broadcast(rules_df), toks["_tok"] == rules_df["term"])
        .select(id_col, "query_id", "slot", "is_neg")
        .distinct()
    )
    per_query = hits.groupBy(id_col, "query_id").agg(
        F.countDistinct(
            F.when(~F.col("is_neg"), F.col("slot"))
        ).alias("_ns"),
        F.max(F.col("is_neg").cast("int")).alias("_has_neg"),
    )
    return (
        per_query.join(F.broadcast(meta_df), "query_id")
        .filter((F.col("_ns") == F.col("n_slots")) & (F.col("_has_neg") == 0))
        .select(id_col, "query_id")
    )
