"""Query execution: QueryPlan -> DataFrame program (SURVEY.md §3.1
stages 4-9, the Msg40/Msg3a/PosdbTable chain).

The reference scatters the query to every shard, merge-joins N sorted
termlists per shard (PosdbTable::intersectLists10_r), keeps a bounded
TopTree per shard and k-way merges (Msg3a).  Spark expresses the same
physical shape declaratively:

  pruned parquet scan of postings by term_id     = Msg5 termlist fetch
  decode (Arrow mapInPandas)                     = RdbList -> records
  broadcast join of the tiny query-term table    = Msg39Request fan-out
  two-level hash agg on (doc_id, slot)           = intersectLists DAAT loop
  HAVING n_slots == n_required                   = conjunctive AND
  orderBy(score desc, doc_id).limit(k)           = TopTree + Msg3a merge
                                                   (TakeOrderedAndProject)
  broadcast join top-k vs docstats               = Msg20 title-rec enrich

Scoring is BM25 (k1=1.2, b=0.75), idf = ln(1 + (N - df + .5)/(df + .5)),
float64, tie-break (score desc, doc_id asc) — SURVEY §2.8 X17, §7.5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.build import Index, decode_blocks
from .query import QueryPlan, parse_query

K1 = 1.2
B = 0.75


def idf_col(df_: Column, n_docs: Column) -> Column:
    return F.log(F.lit(1.0) + (n_docs - df_ + F.lit(0.5)) / (df_ + F.lit(0.5)))


def impact_col(tf: Column, doclen: Column, avgdl: Column) -> Column:
    """tf-saturation * length-normalization factor of BM25 (idf excluded)."""
    return (tf * F.lit(K1 + 1.0)) / (
        tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * doclen / avgdl)
    )


def bm25_contrib(tf: Column, doclen: Column, df_: Column, n_docs: Column, avgdl: Column) -> Column:
    return idf_col(df_, n_docs) * impact_col(tf, doclen, avgdl)


def search(
    spark: SparkSession,
    index: Index,
    query: str | QueryPlan,
    k: int = 10,
    enrich: bool = True,
) -> DataFrame:
    """Top-k BM25 search against a built index."""
    plan = parse_query(query) if isinstance(query, str) else query
    if not plan.groups:
        raise ValueError("query has no positive terms")

    n_docs, avgdl = _collstats_cached(spark, index)

    # term table: slot id per AND-group, member terms OR'd within a slot.
    # Phrase members are expanded to ordinary AND slots + a positional
    # adjacency filter (J4) applied before aggregation.
    member_rows: list[tuple[str, int, int, int]] = []  # term, slot, phrase_id, seq
    phrase_specs: list[tuple[int, int]] = []  # (phrase_id, n_members)
    slot = 0
    phrase_id = 0
    for g in plan.groups:
        if len(g.members) == 1 and g.members[0].phrase:
            toks = g.members[0].phrase
            for seq, t in enumerate(toks):
                member_rows.append((t, slot + seq, phrase_id, seq))
            phrase_specs.append((phrase_id, len(toks)))
            slot += len(toks)
            phrase_id += 1
        else:
            for m in g.members:
                member_rows.append((m.text, slot, -1, 0))
            slot += 1
    n_slots = slot
    neg_terms = [t.text for t in plan.negatives]

    all_terms = sorted({r[0] for r in member_rows} | set(neg_terms))
    df_by_term = _termstats_cached(spark, index, all_terms)

    present_members = [r for r in member_rows if r[0] in df_by_term]
    # any required (non-OR-group) term absent from the corpus => empty result.
    # For OR groups the group survives if at least one member is present.
    required_slots = sorted({r[1] for r in member_rows})
    live_slots = sorted({r[1] for r in present_members})
    if len(live_slots) < len(required_slots):
        return _empty_result(spark, enrich)

    qt_rows = [
        (
            df_by_term[t][0],
            s,
            pid,
            seq,
            float(_py_idf(df_by_term[t][1], n_docs)),
        )
        for (t, s, pid, seq) in present_members
    ]
    need_positions = bool(phrase_specs)
    qterms = spark.createDataFrame(
        qt_rows, "term_id long, slot int, phrase_id int, seq int, idf double"
    )

    blocks = index.postings.read(spark)
    pos_ids = [df_by_term[t][0] for (t, _s, _p, _q) in present_members]
    cand = decode_blocks(
        blocks.filter(F.col("term_id").isin(pos_ids)), with_positions=need_positions
    ).join(F.broadcast(qterms), "term_id")

    cand = cand.withColumn(
        "contrib",
        F.col("idf") * impact_col(F.col("tf"), F.col("doclen"), F.lit(avgdl)),
    )

    if phrase_specs:
        cand = _apply_phrase_filter(cand, phrase_specs)

    # DAAT intersection as two-level agg: best member per (doc, slot), then
    # docs matching every slot (U2/U3/J1/J2).
    per_slot = cand.groupBy("doc_id", "slot").agg(
        F.max("contrib").alias("slot_score"), F.first("doclen").alias("doclen")
    )
    scored = (
        per_slot.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.sum("slot_score").alias("score"),
        )
        .filter(F.col("n_matched") == len(required_slots))
        .drop("n_matched")
    )

    if neg_terms:
        neg_ids = [df_by_term[t][0] for t in neg_terms if t in df_by_term]
        if neg_ids:
            neg_docs = decode_blocks(
                blocks.filter(F.col("term_id").isin(neg_ids))
            ).select("doc_id").distinct()
            scored = scored.join(neg_docs, "doc_id", "left_anti")  # F3/J3

    # merge-on-read tombstones (U4): exclude deleted docs until compaction
    from ..operators.merge import deleted_doc_ids

    dead = deleted_doc_ids(spark, index)
    if len(dead):
        dead_df = F.broadcast(
            spark.createDataFrame([(int(x),) for x in dead], "doc_id long")
        )
        scored = scored.join(dead_df, "doc_id", "left_anti")

    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    if not enrich:
        return topk
    docmeta = index.docstats.read(spark).select("doc_id", "repo", "path", "lang")
    # broadcast the tiny top-k side (J5 Msg20 enrich)
    return (
        F.broadcast(topk)
        .join(docmeta, "doc_id")
        .select("doc_id", "score", "repo", "path", "lang")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def _py_idf(df_: int, n_docs: float) -> float:
    import math

    return math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))


# -- per-snapshot driver-side stat caches (Msg2's termlist-cache analog):
# collection stats and per-term (term_id, df) are tiny and immutable per
# snapshot version; re-collecting them cost a Spark job per query.
_COLL_CACHE: dict[tuple[str, int], tuple[float, float]] = {}
_TERM_CACHE: dict[tuple[str, int], dict[str, tuple[int, int]]] = {}


def _collstats_cached(spark: SparkSession, index: Index) -> tuple[float, float]:
    snap = index.collstats.latest()
    key = (index.root, snap.version if snap else -1)
    if key not in _COLL_CACHE:
        row = index.collstats.read(spark).collect()[0]
        _COLL_CACHE[key] = (float(row["n_docs"]), float(row["avgdl"]))
    return _COLL_CACHE[key]


def _termstats_cached(
    spark: SparkSession, index: Index, terms: list[str]
) -> dict[str, tuple[int, int]]:
    snap = index.termstats.latest()
    key = (index.root, snap.version if snap else -1)
    cache = _TERM_CACHE.setdefault(key, {})
    missing = [t for t in terms if t not in cache]
    if missing:
        rows = (
            index.termstats.read(spark)
            .filter(F.col("term").isin(missing))
            .select("term", "term_id", "df")
            .collect()
        )
        for r in rows:
            cache[r["term"]] = (int(r["term_id"]), int(r["df"]))
        for t in missing:  # negative-cache absent terms
            cache.setdefault(t, (0, 0))
    return {t: cache[t] for t in terms if cache.get(t, (0, 0))[1] > 0}


def _apply_phrase_filter(cand: DataFrame, phrase_specs: list[tuple[int, int]]) -> DataFrame:
    """Positional adjacency for quoted phrases (J4/W4 analog).

    A doc survives a phrase iff for some p: p in pos(tok_0), p+1 in
    pos(tok_1), ...  Checked with built-in array ops — per-doc arrays are
    small, so arrays_overlap of shifted position sets does the sliding
    window without Python.
    """
    non_phrase = cand.filter(F.col("phrase_id") == -1)
    ph = cand.filter(F.col("phrase_id") >= 0)
    # shift each member's positions back by seq: phrase matches iff the
    # intersection of shifted sets is non-empty for every member.
    shifted = ph.withColumn(
        "shifted", F.transform(F.col("positions"), lambda p: p - F.col("seq"))
    )
    ok = (
        shifted.groupBy("doc_id", "phrase_id")
        .agg(
            F.aggregate(
                F.collect_list("shifted"),
                F.lit(None).cast("array<int>"),
                lambda acc, x: F.when(acc.isNull(), x).otherwise(F.array_intersect(acc, x)),
            ).alias("common"),
            F.count("*").alias("n_present"),
        )
        .filter(F.size(F.col("common")) > 0)
        .select("doc_id", "phrase_id", "n_present")
    )
    ph_ok = ph.join(ok.select("doc_id", "phrase_id"), ["doc_id", "phrase_id"], "left_semi")
    return non_phrase.unionByName(ph_ok)


def _empty_result(spark: SparkSession, enrich: bool) -> DataFrame:
    if enrich:
        return spark.createDataFrame(
            [], "doc_id long, score double, repo string, path string, lang string"
        )
    return spark.createDataFrame([], "doc_id long, score double")
