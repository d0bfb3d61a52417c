"""URL-filters rule DSL — the F9 operator, re-expressed Spark-first.

Reference analog (SURVEY.md §2.2 F9): Gigablast's ``urlfilters.conf`` is
an ORDERED table of expression rows (``isdocidbased``, ``hopcount>2``,
``tld==de``, regex/substring matches on the URL) mapped to a spider
priority / ban verdict; the FIRST matching row wins
(``Spider.cpp::getUrlFilterNum``).  The reference evaluates rows per URL
in C++; the Spark rebuild compiles the whole rule table into ONE nested
``CASE WHEN`` column expression, so rule evaluation rides whole-stage
codegen over the corpus — no UDF, no per-row Python, and Catalyst can
push any leading constant predicates into the scan.

Grammar (one rule expression = clauses joined by ``&&``):

    clause  := field OP value | 'default'
    OP      := '~='  regex (partial match, Spark RLIKE semantics)
             | '^='  starts-with
             | '*='  contains
             | '=='  equals        | '!=' not-equals
             | '<=' | '>=' | '<' | '>'   numeric comparison

``default`` matches everything — the conventional last catch-all row.
Rows are evaluated in order; ``rule_idx`` is the first match (-1 if no
row matched and there is no default row).
"""

from __future__ import annotations

import operator
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class UrlRule:
    """One ordered rule row: expression -> (priority, index-or-ban)."""

    expr: str
    priority: int
    index: bool = True


# two-char operators first so '~=' / '<=' are never split at the '='/'<'
_OPS = ("~=", "^=", "*=", "==", "!=", "<=", ">=", "<", ">")


def _coerce(val: str):
    try:
        return int(val)
    except ValueError:
        try:
            return float(val)
        except ValueError:
            return val


def compile_clause(clause: str) -> Column:
    """One ``field OP value`` clause -> a boolean Column."""
    clause = clause.strip()
    if clause == "default":
        return F.lit(True)
    # split at the LEFTMOST operator occurrence (longest op on position
    # ties, so '<=' beats '<'): picking by _OPS tuple order would mis-split
    # a clause whose VALUE contains an operator that sorts earlier
    hits = [
        (pos, -len(op), op)
        for op in _OPS
        if (pos := clause.find(op)) > 0
    ]
    if not hits:
        raise ValueError(f"unparseable url-filter clause: {clause!r}")
    pos, _neg, op = min(hits)
    field, val = clause[:pos].strip(), clause[pos + len(op):].strip()
    c = F.col(field)
    if op == "~=":
        return c.rlike(val)
    if op == "^=":
        return c.startswith(val)
    if op == "*=":
        return c.contains(val)
    v = _coerce(val)
    if op == "==":
        # compare in STRING space when the value parses numeric but the
        # field may be a string column: ANSI mode (Spark 4 default) would
        # otherwise throw on the implicit cast of a non-numeric cell; a
        # rule row must classify rows, never abort the job
        return c.eqNullSafe(F.lit(v)) if isinstance(v, str) else (
            c.try_cast("double").eqNullSafe(F.lit(float(v)))
        )
    if op == "!=":
        # null-safe: the ordered-conf semantics ('first matching row
        # wins') treat a NULL/odd field value as 'not equal', not as a
        # silent fall-through to later rules (SQL three-valued NULL would
        # make the predicate unknown -> CASE skips the row)
        return ~c.eqNullSafe(F.lit(v)) if isinstance(v, str) else ~(
            c.try_cast("double").eqNullSafe(F.lit(float(v)))
        )
    n = F.lit(float(v))
    # try_cast, not cast: under ANSI mode a non-numeric string cell would
    # throw CAST_INVALID_INPUT and kill the job; the rule semantics are
    # 'this clause is simply false for that row' (try_cast -> NULL ->
    # comparison NULL -> CASE falls through to the next rule)
    cd = c.try_cast("double")
    return {"<": cd < n, ">": cd > n, "<=": cd <= n, ">=": cd >= n}[op]


def compile_expr(expr: str) -> Column:
    """A full rule expression (``&&``-joined clauses) -> one Column."""
    return reduce(operator.and_, (compile_clause(c) for c in expr.split("&&")))


def apply_url_filters(df: DataFrame, rules: list[UrlRule]) -> DataFrame:
    """Annotate every row with its first-matching rule: adds
    ``rule_idx`` (long, -1 = no match), ``priority`` (long), and
    ``indexed`` (boolean) columns.  The entire ordered rule table
    becomes one CASE expression per output column — evaluation is a
    single codegen'd projection, embarrassingly parallel at any corpus
    size."""
    if not rules:
        raise ValueError("empty rule table")
    preds = [compile_expr(r.expr) for r in rules]
    idx_chain = F.when(preds[0], F.lit(0))
    for i, p in enumerate(preds[1:], start=1):
        idx_chain = idx_chain.when(p, F.lit(i))
    rule_idx = idx_chain.otherwise(F.lit(-1)).cast("long")
    df = df.withColumn("rule_idx", rule_idx)
    prio_chain = F.when(F.col("rule_idx") == 0, F.lit(rules[0].priority))
    ix_chain = F.when(F.col("rule_idx") == 0, F.lit(rules[0].index))
    for i, r in enumerate(rules[1:], start=1):
        prio_chain = prio_chain.when(F.col("rule_idx") == i, F.lit(r.priority))
        ix_chain = ix_chain.when(F.col("rule_idx") == i, F.lit(r.index))
    return df.withColumn(
        "priority", prio_chain.otherwise(F.lit(-1)).cast("long")
    ).withColumn("indexed", ix_chain.otherwise(F.lit(False)))


def filter_verdicts(df: DataFrame, rules: list[UrlRule]) -> DataFrame:
    """Rule-table rollup: docs per (rule_idx, priority, indexed) — the
    'how is my crawl policy partitioning the corpus' report."""
    return (
        apply_url_filters(df, rules)
        .groupBy("rule_idx", "priority", "indexed")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("rule_idx")
    )
