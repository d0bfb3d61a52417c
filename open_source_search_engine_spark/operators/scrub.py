"""PII detection and redaction for training-data pipelines.

A pretraining corpus must be scrubbed of obvious personal identifiers
before anything trains on it.  Everything here is a pure column
expression (regexp_count / regexp_replace → whole-stage codegen, no
UDF), so scrubbing runs at scan speed over 100 TB and composes with the
other curation stages (dedup → decontam → scrub → quality → sample →
pack) as one Catalyst plan.

The patterns are deliberately written in the common subset of Java
regex (Spark) and RE2 (DuckDB / Go / most scanners): character classes,
bounded repetition, ``\\b`` / ``\\d`` only — no lookaround, no
backreferences — so the driver's SQL oracle replays detection and
redaction byte-identically.

Redaction order is fixed (email → ipv4 → hex key): an earlier
replacement must not manufacture or destroy a later match, and both
engines apply the same chain.  Reference analog: none (the reference
indexes pages verbatim); this is one of the brief's first-class
LLM-pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered (name, pattern, replacement) — THE scrub chain; oracle replays
# the same three regexp_replace calls in the same order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # 32+ hex chars: md5/sha/api-token shaped secrets (any letter case)
    ("hexkey", r"\b[0-9a-fA-F]{32,}\b", "<KEY>"),
]


def pii_count(col: Column, kind: str) -> Column:
    """Match count for one PII kind ('email' | 'ipv4' | 'hexkey')."""
    for name, pat, _rep in PII_PATTERNS:
        if name == kind:
            return F.regexp_count(col, F.lit(pat))
    raise ValueError(f"unknown PII kind {kind!r}")


def scrub_pii(col: Column) -> Column:
    """Redact all PII kinds, in the fixed chain order."""
    out = col
    for _name, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_staged_counts(col: Column) -> list[tuple[str, Column]]:
    """Per-kind match counts taken on the SAME staged text the scrub
    chain sees: kind k is counted AFTER kinds 1..k-1 were redacted.
    Counting every kind on the raw text instead would double-count spans
    matched by two patterns ('1.2.3.4@corp.com' is one email replacement,
    but the raw text also matches the ipv4 pattern), so an audit
    reconciling n_pii totals against redactions performed would never
    balance.  Staged counts sum EXACTLY to the number of replacements
    scrub_pii makes."""
    out = []
    staged = col
    for name, pat, rep in PII_PATTERNS:
        out.append((name, F.regexp_count(staged, F.lit(pat))))
        staged = F.regexp_replace(staged, pat, rep)
    return out


def pii_report(col: Column) -> list[Column]:
    """Per-kind count columns ``n_<kind>`` plus ``n_pii`` total —
    select-list helpers for a corpus audit pass.  Counts are staged
    (see pii_staged_counts): n_pii == replacements scrub_pii performs."""
    staged = pii_staged_counts(col)
    counts = [c.alias(f"n_{name}") for name, c in staged]
    total = None
    for _name, c in staged:
        total = c if total is None else total + c
    return counts + [total.alias("n_pii")]
