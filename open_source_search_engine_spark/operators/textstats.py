"""Text analytics for training-data pipelines (language-ID heuristic,
quality scoring, token counting, document fingerprinting).

Reference analogs: Language.cpp/Lang.cpp n-gram language id (SURVEY.md
§2.8 X7), Spam.cpp repetition scoring (X13), getContentHash32 (X12).
Everything here is a pure column expression (whole-stage codegen) so it
runs at scan speed over 100 TB; nothing drops to Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny embedded stopword list — the StopWords.cpp analog (X4); used as the
# English signal for the language-ID heuristic
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this",
]


def tokens_simple(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9]+"), F.lit(0))


def token_count(tokens: Column) -> Column:
    return F.size(tokens)


def distinct_token_count(tokens: Column) -> Column:
    return F.size(F.array_distinct(tokens))


def stopword_ratio(tokens: Column) -> Column:
    """fraction of tokens that are English stopwords (quality + lang-ID)."""
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_sw = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(tokens) > 0, n_sw / F.size(tokens)).otherwise(F.lit(0.0))


def avg_token_len(tokens: Column) -> Column:
    total = F.aggregate(
        F.transform(tokens, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return F.when(F.size(tokens) > 0, total / F.size(tokens)).otherwise(F.lit(0.0))


def repetition_ratio(tokens: Column) -> Column:
    """1 - distinct/total: the Spam.cpp word-repetition signal (X13)."""
    return F.when(
        F.size(tokens) > 0,
        F.lit(1.0) - F.size(F.array_distinct(tokens)) / F.size(tokens),
    ).otherwise(F.lit(0.0))


def quality_score(tokens: Column) -> Column:
    """composite quality in [0,1]: length band + diversity + stopword
    presence (heuristic weights; deterministic, oracle-expressible)."""
    n = F.size(tokens)
    len_ok = F.when((n >= 10) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    diversity = F.lit(1.0) - repetition_ratio(tokens)
    has_sw = F.when(stopword_ratio(tokens) > 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(F.lit(0.4) * len_ok + F.lit(0.4) * diversity + F.lit(0.2) * has_sw, 4)


def langid_en(tokens: Column, threshold: float = 0.08) -> Column:
    """n-gram-free language-ID heuristic (X7): English iff stopword hit
    ratio exceeds threshold."""
    return F.when(stopword_ratio(tokens) > threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def fingerprint(tokens: Column) -> Column:
    """Polynomial rolling-hash document fingerprint (X12 content-hash
    analog): left fold of h = (h*31 + len(tok)*7 + ascii(tok[0])) mod p.
    Uses only arithmetic both Spark and DuckDB evaluate identically."""
    p = F.lit(1_000_000_007).cast("long")
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda h, t: (h * 31 + F.length(t) * 7 + F.ascii(t)) % p,
    )


# GPT-2-style pre-tokenizer pattern (BPE-ish), restricted to constructs
# Java regex and RE2 evaluate identically (no lookahead): contractions,
# optionally space-prefixed letter runs, digit runs, symbol runs.
BPE_TOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pre-tokens of raw text (NOT lowercased — BPE vocabularies
    are case-sensitive); the token-count proxy a training-data pipeline
    budgets documents with."""
    return F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0))


def punct_ratio(col: Column) -> Column:
    """fraction of non-space characters that are not letters/digits —
    a boilerplate/markup quality signal."""
    nonspace = F.length(F.regexp_replace(col, r"\s+", ""))
    alnum = F.length(F.regexp_replace(col, r"[^\p{L}\p{N}]+", ""))
    return F.when(nonspace > 0, (nonspace - alnum) / nonspace).otherwise(F.lit(0.0))
