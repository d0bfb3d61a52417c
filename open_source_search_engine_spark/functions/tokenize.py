"""Code-aware tokenizer (SURVEY.md §2.8 X2; reference: Words.cpp (set) —
UTF-8 word/punct tokenization — rebuilt for a source-code corpus).

Spark-first shape: one vectorized ``pandas_udf`` returning the token array;
positions are recovered with ``posexplode`` (built-in) rather than inside
Python.  camelCase / snake_case / dotted identifiers are split so that
``getUserName`` indexes as [getusername, get, user, name] the way the
reference indexes both phrase and word forms (Phrases.cpp analog X3 is the
separate bigram path in ``bigrams_expr``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.column import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# identifier-ish runs: letters/digits/underscore
_WORD_RE = re.compile(r"[A-Za-z0-9_]+")
_CAMEL_RE = re.compile(r"[A-Z]+(?=[A-Z][a-z0-9])|[A-Z]?[a-z0-9]+|[A-Z]+|[0-9]+")

# simple-mode regex used for parity with SQL oracles (whitespace corpora)
SIMPLE_TOKEN_RE = r"[a-z0-9_]+"


def _split_identifier(tok: str) -> list[str]:
    """``getUserName`` -> [get, user, name]; ``snake_case`` -> [snake, case]."""
    parts: list[str] = []
    for piece in tok.split("_"):
        if not piece:
            continue
        parts.extend(m.group(0).lower() for m in _CAMEL_RE.finditer(piece))
    return parts


def _tokenize_one(text: str, code_aware: bool) -> list[str]:
    out: list[str] = []
    for m in _WORD_RE.finditer(text):
        tok = m.group(0)
        low = tok.lower()
        out.append(low)
        if code_aware:
            parts = _split_identifier(tok)
            # only emit sub-tokens when splitting actually split something
            if len(parts) > 1 or (parts and parts[0] != low):
                out.extend(parts)
    return out


@pandas_udf(ArrayType(StringType()))
def tokenize_code(content: pd.Series) -> pd.Series:
    """Arrow-vectorized code tokenizer: word tokens + identifier sub-tokens."""
    return content.map(lambda t: _tokenize_one(t or "", True))


@pandas_udf(ArrayType(StringType()))
def tokenize_simple(content: pd.Series) -> pd.Series:
    """Plain lowercase word tokenizer (no identifier splitting)."""
    return content.map(lambda t: _tokenize_one(t or "", False))


def tokens_col(colname: str) -> Column:
    """JVM-side simple tokenizer: identical semantics to DuckDB's
    ``regexp_extract_all(lower(x), '[a-z0-9_]+')`` — used on the oracle-checked
    path so the whole pipeline stays inside whole-stage codegen (no Python).
    """
    return F.regexp_extract_all(F.lower(F.col(colname)), F.lit(SIMPLE_TOKEN_RE), F.lit(0))


def bigrams_col(tokens: Column) -> Column:
    """Adjacent-pair bigram terms (Phrases.cpp analog, X3): built-ins only —
    zip the token array with itself shifted by one."""
    return F.zip_with(
        F.slice(tokens, 1, F.greatest(F.size(tokens) - 1, F.lit(0))),
        F.slice(tokens, 2, F.greatest(F.size(tokens) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
