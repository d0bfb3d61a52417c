"""C4-style heuristic corpus filters (Raffel et al. 2020, §2.2).

The classic line- and page-level cleaning battery every web-scale
pretraining corpus runs before tokenization:

- line kept iff it ends in a terminal punctuation mark, has at least
  ``min_words`` words, and does not mention "javascript";
- page kept iff at least ``min_lines`` lines survive AND the page
  contains no "lorem ipsum", no curly brace, and no bad-list word.

Everything is a pure column expression over a pre-split ``array<string>``
lines column — ``filter``/``exists`` array lambdas and regexps in the
Java-regex ∩ RE2 subset — so the whole battery fuses into the scan's
whole-stage codegen and runs at scan speed over 100 TB with no shuffle
(the only shuffle a caller adds is their final aggregate).  The word
definition is the house token regex (``[a-z0-9]+``), so a DuckDB oracle
replays every rule byte-identically with ``list_filter``/``list_count``.

Reference analog: none — the reference indexes fetched pages verbatim
(XmlDoc.cpp) and gates on spam/repetition only (Spam.cpp, SURVEY.md
§2.8 X13).  This is one of the brief's first-class LLM-pipeline
operators (training-data curation beyond the reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word = house token regex (entry_queries.TOKEN_RE); duplicated here as a
# literal so the operator module stays import-light
WORD_RE = "[a-z0-9]+"

# line must END in terminal punctuation (C4 rule 1); trailing spaces
# tolerated.  Kept to the Java-regex ∩ RE2 subset: char class + anchors.
TERMINAL_RE = '[.!?"] *$'

# tiny embedded bad-word list (C4 rule 3 uses the "List of Dirty, Naughty
# ..." list; any fixed list exercises the rule — ours is synthetic so the
# fixture can inject hits deterministically)
BAD_WORDS = ["badword", "zzzprofanity"]

MIN_WORDS_PER_LINE = 3
MIN_LINES_PER_PAGE = 3


def line_word_count(line: Column) -> Column:
    """Number of words on one line (house token regex)."""
    return F.size(F.regexp_extract_all(F.lower(line), F.lit(WORD_RE), F.lit(0)))


def line_kept(line: Column, min_words: int = MIN_WORDS_PER_LINE) -> Column:
    """C4 line rule: terminal punctuation AND >= min_words words AND no
    'javascript' mention (rules 1, 2b, 4)."""
    return (
        line.rlike(TERMINAL_RE)
        & (line_word_count(line) >= min_words)
        & ~F.lower(line).contains("javascript")
    )


def kept_lines(lines: Column, min_words: int = MIN_WORDS_PER_LINE) -> Column:
    """Filter a page's line array down to the C4-kept lines."""
    return F.filter(lines, lambda l: line_kept(l, min_words))


def page_has_bad_word(text: Column) -> Column:
    """C4 rule 3: any bad-list word present as a whole word."""
    pat = r"\b(" + "|".join(BAD_WORDS) + r")\b"
    return F.lower(text).rlike(pat)


def page_kept(
    text: Column,
    n_kept_lines: Column,
    min_lines: int = MIN_LINES_PER_PAGE,
) -> Column:
    """C4 page rule: enough surviving lines (rule 2a) and none of the
    page-level poison markers (rules 3, 5, 6)."""
    low = F.lower(text)
    return (
        (n_kept_lines >= min_lines)
        & ~low.contains("lorem ipsum")
        & ~text.contains("{")
        & ~page_has_bad_word(text)
    )


def with_c4_columns(
    df: "DataFrame",
    lines_col: str,
    text_col: str,
    min_words: int = MIN_WORDS_PER_LINE,
    min_lines: int = MIN_LINES_PER_PAGE,
) -> "DataFrame":
    """The full battery over a pages DataFrame, STAGED.

    ``lines_col`` holds each page pre-split into lines
    (``array<string>``) and ``text_col`` the raw page (for the
    page-level substring rules).  Adds four columns — ``n_lines``,
    ``n_kept_lines``, ``page_kept``, and ``clean_text`` (kept lines
    re-joined; empty string, not NULL, for a filtered page so checksums
    are total) — each intermediate staged as a NAMED projection: the
    kept-lines filter lambda is O(lines) and is consumed by three
    outputs, and an inline expression referenced k times re-evaluates k
    times (CollapseProject keeps non-cheap exprs as real projections, so
    each select below is a genuine evaluate-once barrier).
    """
    kept = "_c4_kept"
    while kept in df.columns:
        kept += "_"
    staged = df.withColumn(kept, kept_lines(F.col(lines_col), min_words))
    staged = staged.withColumns(
        {
            "n_lines": F.size(F.col(lines_col)),
            "n_kept_lines": F.size(F.col(kept)),
        }
    )
    staged = staged.withColumn(
        "page_kept",
        page_kept(F.col(text_col), F.col("n_kept_lines"), min_lines),
    )
    return staged.withColumn(
        "clean_text",
        F.when(F.col("page_kept"), F.array_join(F.col(kept), " ")).otherwise(
            F.lit("")
        ),
    ).drop(kept)
