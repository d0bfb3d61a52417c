"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

North-rule input table: ``(repo, path, commit, lang, content)``.  Content is
a per-language keyword skeleton plus identifiers drawn zipf(s=1.2) from a
50k-term vocabulary — the zipf tail guarantees heavy-term skew so the salted
repartition path (SURVEY.md §4.1 "Skew handling") is actually exercised —
plus rare planted "needle" tokens for exact-hit tests.

Generation is fully distributed: ``spark.range(n) -> mapInPandas``, each row
derived purely from its index (seed 42, no wall clock, no driver-side
materialization) so the same code generates 2k docs in tests or 10^12 files
on a cluster by changing ``n_docs``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
VOCAB_SIZE = 50_000
ZIPF_S = 1.2

LANGS = ["python", "javascript", "java", "cpp", "go", "rust", "ruby"]
LANG_WEIGHTS = np.array([0.30, 0.20, 0.15, 0.12, 0.10, 0.08, 0.05])
LANG_EXT = {
    "python": "py",
    "javascript": "js",
    "java": "java",
    "cpp": "cpp",
    "go": "go",
    "rust": "rs",
    "ruby": "rb",
}
LANG_KEYWORDS = {
    "python": ["def", "return", "import", "class", "self", "for", "if", "none"],
    "javascript": ["function", "const", "let", "return", "var", "async", "await"],
    "java": ["public", "static", "void", "class", "return", "new", "final"],
    "cpp": ["include", "int", "return", "const", "void", "template", "namespace"],
    "go": ["func", "return", "package", "import", "defer", "chan", "struct"],
    "rust": ["fn", "let", "mut", "impl", "pub", "match", "struct"],
    "ruby": ["def", "end", "class", "module", "require", "attr", "nil"],
}

# Needle tokens planted in known docs (exact-hit golden tests).
NEEDLES = {
    "xylophonequery": [7],
    "quasarneedle": [3, 11],
    "binarysearchtree": [0, 5, 9, 21],
}


_VOCAB_CACHE: list[str] | None = None


def _vocab() -> list[str]:
    """Full 50k-word deterministic vocabulary, computed once per process
    (sha1 per token during generation dominated synth time before)."""
    global _VOCAB_CACHE
    if _VOCAB_CACHE is None:
        _VOCAB_CACHE = [
            f"id{i}x{hashlib.sha1(f'vocab:{SEED}:{i}'.encode()).hexdigest()[:4]}"
            for i in range(VOCAB_SIZE)
        ]
    return _VOCAB_CACHE


def _vocab_word(idx: int) -> str:
    """Deterministic identifier for vocab slot ``idx`` (0 is most frequent)."""
    return _vocab()[idx]


# Precomputed zipf CDF over vocab ranks (module-level: pickled once into the
# mapInPandas closure, shared by all batches on an executor).
_RANKS = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
_ZIPF_P = _RANKS**-ZIPF_S
_ZIPF_P /= _ZIPF_P.sum()
_ZIPF_CDF = np.cumsum(_ZIPF_P)
_LANG_CDF = np.cumsum(LANG_WEIGHTS / LANG_WEIGHTS.sum())
# float cumsum tops out just UNDER 1.0 (e.g. 1 - 4e-15): a uniform draw
# above it would searchsorted past the last bucket and index out of
# bounds — invisible at 20k docs, expected several times at the 10^12
# files this module advertises, and deterministic across task retries
# (the row seeds its own rng).  Pin the last edge to exactly 1.0.
_ZIPF_CDF[-1] = 1.0
_LANG_CDF[-1] = 1.0


def _gen_batch(ids: np.ndarray) -> pd.DataFrame:
    out = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i in ids.tolist():
        rng = np.random.default_rng(SEED * 1_000_003 + i)
        repo = f"org{i % 7}/proj{i % 97}"
        lang = LANGS[int(np.searchsorted(_LANG_CDF, rng.random()))]
        n_tokens = int(30 + rng.random() ** 2 * 2970)  # 30..3000, short-skewed
        # identifiers: zipf draw via inverse-CDF (vectorized)
        vocab = _vocab()
        draws = np.searchsorted(_ZIPF_CDF, rng.random(n_tokens))
        words = [vocab[d] for d in draws.tolist()]
        # interleave language keywords every ~6 tokens
        kws = LANG_KEYWORDS[lang]
        for j in range(0, n_tokens, 6):
            words[j] = kws[(i + j // 6) % len(kws)]
        # plant needles
        for needle, docs in NEEDLES.items():
            if i in docs:
                words.insert(int(rng.integers(0, len(words))), needle)
        name = _vocab_word(int(draws[0]))
        path = f"src/{_vocab_word(int(draws[-1]))[:8]}/{name[:12]}.{LANG_EXT[lang]}"
        commit = hashlib.sha1(f"{repo}:{path}:{i}".encode()).hexdigest()
        content = " ".join(words)
        out["repo"].append(repo)
        out["path"].append(path)
        out["commit"].append(commit)
        out["lang"].append(lang)
        out["content"].append(content)
    return pd.DataFrame(out)


def synth_documents(
    spark: SparkSession, n_docs: int, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` source files."""
    if partitions is None:
        partitions = max(4, min(256, n_docs // 500 or 4))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy())

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema="repo string, path string, commit string, lang string, content string")
    )
