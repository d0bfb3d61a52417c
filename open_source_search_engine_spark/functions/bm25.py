"""The ONE copy of the BM25 scoring constants and closed forms.

Every scoring surface — the exhaustive plan's column math
(plans/exec.py), the WAND kernel's bounds and per-doc scores
(operators/topk.py), and the build-time block metadata
(operators/build.py) — must use the SAME k1/b and idf formula, or the
documented rank-identical parity between the paths (and against the
DuckDB oracles, which hard-code these values in SQL) silently breaks.
Reference analog: Posdb.cpp score math, SURVEY.md §2.8 X17.
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75


def py_idf(df_: int, n_docs: float) -> float:
    """ln(1 + (N - df + 0.5)/(df + 0.5)) — the engine's idf."""
    return math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))
