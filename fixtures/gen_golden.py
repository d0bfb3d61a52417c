"""Generate fixtures/queries.jsonl — frozen golden top-k (FIXTURES.md §3,
the qa.cpp golden-regression analog).

Expected results come from a PURE-PYTHON BM25 oracle over the
deterministic synthetic corpus — fully independent of the Spark engine
(no shared scoring code), so an engine regression cannot regenerate
itself into the fixtures.  Docs are keyed by ``commit`` (unique sha1)
because doc_id hashing is engine-side.

Usage: python fixtures/gen_golden.py [n_docs]
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_source_search_engine_spark.sources.corpus import _gen_batch  # noqa: E402

K1, B = 1.2, 0.75
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 300
K = 10

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")
_CAMEL_RE = re.compile(r"[A-Z]+(?=[A-Z][a-z0-9])|[A-Z]?[a-z0-9]+|[A-Z]+|[0-9]+")


def tokenize(text: str) -> list[str]:
    """Independent reimplementation of the code-aware tokenizer contract:
    word token + sub-tokens when splitting changes anything."""
    out = []
    for m in _WORD_RE.finditer(text):
        tok = m.group(0)
        out.append(tok.lower())
        parts = []
        for piece in tok.split("_"):
            parts.extend(mm.group(0).lower() for mm in _CAMEL_RE.finditer(piece))
        if len(parts) > 1 or (parts and parts[0] != tok.lower()):
            out.extend(parts)
    return out


def field_terms(row) -> set[str]:
    ft = {f"lang:{row.lang.lower()}", f"repo:{row.repo.lower()}"}
    for m in re.finditer(r"[a-z0-9_]+", row.path.lower()):
        ft.add(f"path:{m.group(0)}")
    return ft


def main() -> None:
    pdf = _gen_batch(np.arange(N_DOCS))
    docs = []
    for row in pdf.itertuples(index=False):
        toks = tokenize(row.content)
        docs.append(
            {
                "commit": row.commit,
                "doclen": len(toks),
                "tf": _count(toks),
                "fields": field_terms(row),
                "tokens": toks,
            }
        )
    n = len(docs)
    avgdl = sum(d["doclen"] for d in docs) / n
    df = {}
    for d in docs:
        for t in set(d["tf"]) | d["fields"]:
            df[t] = df.get(t, 0) + 1

    def tf_of(d, t):
        if t in d["tf"]:
            return d["tf"][t]
        return 1 if t in d["fields"] else 0

    def score(d, terms):
        s, matched = 0.0, 0
        for t in terms:
            tf = tf_of(d, t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1 + (n - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5))
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * d["doclen"] / avgdl))
        return s, matched

    def run(pos, neg=(), mode="and", phrase=None):
        out = []
        for d in docs:
            s, m = score(d, pos)
            need = len(pos) if mode == "and" else 1
            if m < need:
                continue
            if any(tf_of(d, t) for t in neg):
                continue
            if phrase:
                toks = d["tokens"]
                idxs = [i for i, t in enumerate(toks) if t == phrase[0]]
                ok = any(
                    all(
                        i + j < len(toks) and toks[i + j] == phrase[j]
                        for j in range(len(phrase))
                    )
                    for i in idxs
                )
                if not ok:
                    continue
            out.append((d["commit"], s))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:K]

    queries = [
        ("g01", "binarysearchtree", ["binarysearchtree"], (), "and", None),
        ("g02", "quasarneedle", ["quasarneedle"], (), "and", None),
        ("g03", "def return", ["def", "return"], (), "and", None),
        ("g04", "import class self", ["import", "class", "self"], (), "and", None),
        ("g05", "def return lang:python", ["def", "return", "lang:python"], (), "and", None),
        ("g06", "def -return", ["def"], ("return",), "and", None),
        ("g07", "fn OR func", ["fn", "func"], (), "or", None),
        ("g08", "id0x OR xylophonequery", ["id0x", "xylophonequery"], (), "or", None),
        ("g09", "repo:org0/proj0 def", ["repo:org0/proj0", "def"], (), "and", None),
        ("g10", "path:src return", ["path:src", "return"], (), "and", None),
    ]
    out_path = os.path.join(os.path.dirname(__file__), "queries.jsonl")
    with open(out_path, "w") as f:
        for qid, text, pos, neg, mode, phrase in queries:
            expect = run(pos, neg, mode, phrase)
            f.write(
                json.dumps(
                    {
                        "qid": qid,
                        "text": text,
                        "kind": mode,
                        "k": K,
                        "n_docs": N_DOCS,
                        "expect": [
                            {"commit": c, "score": round(s, 6)} for c, s in expect
                        ],
                    }
                )
                + "\n"
            )
    print(f"wrote {out_path} ({len(queries)} queries over {N_DOCS} docs)")


def _count(toks):
    d = {}
    for t in toks:
        d[t] = d.get(t, 0) + 1
    return d


if __name__ == "__main__":
    main()
