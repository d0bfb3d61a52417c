"""Hash/identity helpers (SURVEY.md §2.8 X1/X12).

Reference: termId = hash64Lower_utf8(word) (hash.h/hash.cpp g_hashtab);
docId = 38-bit probable docId from url hash.  Internal consistency is the
contract, not hash-for-hash equality, so the rebuild uses Spark's native
``xxhash64`` (JVM-side, codegen'd) and keeps every hash derivation in one
place.  Fielded terms compose prefix + token the way hash64h(prefixHash,
wordHash) does: ``xxhash64("lang:py")`` (SURVEY §2.2 F4).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def term_id_col(term: Column) -> Column:
    """48-bit-termId analog: xxhash64 of the (already lowercased) token."""
    return F.xxhash64(term)


def field_term(prefix: str, token: Column) -> Column:
    """Fielded term string, e.g. lang:python, repo:org1/proj42."""
    return F.concat(F.lit(prefix + ":"), token)


def doc_id_col(repo: Column, path: Column, commit: Column) -> Column:
    """38-bit-docId analog: one stable 64-bit id per (repo,path,commit)."""
    return F.xxhash64(repo, path, commit)


def content_sha256(content: Column) -> Column:
    """North-rule per-row invariant: sha2(content, 256) hex digest."""
    return F.sha2(content, 256)
