"""Query parser (SURVEY.md §3.1 stage 3; reference Query.cpp set2 ->
setQWords -> setQTerms, ~7k LoC of C++ reduced to a small grammar).

Supported surface (v1):
  term term            conjunctive AND (default, like the reference)
  -term                negation (F3): doc dropped if term present
  field:term           fielded restriction (F4): lang:, repo:, path:
  a OR b               or-group (U1/U3): group matches if any member matches
  "a b"                quoted phrase (J4): adjacent positions required

Each positive unit becomes a Group (the QueryTermInfo analog, U3): members
are OR'd within the group, groups are AND'd across.  Negative terms form
their own list (anti-join side).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..functions.tokenize import _tokenize_one

FIELD_PREFIXES = ("lang", "repo", "path", "site", "url", "intitle", "anchor")


@dataclass(frozen=True)
class Term:
    text: str  # normalized token, possibly "lang:python" fielded form
    phrase: tuple[str, ...] = ()  # >1 tokens => positional phrase
    # member weight inside an OR-group (1.0 for user terms; <1 for
    # synonym-expanded members — Synonyms.cpp m_weights analog, X5)
    weight: float = 1.0


@dataclass
class Group:
    members: list[Term]


@dataclass
class QueryPlan:
    groups: list[Group] = field(default_factory=list)  # AND of OR-groups
    negatives: list[Term] = field(default_factory=list)
    raw: str = ""

    @property
    def all_terms(self) -> list[Term]:
        out = [m for g in self.groups for m in g.members]
        out.extend(self.negatives)
        return out


_TOKEN_RE = re.compile(r'"[^"]*"|\S+')


def plan_key(plan: QueryPlan) -> tuple:
    """Hashable identity of a parsed plan (serp-cache key component)."""
    return (
        tuple(
            tuple((m.text, m.phrase, m.weight) for m in g.members)
            for g in plan.groups
        ),
        tuple(t.text for t in plan.negatives),
    )


def _norm_unit(unit: str) -> Term | None:
    """One query word/phrase -> Term (tokenized same as the index side)."""
    if unit.startswith('"') and unit.endswith('"'):
        toks = _tokenize_one(unit[1:-1], False)
        if not toks:
            return None
        if len(toks) == 1:
            return Term(toks[0])
        return Term(" ".join(toks), phrase=tuple(toks))
    m = re.match(r"^([A-Za-z]+):(.+)$", unit)
    if m and m.group(1).lower() in FIELD_PREFIXES:
        prefix = m.group(1).lower()
        rest = m.group(2).lower()
        # reference query-surface aliases mapped to this corpus's indexed
        # field terms: Gigablast's site: restricts by hostname (the repo
        # plays that role here — F5 whitelist) and url: matches URL words
        # (path: terms).  intitle: has no analog column and stays its own
        # prefix (absent from the dictionary => correctly yields nothing).
        prefix = {"site": "repo", "url": "path"}.get(prefix, prefix)
        # repo values keep their slash; others tokenize to the first token
        if prefix == "repo":
            return Term(f"repo:{rest}")
        toks = _tokenize_one(rest, False)
        if not toks:
            return None
        return Term(f"{prefix}:{toks[0]}")
    toks = _tokenize_one(unit, False)
    if not toks:
        return None
    if len(toks) == 1:
        return Term(toks[0])
    return Term(" ".join(toks), phrase=tuple(toks))


def parse_query(q: str) -> QueryPlan:
    plan = QueryPlan(raw=q)
    units = _TOKEN_RE.findall(q)
    i = 0
    pending: list[Term] | None = None  # current OR chain
    while i < len(units):
        u = units[i]
        if u.upper() == "OR":
            i += 1
            continue
        negative = u.startswith("-") and len(u) > 1
        if negative:
            u = u[1:]
        term = _norm_unit(u)
        if term is None:
            i += 1
            continue
        if negative:
            plan.negatives.append(term)
            pending = None
            i += 1
            continue
        # join into an OR-group if the *next* unit is OR
        if pending is not None:
            pending.append(term)
        else:
            pending = [term]
        nxt_is_or = i + 1 < len(units) and units[i + 1].upper() == "OR"
        if not nxt_is_or:
            plan.groups.append(Group(pending))
            pending = None
        i += 1
    if pending:
        plan.groups.append(Group(pending))
    # dedup: a term repeated in the query must not double-count (the
    # reference collapses repeated QueryTerms); keep first occurrence
    seen: set[tuple] = set()
    uniq_groups = []
    for g in plan.groups:
        key = tuple(sorted((m.text, m.phrase) for m in g.members))
        if key not in seen:
            seen.add(key)
            uniq_groups.append(g)
    plan.groups = uniq_groups
    plan.negatives = list(dict.fromkeys(plan.negatives))
    return plan
