"""Query IR — the logical search plan.

The reference compiles parser args into Elasticsearch bool-DSL JSON
(/root/reference/openaleph_search/query/base.py:135-144,469-487); our
compiler targets this dataclass IR instead, and the executor lowers it
onto postings DataFrames.
"""
from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    """Base class for scored query-tree nodes."""

    def leaves(self) -> list["TermLeaf | PhraseLeaf | PrefixLeaf"]:
        raise NotImplementedError


@dataclass
class TermLeaf(Node):
    """Single analyzed term (scored, BM25). ``field`` None = the
    default content field; otherwise resolved by the engine to a
    field-prefixed dictionary term (Lucene field:term model)."""
    term: str
    boost: float = 1.0
    field: str | None = None

    def leaves(self):
        return [self]


@dataclass
class PhraseLeaf(Node):
    """Positional phrase ("..." / "..."~slop); ES match_phrase analogue.

    Score: Lucene PhraseQuery — idf = Σ idf(term), tf = phrase freq
    (number of in-order alignments with span width ≤ len + slop).
    """
    terms: list[str]
    slop: int = 0
    boost: float = 1.0
    field: str | None = None

    def leaves(self):
        return [self]


@dataclass
class PrefixLeaf(Node):
    """Trailing-wildcard term (``vla*``); expands against the term
    dictionary at plan time (ES query_string prefix rewrite)."""
    prefix: str
    boost: float = 1.0
    field: str | None = None
    expanded: list[str] | None = None  # filled by the planner
    max_expansions: int = 50

    def leaves(self):
        return [self]


@dataclass
class WildcardLeaf(Node):
    """Infix/leading wildcard term (``te*m``, ``t?m``, ``*erm``):
    expands against the term dictionary at plan time, capped like
    prefix rewrite. Leading wildcards are gated behind the engine's
    ``allow_leading_wildcard`` (reference query/base.py:62,
    settings.py:139 — default off)."""
    pattern: str  # analyzed literals with * / ? metacharacters kept
    boost: float = 1.0
    field: str | None = None
    expanded: list[str] | None = None  # filled by the planner
    max_expansions: int = 50

    def leaves(self):
        return [self]


@dataclass
class Bool(Node):
    """should/must/must_not composition; additive BM25 scoring
    (reference Q9, query/util.py:20-26). ``min_should`` defaults to 1
    when there are no musts (pure disjunction gate)."""
    must: list[Node] = field(default_factory=list)
    should: list[Node] = field(default_factory=list)
    must_not: list[Node] = field(default_factory=list)
    # minimum_should_match (reference Q9/Q16): only meaningful when
    # there are no musts; None → 1 (pure disjunction gate)
    min_should: int | None = None

    def leaves(self):
        out = []
        for n in (*self.must, *self.should, *self.must_not):
            out.extend(n.leaves())
        return out


@dataclass
class DisMax(Node):
    """Best-fields disjunction max (ES dis_max / multi-field
    query_string, reference Q2 queries.py:112-118): score = max over
    per-field children (tie_breaker 0)."""
    children: list[Node] = field(default_factory=list)

    def leaves(self):
        out = []
        for n in self.children:
            out.extend(n.leaves())
        return out


@dataclass
class MatchAll(Node):
    """Empty query → match_all, no scoring, _doc order
    (reference base.py:50-53,373-374)."""

    def leaves(self):
        return []
