"""Pure-Python reference oracle for BM25 search semantics.

Independent of the Spark engine's execution path (no postings codec, no
sharding, no pruning): a dict-based inverted index + the exact Lucene
BM25 formula (k1=1.2, b=0.75). Golden tests compare the engine's
(doc_id, score) output against this, per SURVEY.md §5.

It intentionally shares ONE component with the engine — the analyzer —
whose own behavior is pinned separately by tests/test_analyzer.py
golden tokens (the reference's tests/test_analyzer.py discipline).
"""
from __future__ import annotations

import math
from collections import Counter, defaultdict

from openaleph_search_spark.analysis.analyzer import analyze_text

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, docs: dict[int, str]):
        """docs: doc_id -> content."""
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.positions: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        for doc_id, content in docs.items():
            toks = analyze_text(content)
            # doc length = #positions (ZWJ same-position terms count once,
            # Lucene discountOverlaps) — mirrors index/build.py
            self.doc_len[doc_id] = (max(p for _, p in toks) + 1) if toks else 0
            tf = Counter(t for t, _ in toks)
            for term, f in tf.items():
                self.postings[term][doc_id] = f
            for term, pos in toks:
                self.positions[term].setdefault(doc_id, []).append(pos)
        self.n_docs = len(docs)
        self.avgdl = (sum(self.doc_len.values()) / self.n_docs
                      if self.n_docs else 0.0)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def tfnorm(self, tf: float, dl: float) -> float:
        return tf / (tf + K1 * (1 - B + B * dl / self.avgdl))

    def term_scores(self, term: str) -> dict[int, float]:
        idf = self.idf(term)
        return {d: idf * self.tfnorm(f, self.doc_len[d])
                for d, f in self.postings.get(term, {}).items()}

    def and_query(self, terms: list[str]) -> dict[int, float]:
        maps = [self.term_scores(t) for t in terms]
        if not maps:
            return {}
        common = set(maps[0])
        for m in maps[1:]:
            common &= set(m)
        return {d: sum(m[d] for m in maps) for d in common}

    def or_query(self, terms: list[str]) -> dict[int, float]:
        out: dict[int, float] = defaultdict(float)
        for t in terms:
            for d, s in self.term_scores(t).items():
                out[d] += s
        return dict(out)

    def not_filter(self, scores: dict[int, float],
                   terms: list[str]) -> dict[int, float]:
        banned = set()
        for t in terms:
            banned |= set(self.postings.get(t, {}))
        return {d: s for d, s in scores.items() if d not in banned}

    def phrase_query(self, terms: list[str], slop: int = 0
                     ) -> dict[int, float]:
        """tf = #anchors of term0 with all terms aligned within slop;
        idf = Σ term idfs (matches the engine's pinned semantics)."""
        cand = None
        for t in terms:
            docs = set(self.positions.get(t, {}))
            cand = docs if cand is None else cand & docs
        out = {}
        idf_sum = sum(self.idf(t) for t in set(terms))
        for d in cand or ():
            adj = [set(p - i for p in self.positions[t][d])
                   for i, t in enumerate(terms)]
            if slop == 0:
                common = set.intersection(*adj)
                tf = len(common)
            else:
                tf = sum(
                    1 for a in sorted(adj[0])
                    if all(min(abs(x - a) for x in s) <= slop
                           for s in adj[1:]))
            if tf:
                out[d] = idf_sum * self.tfnorm(tf, self.doc_len[d])
        return out

    @staticmethod
    def topk(scores: dict[int, float], k: int) -> list[tuple[int, float]]:
        return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
