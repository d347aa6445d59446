"""Search-time synonym expansion (reference Q22/Q23).

The reference swaps in an ``icu-search-synonyms`` analyzer whose
synonym_graph FST rewrites query tokens at search time — the index is
never touched (/root/reference/openaleph_search/index/mapping.py:108-116,
docs/synonyms.md). Here the FST becomes a broadcast-sized driver dict:
each query term expands to its synonym group as a same-position
disjunction (each alternative scored with its own idf).

Synonym files use the reference's comma-separated line format
(/root/reference/tests/fixtures/person_name_synonyms.txt):

    schkuro, shkuro, škuro
    vladimir, wladimir, владимир
"""
from __future__ import annotations

from ..analysis.analyzer import fold_text
from .ir import Bool, Node, PhraseLeaf, PrefixLeaf, TermLeaf


class SynonymTable:
    def __init__(self, groups: list[list[str]]):
        self.map: dict[str, list[str]] = {}
        for group in groups:
            folded = sorted({fold_text(t.strip().lower())
                             for t in group if t.strip()})
            for t in folded:
                self.map[t] = folded

    @classmethod
    def from_file(cls, path: str) -> "SynonymTable":
        groups = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    groups.append(line.split(","))
        return cls(groups)

    def expand_term(self, term: str) -> list[str]:
        return self.map.get(term, [term])

    def rewrite(self, node: Node) -> Node:
        """Rewrite a parsed query tree, expanding every term leaf into
        its synonym group (no-op for terms without synonyms)."""
        if isinstance(node, TermLeaf):
            group = self.expand_term(node.term)
            if len(group) == 1:
                return TermLeaf(group[0], node.boost, node.field)
            return Bool(should=[TermLeaf(t, node.boost, node.field)
                                for t in group])
        if isinstance(node, PhraseLeaf) or isinstance(node, PrefixLeaf):
            return node  # phrases/prefixes stay literal (reference Q23)
        if isinstance(node, Bool):
            return Bool(must=[self.rewrite(n) for n in node.must],
                        should=[self.rewrite(n) for n in node.should],
                        must_not=[self.rewrite(n) for n in node.must_not],
                        min_should=node.min_should)
        return node
