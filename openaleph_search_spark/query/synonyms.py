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
from ..index.build import FIELD_SEP
from .ir import Bool, Node, PhraseLeaf, PrefixLeaf, TermLeaf

# reference ExpandNameSynonymsMixin boosts (queries.py:74-75): the
# keyword-side legs score below the exact term
SYMBOL_BOOST = 0.5
KEY_BOOST = 0.3


class SynonymTable:
    def __init__(self, groups: list[list[str]],
                 symbols: dict[str, str] | None = None,
                 symbol_field: str = "name_symbols",
                 key_field: str | None = None):
        """``groups``: same-position text synonyms (Q23). ``symbols``:
        folded token → symbol id (the wikidata-symbol-dictionary role,
        caller-supplied — reference get_name_symbols); matching terms
        gain a ``symbol_field`` keyword leg at boost 0.5. ``key_field``
        names an indexed name-key field; terms with a name_key gain a
        leg at boost 0.3 (reference queries.py:56-108)."""
        self.map: dict[str, list[str]] = {}
        for group in groups:
            folded = sorted({fold_text(t.strip().lower())
                             for t in group if t.strip()})
            for t in folded:
                self.map[t] = folded
        # symbol ids pass through the same analyzer as the indexed
        # keyword field (lowercase/fold), so the leg term matches
        self.symbols = {fold_text(k.strip().lower()):
                        fold_text(str(v).strip().lower())
                        for k, v in (symbols or {}).items()}
        self.symbol_field = symbol_field
        self.key_field = key_field

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
            legs: list[TermLeaf] = []
            if node.field is None and FIELD_SEP not in node.term:
                # keyword-side legs only expand free-text terms
                # (reference EntitiesQuery path)
                sym = self.symbols.get(node.term)
                if sym is not None:
                    legs.append(TermLeaf(
                        f"{self.symbol_field}{FIELD_SEP}{sym}",
                        node.boost * SYMBOL_BOOST))
                if self.key_field:
                    from ..analysis.names import name_key
                    k = name_key(node.term)
                    if k:
                        legs.append(TermLeaf(
                            f"{self.key_field}{FIELD_SEP}{k}",
                            node.boost * KEY_BOOST))
            if len(group) == 1 and not legs:
                return TermLeaf(group[0], node.boost, node.field)
            return Bool(should=[*(TermLeaf(t, node.boost, node.field)
                                  for t in group), *legs])
        if isinstance(node, PhraseLeaf) or isinstance(node, PrefixLeaf):
            return node  # phrases/prefixes stay literal (reference Q23)
        if isinstance(node, Bool):
            return Bool(must=[self.rewrite(n) for n in node.must],
                        should=[self.rewrite(n) for n in node.should],
                        must_not=[self.rewrite(n) for n in node.must_not],
                        min_should=node.min_should)
        return node
