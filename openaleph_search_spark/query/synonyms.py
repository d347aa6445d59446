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
        # members may be MULTI-token ("new york"): keys are the folded
        # member strings; multi-token members match as slop-0 phrases
        # and multi-token query runs collapse to their group (the
        # synonym_graph contract, /root/reference/docs/synonyms.md:103)
        self.map: dict[str, list[str]] = {}
        for group in groups:
            folded = sorted({" ".join(fold_text(t.strip().lower()).split())
                             for t in group if t.strip()})
            for t in folded:
                self.map[t] = folded
        self.max_len = max((k.count(" ") + 1 for k in self.map), default=1)
        # symbol ids pass through the same analyzer as the indexed
        # keyword field (lowercase/fold), so the leg term matches
        self.symbols = {fold_text(k.strip().lower()):
                        fold_text(str(v).strip().lower())
                        for k, v in (symbols or {}).items()}
        self.symbol_field = symbol_field
        self.key_field = key_field

    @staticmethod
    def symbols_from_file(path: str | None = None) -> dict[str, str]:
        """Load a name→symbol dictionary (T8). ``path`` None → the
        bundled test fixture (analysis/data/test_name_symbols.tsv),
        which mirrors the SHAPE of the reference's rigour/wikidata
        symbol tables (transform/entity.py:49-58) with synthetic ids."""
        import os
        if path is None:
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "analysis", "data",
                "test_name_symbols.tsv")
        out: dict[str, str] = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                name, _, sym = line.partition("\t")
                if name and sym:
                    out[name.strip()] = sym.strip()
        return out

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

    def _alt_node(self, member: str, boost: float,
                  field: str | None) -> Node:
        toks = member.split()
        if len(toks) == 1:
            return TermLeaf(toks[0], boost, field)
        # multi-token alternative matches as an exact phrase (the
        # synonym_graph emits the variant's tokens at one graph
        # position → phrase semantics)
        return PhraseLeaf(toks, slop=0, boost=boost, field=field)

    def _keyword_legs(self, term: str, boost: float) -> list[TermLeaf]:
        legs: list[TermLeaf] = []
        sym = self.symbols.get(term)
        if sym is not None:
            legs.append(TermLeaf(f"{self.symbol_field}{FIELD_SEP}{sym}",
                                 boost * SYMBOL_BOOST))
        if self.key_field:
            from ..analysis.names import name_key
            k = name_key(term)
            if k:
                legs.append(TermLeaf(f"{self.key_field}{FIELD_SEP}{k}",
                                     boost * KEY_BOOST))
        return legs

    def _group_node(self, member: str, boost: float, field: str | None,
                    legs: list[TermLeaf]) -> Node:
        alts = [self._alt_node(m, boost, field)
                for m in self.map.get(member, [member])]
        if len(alts) == 1 and not legs:
            return alts[0]
        return Bool(should=[*alts, *legs])

    @staticmethod
    def _plain_term(n: Node) -> bool:
        return (isinstance(n, TermLeaf) and n.field is None
                and FIELD_SEP not in n.term)

    def _collapse_runs(self, nodes: list[Node]) -> list[Node]:
        """Multi-token LHS detection (synonym_graph): consecutive plain
        term leaves matching a multi-token group member collapse into
        the group's disjunction — ``new york`` hits a ``new york, nyc``
        rule even though the parser emitted two TermLeafs."""
        out: list[Node] = []
        i = 0
        while i < len(nodes):
            n = nodes[i]
            hit = None
            if self._plain_term(n) and self.max_len > 1:
                top = min(self.max_len, len(nodes) - i)
                for ln in range(top, 1, -1):  # greedy longest match
                    window = nodes[i:i + ln]
                    if not all(self._plain_term(w)
                               and w.boost == n.boost for w in window):
                        continue
                    phrase = " ".join(w.term for w in window)
                    if phrase in self.map:
                        hit = (ln, phrase)
                        break
            if hit is not None:
                ln, phrase = hit
                out.append(self._group_node(phrase, n.boost, None, []))
                i += ln
            else:
                out.append(self.rewrite(n))
                i += 1
        return out

    def rewrite(self, node: Node) -> Node:
        """Rewrite a parsed query tree, expanding every term leaf into
        its synonym group (no-op for terms without synonyms). Group
        members with spaces become slop-0 phrase alternatives; runs of
        adjacent terms matching a multi-token member collapse to the
        group (both directions of the synonym_graph contract)."""
        if isinstance(node, TermLeaf):
            legs = (self._keyword_legs(node.term, node.boost)
                    if self._plain_term(node) else [])
            group = self.expand_term(node.term)
            if len(group) == 1 and group[0] == node.term and not legs:
                return node
            return self._group_node(node.term, node.boost, node.field,
                                    legs)
        if isinstance(node, PhraseLeaf) or isinstance(node, PrefixLeaf):
            return node  # phrases/prefixes stay literal (reference Q23)
        if isinstance(node, Bool):
            # only MUST lists hold textually-adjacent tokens (space-
            # separated words under the default AND); should/must_not
            # members were separated by OR/NOT in the source text
            return Bool(must=self._collapse_runs(node.must),
                        should=[self.rewrite(n) for n in node.should],
                        must_not=[self.rewrite(n) for n in node.must_not],
                        min_should=node.min_should)
        return node
