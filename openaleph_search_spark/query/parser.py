"""Query-string parser + search-args parser.

Mirrors the reference's Lucene ``query_string`` surface (terms,
"phrases", "phrase"~N proximity, AND/OR/NOT/-, parentheses, trailing
wildcards, **default operator AND**;
/root/reference/openaleph_search/query/base.py:55-66,
settings.py:139, semantics exercised in tests/test_search.py:157-173,
771-921) and the URL-arg dialect of
/root/reference/openaleph_search/parse/parser.py:145-341 (filter:*,
exclude:*, empty:*, facet*, metric:*, sort, offset/limit).

Query text is run through the SAME analyzer as index time, so folding/
lowercasing match (``Félix`` finds ``felix``).
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..analysis.analyzer import analyze_query_terms
from .ir import (Bool, MatchAll, Node, PhraseLeaf, PrefixLeaf, TermLeaf,
                 WildcardLeaf)

MAX_PAGE = 9999  # reference settings.py:7

_TOKEN_SPLIT = re.compile(
    r'(?P<neg>-)?(?:(?P<pfield>\w+):)?"(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?'
    r"(?:\^(?P<pboost>\d+(?:\.\d+)?))?"
    r"|\((?P<lparen>)"
    r"|\)(?P<rparen>)"
    r"|(?P<word>[^\s()]+)"
)

_FIELD_WORD = re.compile(r"^(\w+):(.+)$")


@dataclass
class _Tok:
    kind: str  # phrase | word | lparen | rparen
    text: str = ""
    slop: int = 0
    field: str | None = None
    neg: bool = False
    boost: float = 1.0


def _lex(q: str) -> list[_Tok]:
    toks = []
    for m in _TOKEN_SPLIT.finditer(q):
        if m.group("phrase") is not None:
            toks.append(_Tok("phrase", m.group("phrase"),
                             int(m.group("slop") or 0),
                             m.group("pfield"),
                             neg=m.group("neg") is not None,
                             boost=float(m.group("pboost") or 1.0)))
        elif m.group("lparen") is not None:
            toks.append(_Tok("lparen"))
        elif m.group("rparen") is not None:
            toks.append(_Tok("rparen"))
        else:
            toks.append(_Tok("word", m.group("word")))
    return toks


class QueryStringParser:
    """Recursive-descent parser → IR. Lenient: unbalanced parens and
    dangling operators degrade to terms (reference uses ES lenient mode)."""

    def __init__(self, q: str):
        self.toks = _lex(q)
        self.i = 0

    def _peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Node:
        node = self._or_expr()
        return node if node is not None else MatchAll()

    def _or_expr(self) -> Node | None:
        parts = []
        left = self._and_expr()
        if left is not None:
            parts.append(left)
        while True:
            t = self._peek()
            if t and t.kind == "word" and t.text.upper() == "OR":
                self._next()
                nxt = self._and_expr()
                if nxt is not None:
                    parts.append(nxt)
            else:
                break
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        return Bool(should=parts)

    def _and_expr(self) -> Node | None:
        must: list[Node] = []
        must_not: list[Node] = []
        while True:
            t = self._peek()
            if t is None or t.kind == "rparen":
                break
            if t.kind == "word" and t.text.upper() == "OR":
                break
            if t.kind == "word" and t.text.upper() == "AND":
                self._next()
                continue
            negate = False
            if t.kind == "word" and (t.text.upper() == "NOT" or t.text == "-"):
                self._next()
                negate = True
                t = self._peek()
                if t is None:
                    break
            if t.kind == "phrase" and t.neg:
                negate = True
            node = self._atom()
            if node is None:
                continue
            if (not negate and isinstance(node, Bool) and node.must_not
                    and not node.must and not node.should):
                # "-word" atoms come back as pure-negative bools: hoist
                # them into this conjunction's must_not (a nested
                # pure-negative child would otherwise match nothing)
                must_not.extend(node.must_not)
                continue
            (must_not if negate else must).append(node)
        if not must and not must_not:
            return None
        if len(must) == 1 and not must_not:
            return must[0]
        return Bool(must=must, must_not=must_not)

    def _atom(self) -> Node | None:
        t = self._next()
        if t.kind == "lparen":
            inner = self._or_expr()
            nxt = self._peek()
            if nxt and nxt.kind == "rparen":
                self._next()
            return inner
        if t.kind == "rparen":
            return None
        if t.kind == "phrase":
            terms = analyze_query_terms(t.text)
            if not terms:
                return None
            if len(terms) == 1:
                return TermLeaf(terms[0], field=t.field, boost=t.boost)
            return PhraseLeaf(terms, slop=t.slop, field=t.field,
                              boost=t.boost)
        # word — optional field: prefix (Lucene field:value syntax)
        word = t.text
        field = None
        fm = _FIELD_WORD.match(word)
        if fm and fm.group(1).upper() not in ("AND", "OR", "NOT"):
            field, word = fm.group(1), fm.group(2)
        # Lucene term boost: word^2 / word^0.5 (applies to the whole
        # atom, incl. prefix expansions and multi-term analyses)
        boost = 1.0
        bm = re.match(r"^(.+)\^(\d+(?:\.\d+)?)$", word)
        if bm:
            word, boost = bm.group(1), float(bm.group(2))
        if word.startswith("-") and len(word) > 1:
            inner = QueryStringParser.__new__(QueryStringParser)
            inner.toks = [_Tok("word", word[1:])]
            inner.i = 0
            node = inner._atom()
            return Bool(must_not=[node]) if node else None
        if (word.endswith("*") and len(word) > 1
                and "*" not in word[:-1] and "?" not in word):
            terms = analyze_query_terms(word[:-1])
            if terms:
                return PrefixLeaf(terms[0], field=field, boost=boost)
            return None
        if ("*" in word or "?" in word) and word.strip("*?"):
            # infix/leading wildcard (Lucene te*m / t?m / *erm):
            # analyze the literal segments, keep the metacharacters
            segs = re.split(r"([*?])", word)
            pat = "".join(s if s in ("*", "?")
                          else "".join(analyze_query_terms(s))
                          for s in segs if s)
            if pat.strip("*?"):
                return WildcardLeaf(pat, field=field, boost=boost)
            return None
        terms = analyze_query_terms(word)
        if not terms:
            return None
        if len(terms) == 1:
            return TermLeaf(terms[0], field=field, boost=boost)
        # one input word analyzing into several terms (e.g. ZWJ capture,
        # hyphenated, path segments): conjunction within the field
        # (boosting every child == boosting the summed conjunction)
        return Bool(must=[TermLeaf(x, field=field, boost=boost)
                          for x in terms])


def parse_query_string(q: str | None) -> Node:
    if not q or not q.strip():
        return MatchAll()
    return QueryStringParser(q).parse()


# ---------------------------------------------------------------------------
# search args (the URL-dialect of the reference SearchQueryParser)
# ---------------------------------------------------------------------------

@dataclass
class SearchArgs:
    q: str | None = None
    prefix: str | None = None
    offset: int = 0
    limit: int = 20
    filters: dict[str, list[str]] = field(default_factory=dict)
    excludes: dict[str, list[str]] = field(default_factory=dict)
    empties: list[str] = field(default_factory=list)
    ranges: dict[str, dict[str, str]] = field(default_factory=dict)  # f→op→v
    facets: list[str] = field(default_factory=list)
    facet_size: dict[str, int] = field(default_factory=dict)
    facet_total: list[str] = field(default_factory=list)
    facet_interval: dict[str, str] = field(default_factory=dict)
    facet_significant: list[str] = field(default_factory=list)
    metrics: dict[str, list[str]] = field(default_factory=dict)  # op→props
    sort: list[tuple[str, bool]] = field(default_factory=list)  # (field, asc)
    # ES search_after keyset cursor: one value per sort field plus the
    # doc_id tiebreak (deep paging without offset scans — the reference
    # export path's PIT+search_after role, index/entities.py:117)
    search_after: list[str] = field(default_factory=list)
    synonyms: bool = False
    dehydrate: bool = False
    include_fields: list[str] = field(default_factory=list)
    highlight: bool = False
    highlight_count: int = 3
    highlight_length: int = 200  # fragment_size (reference settings.py:85)
    highlight_query: str | None = None  # term-source override (Q24)
    qfields: list[tuple[str, float]] = field(default_factory=list)
    function_score: bool = False

    @property
    def k(self) -> int:
        return min(self.offset + self.limit, MAX_PAGE)


_RANGE_OPS = ("gte", "lte", "gt", "lt")


def parse_args_url(url: str) -> "SearchArgs":
    """Parse a reference-style search URL (``/search?q=…&filter:x=…``)
    into SearchArgs — the exact multidict the reference's HTTP layer
    hands to SearchQueryParser (tests/test_search.py:224-250)."""
    from urllib.parse import parse_qsl, urlparse
    pairs = parse_qsl(urlparse(url).query, keep_blank_values=True)
    multi: dict[str, list[str]] = {}
    for k, v in pairs:
        multi.setdefault(k, []).append(v)
    return parse_args(multi)


def parse_args(args: dict[str, list[str] | str]) -> SearchArgs:
    """Parse a reference-dialect arg multidict
    (/root/reference/openaleph_search/parse/parser.py:145-341)."""
    out = SearchArgs()
    for key, vals in args.items():
        if not isinstance(vals, (list, tuple)):
            vals = [str(vals)]
        else:
            vals = [str(v) for v in vals]
        if key == "q":
            out.q = vals[-1]
        elif key == "prefix":
            out.prefix = vals[-1]
        elif key == "offset":
            out.offset = max(0, int(vals[-1]))
        elif key == "limit":
            out.limit = max(0, int(vals[-1]))
        elif key == "facet":
            out.facets.extend(vals)
        elif key == "sort":
            for v in vals:
                fieldname, _, direction = v.partition(":")
                out.sort.append((fieldname, direction != "desc"))
        elif key == "search_after":
            # one cursor element per occurrence (dict callers pass the
            # list directly, mirroring the ES array parameter); None
            # elements survive stringification — they cursor into a
            # sort key's null region
            raw = args[key]
            if not isinstance(raw, (list, tuple)):
                raw = [raw]
            out.search_after = [None if v is None else str(v)
                                for v in raw]
        elif key.startswith("filter:"):
            rest = key[len("filter:"):]
            op, _, fieldname = rest.partition(":")
            if op in _RANGE_OPS and fieldname:
                out.ranges.setdefault(fieldname, {})[op] = vals[-1]
            else:
                out.filters.setdefault(rest, []).extend(vals)
        elif key.startswith("exclude:"):
            out.excludes.setdefault(key[len("exclude:"):], []).extend(vals)
        elif key.startswith("empty:"):
            out.empties.append(key[len("empty:"):])
        elif key.startswith("facet_size:"):
            out.facet_size[key[len("facet_size:"):]] = int(vals[-1])
        elif key.startswith("facet_total:"):
            out.facet_total.append(key[len("facet_total:"):])
        elif key.startswith("facet_interval:"):
            out.facet_interval[key[len("facet_interval:"):]] = vals[-1]
        elif key.startswith("facet_significant:"):
            if vals[-1].lower() in ("true", "1", "yes"):
                out.facet_significant.append(
                    key[len("facet_significant:"):])
        elif key.startswith("metric:"):
            op = key[len("metric:"):]
            out.metrics.setdefault(op, []).extend(vals)
        elif key == "qfields":
            for part in vals[-1].split(","):
                name, _, boost = part.strip().partition("^")
                if name:
                    out.qfields.append((name, float(boost or 1.0)))
        elif key == "synonyms":
            out.synonyms = vals[-1].lower() in ("true", "1", "yes")
        elif key == "dehydrate":
            out.dehydrate = vals[-1].lower() in ("true", "1", "yes")
        elif key == "include_fields":
            for v in vals:
                out.include_fields.extend(
                    x.strip() for x in v.split(",") if x.strip())
        elif key == "function_score":
            out.function_score = vals[-1].lower() in ("true", "1", "yes")
        elif key == "highlight":
            out.highlight = vals[-1].lower() in ("true", "1", "yes")
        elif key == "highlight_count":
            out.highlight_count = int(vals[-1])
        elif key == "highlight_length":
            out.highlight_length = int(vals[-1])
        elif key == "highlight_query":
            out.highlight_query = vals[-1]
    # pagination ceiling, reference parser.py:153-155
    if out.offset + out.limit > MAX_PAGE:
        # clamp offset FIRST (an offset beyond the ceiling must not
        # survive with limit 0 — fuzz-found), then shrink the limit
        out.offset = min(out.offset, MAX_PAGE)
        out.limit = max(0, MAX_PAGE - out.offset)
    return out


# ---------------------------------------------------------------------------
# partial-date inputs (reference index/mapping.py:35,47 format chain:
# yyyy-MM-dd'T'HH:mm:ss || yyyy-MM-dd || yyyy-MM || yyyy)
# ---------------------------------------------------------------------------

def partial_date_bounds(value: str) -> tuple[str, str] | None:
    """ES partial-date range semantics: a truncated date names a whole
    period. → (start_iso, end_iso_exclusive), or None if the value
    isn't date-like. Full date-times are exact (end == start).

    Also accepts ES date-math rounding (``1970||/y``, ``2020-08||/M``,
    reference tests/test_search.py:122-133): the suffix truncates the
    date to that calendar unit before the period expansion."""
    import datetime as _dt
    v = value.strip()
    dm = re.fullmatch(r"(.+)\|\|/([yMd])", v)
    if dm:
        base, unit = dm.group(1).strip(), dm.group(2)
        cut = {"y": 4, "M": 7, "d": 10}[unit]
        return partial_date_bounds(base[:cut])
    m = re.fullmatch(r"(\d{4})", v)
    if m:
        y = int(m.group(1))
        return (f"{y:04d}-01-01 00:00:00", f"{y + 1:04d}-01-01 00:00:00")
    m = re.fullmatch(r"(\d{4})-(\d{2})", v)
    if m:
        y, mo = int(m.group(1)), int(m.group(2))
        y2, mo2 = (y + 1, 1) if mo == 12 else (y, mo + 1)
        return (f"{y:04d}-{mo:02d}-01 00:00:00",
                f"{y2:04d}-{mo2:02d}-01 00:00:00")
    m = re.fullmatch(r"(\d{4})-(\d{2})-(\d{2})", v)
    if m:
        d = _dt.date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
        nxt = d + _dt.timedelta(days=1)
        return (f"{d.isoformat()} 00:00:00", f"{nxt.isoformat()} 00:00:00")
    try:
        ts = _dt.datetime.fromisoformat(v.replace("T", " "))
    except ValueError:
        return None
    iso = ts.strftime("%Y-%m-%d %H:%M:%S")
    return (iso, iso)  # exact point
