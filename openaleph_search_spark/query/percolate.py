"""Percolation (reverse search, Q15) + mentions queries (Q19).

The reference stores one ES percolator query per watchlist entity
(phrase shoulds over its names, boost 2.0 primary / 0.8 other names,
slop 2 — /root/reference/openaleph_search/transform/util.py:163-233,
query/queries.py:373-528, docs/percolation.md) and asks ES which stored
queries match a document. Spark-first this inverts into a **broadcast
watchlist join**: analyze each document once (vectorized), then check
every entity's phrase clauses against the token-position map inside one
``mapInPandas`` pass — no index round-trip, embarrassingly parallel
over the docs table.

Name cleaning (T9, transform/util.py:98-156 + settings.py:122,131):
multi-token names kept (unless initials-only); single tokens kept only
when ≥ ``single_token_min_length`` chars.

Scoring (pinned, documented divergence from ES BM25-of-percolator):
score = Σ boost over matched clauses; primary names boost 2.0, other
names 0.8 (reference T10 boosts).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..analysis.analyzer import analyze_query_terms, tokenize_flat
from .ir import Bool, PhraseLeaf, TermLeaf

SINGLE_TOKEN_MIN_LENGTH = 7  # reference pytest env pins 7
NAME_BOOST = 2.0
OTHER_NAME_BOOST = 0.8
DEFAULT_SLOP = 2
MAX_PICKED_NAMES = 5   # reference pick_names budget (matching.py:31-69)
MAX_CLAUSES = 500      # reference MAX_CLAUSES (matching.py:28)


def _levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance — names are short, driver-side only."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def pick_names(names: list[str], limit: int = MAX_PICKED_NAMES
               ) -> list[str]:
    """Bound a huge alias list to a few representative names before
    query compilation (reference matching.py:31-69: an entity with
    hundreds of aliases would be prohibitively expensive to search).

    Deterministic re-base of the reference algorithm: the centroid is
    the name minimizing the summed edit distance to all others (the
    registry.name.pick role), then greedily add the name MAXIMIZING
    summed distance to everything picked (diversity)."""
    names = sorted(set(names))
    if len(names) <= limit:
        return names
    sums = {n: sum(_levenshtein(n, m) for m in names if m != n)
            for n in names}
    picked = [min(names, key=lambda n: (sums[n], n))]  # centroid
    while len(picked) < limit:
        rest = [n for n in names if n not in picked]
        best = max(rest, key=lambda n: (
            sum(_levenshtein(n, p) for p in picked), n))
        picked.append(best)
    return picked


def clean_names(names: list[str],
                single_token_min_length: int = SINGLE_TOKEN_MIN_LENGTH
                ) -> list[list[str]]:
    """→ list of analyzed token lists that survive the cleaner."""
    out = []
    for name in names or []:
        toks = analyze_query_terms(name)
        if not toks:
            continue
        if len(toks) == 1:
            if len(toks[0]) >= single_token_min_length:
                out.append(toks)
        else:
            # drop initials-only multi-token names ("J. D.")
            if any(len(t) > 1 for t in toks):
                out.append(toks)
    return out


@dataclass
class StoredQuery:
    entity_id: str
    clauses: list[tuple[list[str], float]]  # (tokens, boost)


def compile_watchlist(rows: list[dict],
                      single_token_min_length: int = SINGLE_TOKEN_MIN_LENGTH
                      ) -> list[StoredQuery]:
    """rows: [{"entity_id", "names": [...], "other_names": [...]}]."""
    out = []
    for r in rows:
        clauses = [(t, NAME_BOOST) for t in
                   _budgeted_names(r.get("names"),
                                   single_token_min_length)]
        clauses += [(t, OTHER_NAME_BOOST) for t in
                    _budgeted_names(r.get("other_names"),
                                    single_token_min_length)]
        if clauses:
            out.append(StoredQuery(str(r["entity_id"]),
                                   clauses[:MAX_CLAUSES]))
    return out


def _budgeted_names(names, single_token_min_length: int
                    ) -> list[list[str]]:
    """clean → (if over budget) pick_names → token lists."""
    cleaned = clean_names(names, single_token_min_length)
    if len(cleaned) <= MAX_PICKED_NAMES:
        return cleaned
    keep = set(pick_names([" ".join(t) for t in cleaned]))
    return [t for t in cleaned if " ".join(t) in keep]


def _phrase_hits(pos_map: dict, tokens: list[str], slop: int) -> int:
    """#anchors where every token aligns within slop (same pinned
    semantics as the index-side phrase matcher).

    Pure-python sets/bisect: position lists here are tiny (a handful of
    occurrences per doc) — numpy per-call overhead dominates at this
    size, and this runs per (doc, triggered clause)."""
    import bisect
    plists = [pos_map.get(t) for t in tokens]
    if any(p is None for p in plists):
        return 0
    if slop == 0:
        common = {p for p in plists[0]}
        for i, pl in enumerate(plists[1:], start=1):
            common &= {p - i for p in pl}
            if not common:
                return 0
        return len(common)
    tf = 0
    adj = [sorted(p - i for p in pl)
           for i, pl in enumerate(plists)]
    for anchor in adj[0]:
        ok = True
        for a in adj[1:]:
            j = bisect.bisect_left(a, anchor)
            d = min((abs(a[j] - anchor) if j < len(a) else 1 << 30),
                    (abs(a[j - 1] - anchor) if j > 0 else 1 << 30))
            if d > slop:
                ok = False
                break
        if ok:
            tf += 1
    return tf


def percolate_text(text: str, stored: list[StoredQuery],
                   slop: int = DEFAULT_SLOP) -> list[dict]:
    """Single-document percolation (the reference's percolate-text CLI).
    → [{"entity_id", "score", "matched_names": [...]}] score-desc."""
    ridx, terms, pos = tokenize_flat(pd.Series([text]))
    pos_map: dict[str, list[int]] = {}
    for t, p in zip(terms.tolist(), pos.tolist()):
        pos_map.setdefault(t, []).append(p)
    pos_map = {t: sorted(v) for t, v in pos_map.items()}
    out = []
    for sq in stored:
        score, matched = 0.0, []
        for tokens, boost in sq.clauses:
            tf = _phrase_hits(pos_map, tokens, slop)
            if tf > 0:
                score += boost
                matched.append(" ".join(tokens))
        if matched:
            out.append({"entity_id": sq.entity_id, "score": score,
                        "matched_names": matched})
    out.sort(key=lambda r: (-r["score"], r["entity_id"]))
    return out


def percolate_docs(docs: DataFrame, stored: list[StoredQuery],
                   id_cols: list[str] | None = None,
                   text_col: str = "content",
                   slop: int = DEFAULT_SLOP) -> DataFrame:
    """Batch percolation: broadcast the compiled watchlist, analyze each
    partition's docs once, emit (doc ids..., entity_id, score, matched).

    Scale shape: watchlist is driver-compiled & closure-broadcast (the
    reference caps percolator candidates per shard the same way); docs
    stream through mapInPandas with constant memory.
    """
    id_cols = id_cols or ["repo", "path", "commit"]
    cols = [*id_cols, text_col]

    # candidate narrowing (the reference's filtered-percolation speedup,
    # docs/percolation.md:210-222): a clause can only fire if its
    # rarest trigger token occurs in the doc — build token→clauses once
    # driver-side, probe per doc with set lookups
    trigger: dict[str, list[tuple[int, int]]] = {}
    for qi, sq in enumerate(stored):
        for ci, (tokens, _boost) in enumerate(sq.clauses):
            trigger.setdefault(tokens[0], []).append((qi, ci))

    def fn(it):
        for pdf in it:
            ridx, terms, pos = tokenize_flat(pdf[text_col])
            # ONE batch-wide (doc, term) sort; per-doc slices via
            # searchsorted (the per-doc boolean-mask scan was O(docs ×
            # total_tokens))
            order = np.lexsort((terms.to_numpy(), ridx))
            r_s = ridx[order]
            t_s = terms.to_numpy()[order]
            p_s = pos[order]
            doc_lo = np.searchsorted(r_s, np.arange(len(pdf)))
            doc_hi = np.searchsorted(r_s, np.arange(len(pdf)),
                                     side="right")
            out_rows = []
            for i in range(len(pdf)):
                lo, hi = int(doc_lo[i]), int(doc_hi[i])
                pos_np: dict[str, list[int]] = {}
                if hi > lo:
                    td = t_s[lo:hi]
                    pd_ = p_s[lo:hi]
                    bounds = np.flatnonzero(
                        np.r_[True, td[1:] != td[:-1]])
                    for b, e in zip(bounds, np.r_[bounds[1:], td.size]):
                        pos_np[td[b]] = sorted(pd_[b:e].tolist())
                # narrow to clauses whose trigger token is present
                cand: dict[int, list[int]] = {}
                for tok in pos_np.keys() & trigger.keys():
                    for qi, ci in trigger[tok]:
                        cand.setdefault(qi, []).append(ci)
                for qi, cis in cand.items():
                    sq = stored[qi]
                    score, matched = 0.0, []
                    for ci in sorted(set(cis)):
                        tokens, boost = sq.clauses[ci]
                        if _phrase_hits(pos_np, tokens, slop) > 0:
                            score += boost
                            matched.append(" ".join(tokens))
                    if matched:
                        out_rows.append((
                            *[pdf[c].iloc[i] for c in id_cols],
                            sq.entity_id, score, matched))
            yield pd.DataFrame(
                out_rows,
                columns=[*id_cols, "entity_id", "score", "matched_names"])

    id_schema = ", ".join(
        f"{c} {docs.schema[c].dataType.simpleString()}" for c in id_cols)
    return docs.select(*cols).mapInPandas(
        fn, f"{id_schema}, entity_id string, score double, "
            f"matched_names array<string>")


# ---------------------------------------------------------------------------
# stored percolator registry (reference index/indexes.py:119-124 persists
# one percolator query per entity in the index; here the compiled
# watchlist lives under <index>/percolator/ and is registered once)
# ---------------------------------------------------------------------------

def register_watchlist(storage, rows: list[dict],
                       single_token_min_length: int =
                       SINGLE_TOKEN_MIN_LENGTH) -> int:
    """Compile and PERSIST watchlist entities into the index directory
    (register once, percolate many times). Re-registering an entity_id
    replaces its stored query. → number of stored queries written."""
    import json
    compiled = compile_watchlist(rows, single_token_min_length)
    reg_dir = _registry_dir(storage)
    storage.io.mkdirs(reg_dir)
    existing = load_watchlist(storage)
    by_id = {sq.entity_id: sq for sq in existing}
    for sq in compiled:
        by_id[sq.entity_id] = sq
    payload = [{"entity_id": sq.entity_id,
                "clauses": [[toks, boost] for toks, boost in sq.clauses]}
               for sq in sorted(by_id.values(),
                                key=lambda s: s.entity_id)]
    import os
    storage.io.write_bytes_atomic(
        os.path.join(reg_dir, "queries.json"),
        json.dumps(payload).encode())
    return len(compiled)


def unregister_watchlist(storage, entity_ids: list[str]) -> int:
    import json
    import os
    drop = set(map(str, entity_ids))
    kept = [sq for sq in load_watchlist(storage)
            if sq.entity_id not in drop]
    payload = [{"entity_id": sq.entity_id,
                "clauses": [[toks, boost] for toks, boost in sq.clauses]}
               for sq in kept]
    storage.io.write_bytes_atomic(
        os.path.join(_registry_dir(storage), "queries.json"),
        json.dumps(payload).encode())
    return len(kept)


def load_watchlist(storage) -> list[StoredQuery]:
    import json
    import os
    path = os.path.join(_registry_dir(storage), "queries.json")
    if not storage.io.exists(path):
        return []
    rows = json.loads(storage.io.read_bytes(path))
    return [StoredQuery(r["entity_id"],
                        [(list(toks), float(boost))
                         for toks, boost in r["clauses"]])
            for r in rows]


def percolate_index(storage, docs: DataFrame,
                    id_cols: list[str] | None = None,
                    text_col: str = "content",
                    slop: int = DEFAULT_SLOP) -> DataFrame:
    """Percolate against the index's REGISTERED watchlist."""
    return percolate_docs(docs, load_watchlist(storage),
                          id_cols=id_cols, text_col=text_col, slop=slop)


def _registry_dir(storage) -> str:
    import os
    return os.path.join(storage.root, "percolator")


def mentions_tree(names: list[str], slop: int = DEFAULT_SLOP,
                  single_token_min_length: int = SINGLE_TOKEN_MIN_LENGTH
                  ) -> Bool | None:
    """Q19: index-side mentions query — phrase shoulds over the
    entity's cleaned names (runs through the normal executor, using
    stored positions)."""
    clauses = []
    for toks in _budgeted_names(names, single_token_min_length):
        if len(clauses) >= MAX_CLAUSES:
            break
        if len(toks) == 1:
            clauses.append(TermLeaf(toks[0]))
        else:
            clauses.append(PhraseLeaf(toks, slop=slop))
    return Bool(should=clauses) if clauses else None


def mentions_query(engine, names: list[str], k: int = 10,
                   slop: int = DEFAULT_SLOP) -> DataFrame:
    tree = mentions_tree(names, slop)
    if tree is None:
        return engine.spark.createDataFrame([], "doc_id long, score double")
    return engine.executor.topk(tree, k)


def multi_mentions(engine, entities: dict[str, list[str]], k: int = 10,
                   slop: int = DEFAULT_SLOP) -> DataFrame:
    """Per-entity attribution in ONE Spark job: every entity's phrase
    tree is evaluated in a single per-shard grouped-map pass (shared
    postings scan + per-term decode cache), then a per-entity window
    keeps the global top-k. The previous shape — one topk() plan per
    entity unioned together — was a driver/planner explosion at the
    reference's 10k-entity cap (query/mentions.py:76-130)."""
    trees = {}
    for eid, names in sorted(entities.items()):
        tree = mentions_tree(names, slop)
        if tree is not None:
            trees[eid] = tree
    if not trees:
        return engine.spark.createDataFrame(
            [], "doc_id long, score double, entity_id string")
    from pyspark.sql import Window
    res = engine.executor.run_multi(trees, k)
    w = Window.partitionBy("entity_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (res.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))
