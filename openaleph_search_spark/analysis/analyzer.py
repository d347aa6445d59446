"""Vectorized analyzer chain (index- and query-time tokenization).

Re-implements, Spark-first, the analyzer the reference *declares* in
Elasticsearch (``icu-default``: ``html_strip`` char filter → standard
UAX#29 tokenizer → ``ann_capture`` ZWJ annotation split → ``lowercase``
→ ``icu_folding``; /root/reference/openaleph_search/index/mapping.py:51-124)
whose semantics are pinned by /root/reference/tests/test_analyzer.py:9-164
and /root/reference/docs/annotations.md.

Everything operates on pandas Series / numpy arrays so it can run
inside Arrow-batched pandas UDFs (``mapInPandas``) — no per-row Python
in the Spark hot path (BASELINE.json ``input_hint``).

Key behaviors (each traced to a reference test):

* ``html_strip``: tags removed, entities decoded
  (tests/test_analyzer.py:43-47 ``hello <h1 class='foo'>Félix!</h1>`` →
  ``hello``, ``felix``).
* UAX#29 word tokens. ``_`` is WordBreak=ExtendNumLet so ``__PER__`` and
  ``snake_case`` stay single tokens; ZWJ-joined runs stay one token until
  the annotation-capture step (docs/annotations.md).
* ZWJ annotation capture: a token containing U+200D splits into its
  segments **at the same position** (tests/test_analyzer.py:94-152).
* lowercase, then ICU folding: NFKD + strip combining marks + explicit
  fold table (``Félix``→``felix``, ``škuro``→``skuro``); Cyrillic/CJK pass
  through case-folded only (tests/test_analyzer.py:36-64).
"""
from __future__ import annotations

import html as _html
import re
import unicodedata

import numpy as np
import pandas as pd

ZWJ = "‍"

_HTML_TAG_RE = re.compile(r"<[^>]*>")
# UAX#29-ish word tokens: runs of word chars (letters/digits/underscore/
# combining marks via \w in unicode mode) optionally joined by ZWJ, and
# mid-word apostrophes kept (WB6/WB7 MidLetter/Single_Quote).
_TOKEN_RE = re.compile(r"[\w‍]+(?:['’][\w‍]+)*", re.UNICODE)

# ICU folding cases NFKD+strip-marks doesn't cover (common subset of the
# ICU foldings exercised by the reference corpus).
_FOLD_TABLE = str.maketrans({
    "ß": "ss", "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d",
    "þ": "th", "ł": "l", "ħ": "h", "ŧ": "t", "ı": "i", "ĸ": "k",
    "ŋ": "ng", "’": "'",
})

_NONASCII_RE = re.compile(r"[^\x00-\x7f]")


def fold_text(s: str) -> str:
    """ICU-folding approximation: NFKD, strip combining marks, fold table."""
    s = s.translate(_FOLD_TABLE)
    decomposed = unicodedata.normalize("NFKD", s)
    return "".join(c for c in decomposed if not unicodedata.combining(c))


def fold_series(tokens: pd.Series) -> pd.Series:
    """Vectorized folding: only non-ASCII tokens pay the NFKD cost."""
    mask = tokens.str.contains(_NONASCII_RE, regex=True, na=False)
    if not mask.any():
        return tokens
    out = tokens.copy()
    out[mask] = tokens[mask].map(fold_text)
    return out


def strip_html_series(texts: pd.Series) -> pd.Series:
    """html_strip char filter: drop tags, decode entities."""
    mask = texts.str.contains("[<&]", regex=True, na=False)
    if not mask.any():
        return texts.fillna("")
    out = texts.fillna("").copy()
    stripped = out[mask].str.replace(_HTML_TAG_RE, " ", regex=True)
    out[mask] = stripped.map(_html.unescape)
    return out


# fast-path gate: a batch is "simple" when every char is ASCII and none
# of {&, ', <} appear — then lower+split-on-non-word-runs is provably
# identical to the full chain (no HTML tags/entities, no mid-word
# apostrophes, no ZWJ/non-ASCII → no folding, no annotation capture,
# and the token regex degenerates to [a-z0-9_]+ runs)
_SIMPLE_BATCH_RE = re.compile(r"[^\x00-\x7f]|[&'<]")


def _tokenize_flat_arrow(texts: pd.Series):
    """C++-side tokenization for simple ASCII batches: one utf8_lower +
    one RE2 split over the whole column (the pandas findall path loops
    Python regex per row — measured ~25% of SPIMI task time)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    arr = pc.utf8_lower(pa.array(texts.to_numpy(dtype=object),
                                 type=pa.string()))
    toks = pc.split_pattern_regex(arr, pattern="[^a-z0-9_]+")
    counts_all = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat_all = pc.list_flatten(toks)
    row_all = np.repeat(np.arange(len(texts), dtype=np.int64),
                        counts_all)
    # RE2 split leaves empty strings only at string edges (and for
    # all-separator docs); drop them and renumber positions per doc
    keep = pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False)
    flat = flat_all.filter(pa.array(keep))
    row_idx = row_all[keep]
    counts = np.bincount(row_idx, minlength=len(texts)) \
        if row_idx.size else np.zeros(len(texts), dtype=np.int64)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    positions = np.arange(row_idx.size, dtype=np.int64) - starts
    return row_idx, pd.Series(flat.to_numpy(zero_copy_only=False),
                              dtype=object), positions


def tokenize_flat(texts: pd.Series) -> tuple[np.ndarray, pd.Series, np.ndarray]:
    """Analyze a batch of documents into a flat (row_idx, term, position) set.

    Returns ``(row_idx, terms, positions)`` where ``row_idx`` indexes into
    the input batch (0..len-1), ``terms`` are final folded terms, and
    ``positions`` are token positions within each document (ZWJ-split
    terms share one position, mirroring ES ``ann_capture``).
    """
    texts = texts.reset_index(drop=True)
    if len(texts) and not texts.isna().any() \
            and not texts.str.contains(_SIMPLE_BATCH_RE,
                                       regex=True).any():
        return _tokenize_flat_arrow(texts)
    texts = strip_html_series(texts)
    # lowercase at DOC level (N ops, not N_tokens) — tokenization is
    # case-insensitive here (the token regex treats cases alike)
    lowered = texts.str.lower()
    token_lists = lowered.str.findall(_TOKEN_RE)
    counts = token_lists.str.len().fillna(0).astype(np.int64).to_numpy()
    row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    if row_idx.size == 0:
        return row_idx, pd.Series([], dtype=object), np.empty(0, dtype=np.int64)
    flat = pd.Series(np.concatenate([np.asarray(t, dtype=object)
                                     for t in token_lists if len(t)]))
    # position of each token within its doc: arange minus doc start offset
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    positions = np.arange(row_idx.size, dtype=np.int64) - starts

    # ZWJ annotation capture: split multi-segment tokens at equal
    # position. Doc-level pre-mask: only tokens from ZWJ-bearing docs
    # are scanned (the common all-ASCII batch pays nothing).
    zwj_docs = lowered.str.contains(ZWJ, regex=False).to_numpy()
    zwj_mask = np.zeros(row_idx.size, dtype=bool)
    if zwj_docs.any():
        cand = zwj_docs[row_idx]
        zwj_mask[cand] = flat[cand].str.contains(
            ZWJ, regex=False).to_numpy()
    if zwj_mask.any():
        keep_flat = flat[~zwj_mask]
        parts = flat[zwj_mask].str.split(ZWJ)
        # drop empty segments from leading/trailing/double ZWJ
        parts = parts.map(lambda xs: [x for x in xs if x])
        n_parts = parts.str.len().to_numpy()
        exp_rows = np.repeat(row_idx[zwj_mask], n_parts)
        exp_pos = np.repeat(positions[zwj_mask], n_parts)
        exp_terms = pd.Series(
            np.concatenate([np.asarray(p, dtype=object) for p in parts]),
        ) if len(parts) else pd.Series([], dtype=object)
        row_idx = np.concatenate([row_idx[~zwj_mask], exp_rows])
        positions = np.concatenate([positions[~zwj_mask], exp_pos])
        flat = pd.concat([keep_flat, exp_terms], ignore_index=True)
        zwj_docs = None  # row_idx reordered; fold mask recomputed below

    # ICU folding: doc-level pre-mask again — only tokens from docs
    # containing non-ASCII go through the per-token fold
    flat = flat.reset_index(drop=True)
    na_docs = lowered.str.contains(_NONASCII_RE, regex=True,
                                   na=False).to_numpy()
    if na_docs.any():
        cand = na_docs[row_idx]
        if cand.any():
            folded = fold_series(flat[cand])
            flat = flat.copy()
            flat[np.flatnonzero(cand)] = folded.to_numpy()
    return row_idx, flat, positions


def analyze_text(text: str) -> list[tuple[str, int]]:
    """Driver-side convenience: one document → [(term, position), ...].

    This is the ``analyze`` API surface of the reference
    (/root/reference/openaleph_search/search/logic.py:42-69).
    """
    _, terms, pos = tokenize_flat(pd.Series([text]))
    return list(zip(terms.tolist(), pos.tolist()))


def analyze_query_terms(text: str) -> list[str]:
    """Query-time analysis: same chain, terms only, order preserved."""
    return [t for t, _ in analyze_text(text)]
