"""Name-signal derivations (reference T5-T8,
/root/reference/openaleph_search/transform/util.py:65-95,236-251):
name_parts, name_keys, and phonetic encodings — the matching signals
the reference derives from FtM entity names, exposed here both as
plain helpers (driver-side query compilation, percolation cleaning)
and as DataFrame ops (vectorized pandas UDF over a names column).
"""
from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .analyzer import fold_text

_TOKEN = re.compile(r"[^\W_]+", re.UNICODE)


def name_parts(name: str, min_len: int = 2) -> list[str]:
    """T5: cleaned tokens ≥ min_len chars, plus folded twins
    (transform/util.py:81-95)."""
    toks = [t.lower() for t in _TOKEN.findall(name or "")
            if len(t) >= min_len]
    out = []
    for t in toks:
        out.append(t)
        folded = fold_text(t)
        if folded != t:
            out.append(folded)
    return list(dict.fromkeys(out))


def name_key(name: str, min_len: int = 6) -> str | None:
    """T6: folded tokens, sorted and concatenated; kept only if longer
    than min_len-1 chars (transform/util.py:236-251)."""
    toks = sorted(fold_text(t.lower()) for t in _TOKEN.findall(name or ""))
    key = "".join(toks)
    return key if len(key) >= min_len else None


# -- basic metaphone (T7) ----------------------------------------------------
# A compact metaphone variant: enough to give stable phonetic buckets
# (the reference uses the `metaphone` package; transform/util.py:65-78).

_MP_RULES = [
    (re.compile(r"^[gkp]n"), lambda m: m.group(0)[1]),
    (re.compile(r"mb$"), "m"),
]


def metaphone(word: str) -> str:
    w = fold_text((word or "").lower())
    w = re.sub(r"[^a-z]", "", w)
    if not w:
        return ""
    for rx, rep in _MP_RULES:
        w = rx.sub(rep if isinstance(rep, str) else rep(rx.match(w)), w) \
            if rx.search(w) else w
    out = []
    i = 0
    n = len(w)
    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        if c in "aeiou":
            if i == 0:
                out.append(c.upper())
            i += 1
            continue
        if c == nxt and c != "c":  # collapse doubles
            i += 1
            continue
        if c == "b":
            out.append("B" if not (i == n - 1 and w[i - 1:i] == "m")
                       else "")
        elif c == "c":
            if w[i:i + 2] == "ch":
                out.append("X")
                i += 1
            elif nxt in "iey":
                out.append("S")
            else:
                out.append("K")
        elif c == "d":
            if w[i:i + 3] == "dge":
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "g":
            if nxt == "h" and (i + 2 >= n or w[i + 2] not in "aeiou"):
                i += 1  # silent gh
            elif nxt in "iey":
                out.append("J")
            else:
                out.append("K")
        elif c == "h":
            if i > 0 and w[i - 1] in "aeiou" and nxt not in "aeiou":
                pass  # silent
            else:
                out.append("H")
        elif c == "k":
            if w[i - 1:i] != "c":
                out.append("K")
        elif c in "fjlmnr":
            out.append(c.upper())
        elif c == "p":
            if nxt == "h":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "q":
            out.append("K")
        elif c == "s":
            if w[i:i + 2] == "sh":
                out.append("X")
                i += 1
            else:
                out.append("S")
        elif c == "t":
            if w[i:i + 2] == "th":
                out.append("0")
                i += 1
            else:
                out.append("T")
        elif c == "v":
            out.append("F")
        elif c == "w" or c == "y":
            if nxt in "aeiou":
                out.append(c.upper())
        elif c == "x":
            out.append("KS")
        elif c == "z":
            out.append("S")
        i += 1
    return "".join(out)


def name_phonetic(name: str, min_token_len: int = 3,
                  min_phoneme_len: int = 3) -> list[str]:
    """T7: metaphone per alpha token ≥ min_token_len, keep phonemes
    ≥ min_phoneme_len (transform/util.py:65-78, thresholds pinned)."""
    out = []
    for t in _TOKEN.findall(name or ""):
        if len(t) >= min_token_len and t.isalpha():
            ph = metaphone(t)
            if len(ph) >= min_phoneme_len:
                out.append(ph)
    return list(dict.fromkeys(out))


# -- DataFrame ops -----------------------------------------------------------

def with_name_signals(df: DataFrame, name_col: str) -> DataFrame:
    """Vectorized derivation of all three signal columns."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def parts(s: pd.Series) -> pd.Series:
        return s.map(lambda x: name_parts(x or ""))

    @pandas_udf("string")
    def key(s: pd.Series) -> pd.Series:
        return s.map(lambda x: name_key(x or ""))

    @pandas_udf("array<string>")
    def phon(s: pd.Series) -> pd.Series:
        return s.map(lambda x: name_phonetic(x or ""))

    c = F.col(name_col)
    return (df.withColumn("name_parts", parts(c))
            .withColumn("name_key", key(c))
            .withColumn("name_phonetic", phon(c)))
