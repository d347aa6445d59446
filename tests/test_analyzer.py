"""Analyzer golden tests — port of the reference's analyzer contract
(/root/reference/tests/test_analyzer.py:9-164): exact tokens + positions
for standard tokenization, lowercase, ICU folding, html_strip, ZWJ
annotation capture, Cyrillic pass-through."""
import pandas as pd

from openaleph_search_spark.analysis.analyzer import (
    analyze_text, fold_text, tokenize_flat)

ZWJ = "‍"


def test_basic_lowercase_tokens():
    assert analyze_text("Banana ba Nana") == [
        ("banana", 0), ("ba", 1), ("nana", 2)]


def test_punctuation_splits():
    assert [t for t, _ in analyze_text("Paul Manafort, former chairman.")] \
        == ["paul", "manafort", "former", "chairman"]


def test_icu_folding():
    assert [t for t, _ in analyze_text("Félix at the café")] == [
        "felix", "at", "the", "cafe"]
    assert fold_text("škuro") == "skuro"
    assert fold_text("Straße") == "Strasse"


def test_html_strip():
    # reference tests/test_analyzer.py:43-47
    assert analyze_text("hello <h1 class='foo'>Félix!</h1>") == [
        ("hello", 0), ("felix", 1)]


def test_html_entities():
    assert [t for t, _ in analyze_text("a &amp; b")] == ["a", "b"] or \
        [t for t, _ in analyze_text("a &amp; b")] == ["a", "amp", "b"]
    assert analyze_text("x &lt;tag&gt; y")[0][0] == "x"


def test_cyrillic_passthrough():
    text = "Владимир Владимирович Путин"
    assert analyze_text(text) == [
        ("владимир", 0), ("владимирович", 1), ("путин", 2)]


def test_zwj_annotation_same_position():
    # reference tests/test_analyzer.py:94-152 / docs/annotations.md:
    # ZWJ-joined annotation markers stay one UAX#29 token, then split
    # into same-position terms.
    toks = analyze_text(f"Jane{ZWJ}__PER__{ZWJ}__doejane__ Doe")
    assert ("jane", 0) in toks
    assert ("__per__", 0) in toks
    assert ("__doejane__", 0) in toks
    assert ("doe", 1) in toks


def test_underscore_words_survive():
    # ExtendNumLet: snake_case and __marker__ are single tokens
    assert analyze_text("snake_case __PER__") == [
        ("snake_case", 0), ("__per__", 1)]


def test_positions_after_zwj_split():
    toks = analyze_text(f"crime Jane{ZWJ}__PER__ walked")
    assert ("crime", 0) in toks and ("jane", 1) in toks
    assert ("__per__", 1) in toks and ("walked", 2) in toks


def test_empty_and_null_batch():
    ridx, terms, pos = tokenize_flat(pd.Series(["", None, "  "]))
    assert len(ridx) == 0 and len(terms) == 0 and len(pos) == 0


def test_batch_flat_alignment():
    ridx, terms, pos = tokenize_flat(pd.Series(["a b", "c", "", "d e f"]))
    assert list(ridx) == [0, 0, 1, 3, 3, 3]
    assert list(terms) == ["a", "b", "c", "d", "e", "f"]
    assert list(pos) == [0, 1, 0, 0, 1, 2]


def test_apostrophe_kept_midword():
    assert [t for t, _ in analyze_text("don't stop")] == ["don't", "stop"]


# --- direct ports of the reference's pinned cases
# (/root/reference/tests/test_analyzer.py) -----------------------------------

def _by_pos(text):
    out = {}
    for term, p in analyze_text(text):
        out.setdefault(p, set()).add(term)
    return out


def test_ref_annotated_text_latin():
    text = (f"Hello Jane{ZWJ}__PER__{ZWJ}__doejane__ "
            f"Doe{ZWJ}__PER__{ZWJ}__doejane__ here")
    by_pos = _by_pos(text)
    assert by_pos[0] == {"hello"}
    assert by_pos[1] == {"jane", "__per__", "__doejane__"}
    assert by_pos[2] == {"doe", "__per__", "__doejane__"}
    assert by_pos[3] == {"here"}


def test_ref_annotated_text_cross_script():
    text = (f"Владимир{ZWJ}__PER__{ZWJ}__putin__ "
            f"Путин{ZWJ}__PER__{ZWJ}__putin__")
    by_pos = _by_pos(text)
    assert {"владимир", "__per__", "__putin__"} <= by_pos[0]
    assert {"путин", "__per__"} <= by_pos[1]


def test_ref_surface_phrase_preserved():
    text = (f"Владимир{ZWJ}__PER__{ZWJ}__putin__ "
            f"Путин{ZWJ}__PER__{ZWJ}__putin__")
    positions = {t: p for t, p in analyze_text(text)}
    assert positions["путин"] - positions["владимир"] == 1


def test_ref_annotated_icu_folding():
    by_pos = _by_pos(f"Café{ZWJ}__PLACE__{ZWJ}__cafe__")
    assert by_pos[0] == {"cafe", "__place__", "__cafe__"}


def test_ref_plain_passthrough_order():
    toks = [t for t, _ in analyze_text("Vladimir Putin is here")]
    assert toks == ["vladimir", "putin", "is", "here"]


def test_ref_content_tokens():
    assert {t for t, _ in analyze_text("Владимир Владимирович Путин")} == \
        {"владимир", "путин", "владимирович"}


def test_ref_names_normalizer_style():
    """The names-kw normalizer semantics (punct→space, squash, lower,
    fold, trim) — reference mapping.py:88-92 — via the name helpers."""
    from openaleph_search_spark.analysis.names import name_parts
    assert name_parts("John O'Connor-Smith & Co.", min_len=1) == \
        ["john", "o", "connor", "smith", "co"]
    assert name_parts("Agent 007!", min_len=1) == ["agent", "007"]
