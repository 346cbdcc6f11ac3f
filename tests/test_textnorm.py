"""Normalizer (M9/M10) + mention extraction (M6 analog) + context terms (M11)."""

import pyarrow as pa

from wned_ray.functions.textnorm import (
    context_terms, extract_mentions, normalize_names)


def test_normalize_names_reference_semantics():
    arr = pa.array([
        "  Dr.  Varnel   Cortiva ",
        "VARNEL CORTIVA INC",
        "Mr. John Smith Ltd.",
        "Acme Corp.",
        "plain name",
        "Trailing.",
    ])
    got = normalize_names(arr).to_pylist()
    assert got == [
        "varnel cortiva",
        "varnel cortiva",
        "john smith",
        "acme",
        "plain name",
        "trailing",
    ]


def test_normalize_can_disable_stripping():
    arr = pa.array(["Dr. Who Inc"])
    got = normalize_names(arr, strip_titles=False, strip_corp=False).to_pylist()
    assert got == ["dr. who inc"]


def test_extract_mentions():
    arr = pa.array([
        "we talked about Varnel Cortiva in the meeting",
        "ask Dr. Jane Smith about it",
        "no entities here at all",
        "UAB Holdings announced numbers",
    ])
    got = extract_mentions(arr).to_pylist()
    assert got == ["Varnel Cortiva", "Dr. Jane Smith", "", "UAB Holdings"]


def test_context_terms_drops_mention_and_stopwords():
    arr = pa.array(["we talked about Varnel Cortiva in the meeting"])
    mention = extract_mentions(arr)
    terms = context_terms(arr, mention).to_pylist()
    assert "varnel" not in terms[0]
    assert "the" not in terms[0] and "in" not in terms[0]
    assert "meeting" in terms[0] and "talked" in terms[0]
