"""Property-based round-trip tests for the N-Triples codec (hypothesis).

The reference's storage round-trips arbitrary literals including control
characters and 100k-char strings (HalyardTableUtilsTest.java:62-78);
the codec must be a bijection on arbitrary text.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from halyard_spark import nt

text = st.text(min_size=0, max_size=500)


@given(text)
@settings(max_examples=300, deadline=None)
def test_literal_roundtrip(s):
    assert nt.parse_term(nt.lit(s))["value"] == s


@given(text.filter(lambda s: ">" not in s))
@settings(max_examples=200, deadline=None)
def test_iri_roundtrip(s):
    assert nt.parse_term(nt.iri(s))["value"] == s


@given(text, st.sampled_from(["en", "de", "zh-Hans"]))
@settings(max_examples=200, deadline=None)
def test_lang_literal_roundtrip(s, lang):
    t = nt.parse_term(nt.lit(s, lang=lang))
    assert t["value"] == s and t["lang"] == lang


@given(text)
@settings(max_examples=200, deadline=None)
def test_escape_unescape_inverse(s):
    assert nt.unescape(nt.escape(s)) == s
