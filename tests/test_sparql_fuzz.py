"""Property-based robustness for the SPARQL front-end's text layer.

The tokenizer/parser must FAIL CLOSED: any input either tokenizes/parses
or raises SyntaxError — never an unhandled exception, never a hang
(the endpoint turns SyntaxError into a protocol 400; anything else
would 500).  No Spark session needed: this exercises the pure text
layer only.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from halyard_spark.query.sparql import _Parser, tokenize


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_tokenizer_total(garbage):
    try:
        toks = tokenize(garbage)
    except SyntaxError:
        return
    assert toks[-1].kind == "EOF"


@given(st.text(max_size=160))
@settings(max_examples=200, deadline=None)
def test_parser_fails_closed(garbage):
    query = "SELECT ?s WHERE { ?s ?p " + garbage + " }"
    try:
        _Parser(tokenize(query)).parse()
    except SyntaxError:
        pass  # the only acceptable failure mode


_IDENT = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True)


@given(
    subj=_IDENT, pred=_IDENT, obj=_IDENT,
    label=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30
    ),
)
@settings(max_examples=200, deadline=None)
def test_wellformed_queries_always_parse(subj, pred, obj, label):
    from halyard_spark import nt

    lit = nt.lit(label)  # escape-aware literal serialization
    query = (
        f"PREFIX ex: <urn:ex:> SELECT ?{subj} WHERE {{ "
        f"?{subj} ex:{pred} ?{obj} . ?{obj} ex:name {lit} }} LIMIT 3"
    )
    q = _Parser(tokenize(query)).parse()
    assert q.limit == 3 and len(q.where) == 2


def test_select_star_with_group_by_raises():
    with pytest.raises(SyntaxError, match="SELECT \\*"):
        _q = "SELECT * WHERE { ?s ?p ?o } GROUP BY ?s"
        # plan-time guard: needs a planner; parsing alone is legal
        from halyard_spark.query.sparql import Query, _Planner  # noqa: F401

        parsed = _Parser(tokenize(_q)).parse()
        # invoke the guard without a Spark session via a duck-typed planner
        class _Fake(_Planner):
            def __init__(self):  # bypass DataFrame plumbing
                self.graph = None
                self.dataset = (None, None)

            def eval_group(self, elems):
                raise AssertionError("should raise before evaluation")

        _Fake().plan_select(parsed, df=_DfStub())


class _DfStub:
    columns: list = []
