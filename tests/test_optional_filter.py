"""OPTIONAL { P FILTER(F) } — F is the LeftJoin CONDITION (SPARQL 1.1
§18.2.2.5), evaluated over the MERGED solution, so it sees the outer
group's bindings (the dawg-optional-filter shape).  The reference gets
this from RDF4J's algebra translation feeding
HalyardTupleExprEvaluation's LeftJoin (HTEE:770-866, condition arg).

Edge cases here stress the Diff branch of LeftJoin (left rows whose
every extension failed the filter come back UNEXTENDED) under bag
multiplicity, NULL-as-UNBOUND wildcard columns, EXISTS conditions, and
filters over variables bound on neither side.
"""

from __future__ import annotations

import pytest

from halyard_spark import nt
from halyard_spark.query.sparql import sparql_query

EX = "http://example.org/"
PREFIXES = f"PREFIX ex: <{EX}>\n"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def bag(df):
    out: dict = {}
    for r in df.collect():
        out[tuple(r)] = out.get(tuple(r), 0) + 1
    return out


def iri(x):
    return nt.iri(EX + x)


def num(n):
    return nt.lit(str(n), dtype=XSD_INT)


@pytest.fixture(scope="module")
def store(spark):
    data = [
        (iri("alice"), iri("name"), nt.lit("Alice"), None),
        (iri("alice"), iri("age"), num(30), None),
        (iri("bob"), iri("name"), nt.lit("Bob"), None),
        (iri("bob"), iri("age"), num(40), None),
        (iri("carol"), iri("name"), nt.lit("Carol"), None),
        # bob has TWO emails — multiplicity fodder
        (iri("alice"), iri("mbox"), nt.lit("a@x"), None),
        (iri("bob"), iri("mbox"), nt.lit("b1@x"), None),
        (iri("bob"), iri("mbox"), nt.lit("b2@x"), None),
    ]
    return spark.createDataFrame(
        data, "subj string, pred string, obj string, ctx string"
    )


def test_filter_sees_outer_binding(store):
    """The dawg-optional-filter shape: ?n is bound OUTSIDE the optional
    group; inner-scoped evaluation would make the filter a type error
    for everyone and leave even Alice unextended."""
    out = sparql_query(store, PREFIXES + """
        SELECT ?s ?a WHERE {
          ?s ex:name ?n OPTIONAL { ?s ex:age ?a FILTER(?n = "Alice") }
        }""")
    assert rows(out) == [
        (iri("alice"), num(30)),
        (iri("bob"), None),
        (iri("carol"), None),
    ]


def test_filter_mixing_inner_and_outer(store):
    out = sparql_query(store, PREFIXES + """
        SELECT ?s ?a WHERE {
          ?s ex:name ?n
          OPTIONAL { ?s ex:age ?a FILTER(?a = 40 && ?n = "Bob") }
        }""")
    assert rows(out) == [
        (iri("alice"), None),
        (iri("bob"), num(40)),
        (iri("carol"), None),
    ]


def test_inner_only_filter_keeps_cheap_path(store):
    """Every free var of the filter is introduced only by the optional
    side: filtering the right side first is equivalent (and is the plan
    we keep) — the answer must match the general translation."""
    out = sparql_query(store, PREFIXES + """
        SELECT ?s ?a WHERE {
          ?s ex:name ?n OPTIONAL { ?s ex:age ?a FILTER(?a > 35) }
        }""")
    assert rows(out) == [
        (iri("alice"), None),
        (iri("bob"), num(40)),
        (iri("carol"), None),
    ]


def test_bag_multiplicity_through_diff_branch(store):
    """bob's two mbox rows must EACH come back unextended when the
    lifted filter kills his extension; alice's single row extends."""
    out = sparql_query(store, PREFIXES + """
        SELECT ?s ?m ?a WHERE {
          ?s ex:mbox ?m . ?s ex:name ?n
          OPTIONAL { ?s ex:age ?a FILTER(?n = "Alice") }
        }""")
    assert bag(out) == {
        (iri("alice"), nt.lit("a@x"), num(30)): 1,
        (iri("bob"), nt.lit("b1@x"), None): 1,
        (iri("bob"), nt.lit("b2@x"), None): 1,
    }


def test_unbound_everywhere_var_errors_to_unextended(store):
    """FILTER over a var bound on NEITHER side is a type error for every
    merged row -> every left row survives unextended."""
    out = sparql_query(store, PREFIXES + """
        SELECT ?s ?a WHERE {
          ?s ex:name ?n OPTIONAL { ?s ex:age ?a FILTER(?ghost = 1) }
        }""")
    assert rows(out) == [
        (iri("alice"), None),
        (iri("bob"), None),
        (iri("carol"), None),
    ]


def test_wildcard_unbound_left_var_in_condition(store):
    """The outer var the filter reads is NULL-as-UNBOUND for one left
    row (VALUES UNDEF): comparing UNBOUND is a type error -> that row
    comes back unextended, while the bound rows filter normally."""
    out = sparql_query(store, PREFIXES + """
        SELECT ?s ?want ?a WHERE {
          VALUES (?s ?want) { (ex:alice "Alice") (ex:bob UNDEF) }
          ?s ex:name ?n
          OPTIONAL { ?s ex:age ?a FILTER(?want = ?n) }
        }""")
    assert rows(out) == [
        (iri("alice"), nt.lit("Alice"), num(30)),
        (iri("bob"), None, None),
    ]


def test_exists_in_lifted_condition(store):
    """EXISTS inside the optional's filter correlates against the
    MERGED scope: only subjects with an mbox keep their extension."""
    out = sparql_query(store, PREFIXES + """
        SELECT ?s ?a WHERE {
          ?s ex:name ?n
          OPTIONAL { ?s ex:age ?a FILTER(?n != "nobody" && EXISTS { ?s ex:mbox ?m }) }
        }""")
    assert rows(out) == [
        (iri("alice"), num(30)),
        (iri("bob"), num(40)),
        (iri("carol"), None),
    ]


def test_two_filters_both_lift(store):
    out = sparql_query(store, PREFIXES + """
        SELECT ?s ?a WHERE {
          ?s ex:name ?n
          OPTIONAL { ?s ex:age ?a FILTER(?n = "Bob") FILTER(?a = 40) }
        }""")
    assert rows(out) == [
        (iri("alice"), None),
        (iri("bob"), num(40)),
        (iri("carol"), None),
    ]


def test_nested_group_filter_does_not_lift(store):
    """A filter inside a NESTED group of the optional keeps its own
    scope (§18.2.2.5 lifts only the optional group's top level): there
    ?n is unbound -> type error -> the nested group is empty -> the
    optional side is empty -> everyone unextended."""
    out = sparql_query(store, PREFIXES + """
        SELECT ?s ?a WHERE {
          ?s ex:name ?n
          OPTIONAL { { ?s ex:age ?a FILTER(?n = "Alice") } }
        }""")
    assert rows(out) == [
        (iri("alice"), None),
        (iri("bob"), None),
        (iri("carol"), None),
    ]


def test_leading_optional_with_filter(store):
    """Group starting with OPTIONAL: LeftJoin(μ0, P, F).  The filter
    references only inner vars here; μ0 extends iff any row passes."""
    out = sparql_query(store, PREFIXES + """
        SELECT ?s WHERE { OPTIONAL { ?s ex:age ?a FILTER(?a > 100) } }""")
    assert rows(out) == [(None,)]
