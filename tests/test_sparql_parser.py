"""SPARQL text front-end conformance-style tests.

Mirrors the reference's W3C-suite strategy
(strategy/src/test/.../W3CApprovedSPARQL11QueryTest.java:34-55): small
in-memory fixture graphs, SPARQL SELECT strings, exact expected binding
sets.  Every query goes through the full tokenizer -> parser -> DataFrame
planner path (query/sparql.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from halyard_spark import nt
from halyard_spark.query.sparql import sparql_query, sparql_select

EX = "http://example.org/"

PREFIXES = f"PREFIX ex: <{EX}> PREFIX xsd: <{nt.XSD}>\n"


def _triples(spark):
    def t(s, p, o):
        return (nt.iri(EX + s), nt.iri(EX + p), o, None)

    rows = [
        t("alice", "type", nt.iri(EX + "Person")),
        t("alice", "name", nt.lit("Alice")),
        t("alice", "age", nt.lit("30", dtype=nt.XSD + "integer")),
        t("alice", "knows", nt.iri(EX + "bob")),
        t("bob", "type", nt.iri(EX + "Person")),
        t("bob", "name", nt.lit("Bob", lang="en")),
        t("bob", "age", nt.lit("25", dtype=nt.XSD + "integer")),
        t("carol", "type", nt.iri(EX + "Person")),
        t("carol", "name", nt.lit("Carol")),
        (nt.iri(EX + "alice"), nt.iri(nt.RDF + "type"), nt.iri(EX + "Admin"), None),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string, ctx string")


@pytest.fixture(scope="module")
def g(spark):
    return _triples(spark)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bgp_and_numeric_filter(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?person ?age WHERE {
          ?person ex:type ex:Person .
          ?person ex:age ?age .
          FILTER (?age > 26)
        }""")
    assert rows(out) == [(nt.iri(EX + "alice"), nt.lit("30", dtype=nt.XSD + "integer"))]


def test_predicate_object_lists_and_a(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?who WHERE { ?who a ex:Admin ; ex:name "Alice" . }""")
    assert rows(out) == [(nt.iri(EX + "alice"),)]


def test_optional_keeps_unmatched(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?person ?friend WHERE {
          ?person ex:type ex:Person .
          OPTIONAL { ?person ex:knows ?friend }
        }""")
    got = {r["person"]: r["friend"] for r in out.collect()}
    assert got[nt.iri(EX + "alice")] == nt.iri(EX + "bob")
    assert got[nt.iri(EX + "carol")] is None


def test_union_and_distinct(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT DISTINCT ?s WHERE {
          { ?s ex:knows ?o } UNION { ?s ex:age ?a }
        }""")
    assert rows(out) == sorted([(nt.iri(EX + "alice"),), (nt.iri(EX + "bob"),)])


def test_minus_disjoint_domain_kept(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?s WHERE { ?s ex:type ex:Person . MINUS { ?s ex:age ?a } }""")
    assert rows(out) == [(nt.iri(EX + "carol"),)]


def test_values_inline_table(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?s ?name WHERE {
          ?s ex:name ?name .
          VALUES ?name { "Alice" "Carol" }
        }""")
    assert len(rows(out)) == 2


def test_order_limit_offset(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?s ?age WHERE { ?s ex:age ?age } ORDER BY DESC(?age) LIMIT 1""")
    assert rows(out) == [(nt.iri(EX + "alice"), nt.lit("30", dtype=nt.XSD + "integer"))]
    out2 = sparql_select(g, PREFIXES + """
        SELECT ?s WHERE { ?s ex:age ?age } ORDER BY ?age LIMIT 1 OFFSET 1""")
    assert rows(out2) == [(nt.iri(EX + "alice"),)]


def test_group_by_count_having(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o }
        GROUP BY ?s HAVING (COUNT(*) >= 4)""")
    assert rows(out) == [(nt.iri(EX + "alice"), 5)]


def test_aggregates_sum_avg_concat(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT (SUM(?age) AS ?total) (AVG(?age) AS ?mean)
               (GROUP_CONCAT(?name; SEPARATOR="|") AS ?names)
        WHERE { ?s ex:age ?age . ?s ex:name ?name }""")
    r = out.collect()[0]
    assert r["total"] == 55.0 and r["mean"] == 27.5
    assert r["names"] == "Alice|Bob"


def test_bind_and_string_functions(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?s ?shout ?l WHERE {
          ?s ex:name ?name .
          BIND (UCASE(STR(?name)) AS ?shout)
          BIND (STRLEN(?name) AS ?l)
          FILTER (STRSTARTS(?name, "A") || CONTAINS(?name, "aro"))
        }""")
    got = {r["shout"]: r["l"] for r in out.collect()}
    assert got == {"ALICE": 5, "CAROL": 5}


def test_filter_not_exists(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?s WHERE {
          ?s ex:type ex:Person .
          FILTER NOT EXISTS { ?s ex:knows ?x }
        }""")
    assert rows(out) == sorted([(nt.iri(EX + "bob"),), (nt.iri(EX + "carol"),)])


def test_term_introspection_functions(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?name (LANG(?name) AS ?lg) (DATATYPE(?name) AS ?dt)
               (ISIRI(?name) AS ?isi) (ISLITERAL(?name) AS ?isl)
        WHERE { ex:bob ex:name ?name }""")
    r = out.collect()[0]
    assert r["lg"] == "en" and r["dt"] == nt.RDF + "langString"
    assert r["isi"] is False and r["isl"] is True


def test_langmatches_and_isnumeric(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?s WHERE { ?s ex:name ?n . FILTER (LANGMATCHES(LANG(?n), "EN")) }""")
    assert rows(out) == [(nt.iri(EX + "bob"),)]
    out2 = sparql_select(g, PREFIXES + """
        SELECT ?s WHERE { ?s ex:age ?a . FILTER (ISNUMERIC(?a)) }""")
    assert len(rows(out2)) == 2
    # plain strings are NOT numeric even when they parse (datatype test)
    out3 = sparql_select(g, PREFIXES + """
        SELECT ?s WHERE { ?s ex:name ?n . FILTER (ISNUMERIC(?n)) }""")
    assert rows(out3) == []


def test_regex_with_flags(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?s WHERE { ?s ex:name ?n . FILTER (REGEX(?n, "^ali", "i")) }""")
    assert rows(out) == [(nt.iri(EX + "alice"),)]


def test_arithmetic_and_if(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?s (IF(?age * 2 >= 60, "old", "young") AS ?cls)
        WHERE { ?s ex:age ?age }""")
    got = dict(rows(out))
    assert got[nt.iri(EX + "alice")] == "old"
    assert got[nt.iri(EX + "bob")] == "young"


def test_repeated_variable_in_pattern(spark):
    spark2 = spark
    rows_ = [("<urn:a>", "<urn:p>", "<urn:a>", None), ("<urn:a>", "<urn:p>", "<urn:b>", None)]
    g2 = spark2.createDataFrame(rows_, "subj string, pred string, obj string, ctx string")
    out = sparql_select(g2, "SELECT ?x WHERE { ?x <urn:p> ?x }")
    assert rows(out) == [("<urn:a>",)]


@pytest.fixture(scope="module")
def chain(spark):
    edges = [(f"<urn:{x}>", "<urn:p:next>", f"<urn:{y}>", None)
             for x, y in [("a", "b"), ("b", "c"), ("c", "d")]]
    return spark.createDataFrame(edges, "subj string, pred string, obj string, ctx string")


def test_property_path_plus_bound_source(spark, chain):
    out = sparql_select(chain, "SELECT ?o WHERE { <urn:a> <urn:p:next>+ ?o }")
    assert rows(out) == [("<urn:b>",), ("<urn:c>",), ("<urn:d>",)]


def test_property_path_star_includes_self(spark, chain):
    out = sparql_select(chain, "SELECT ?o WHERE { <urn:b> <urn:p:next>* ?o }")
    assert rows(out) == [("<urn:b>",), ("<urn:c>",), ("<urn:d>",)]


def test_property_path_question_one_hop(spark, chain):
    out = sparql_select(chain, "SELECT ?o WHERE { <urn:a> <urn:p:next>? ?o }")
    assert rows(out) == [("<urn:a>",), ("<urn:b>",)]


def test_property_path_bound_object(spark, chain):
    out = sparql_select(chain, "SELECT ?s WHERE { ?s <urn:p:next>+ <urn:d> }")
    assert rows(out) == [("<urn:a>",), ("<urn:b>",), ("<urn:c>",)]


def test_property_path_var_var(spark, chain):
    out = sparql_select(chain, "SELECT ?s ?o WHERE { ?s <urn:p:next>+ ?o }")
    assert len(rows(out)) == 6  # full closure of the 4-chain


def test_construct_templates(spark, g):
    out = sparql_query(g, PREFIXES + """
        CONSTRUCT { ?s ex:label ?name . ?s a ex:Named }
        WHERE { ?s ex:name ?name }""")
    got = {tuple(r) for r in out.collect()}
    assert (nt.iri(EX + "alice"), nt.iri(EX + "label"), nt.lit("Alice")) in got
    assert (nt.iri(EX + "carol"), nt.iri(nt.RDF + "type"), nt.iri(EX + "Named")) in got
    assert len(got) == 6  # 3 subjects x 2 templates


def test_ask(spark, g):
    yes = sparql_query(g, PREFIXES + "ASK { ?s ex:knows ?o }").collect()
    assert yes[0]["ask"] is True
    no = sparql_query(g, PREFIXES + "ASK { ?s ex:hates ?o }").collect()
    assert no[0]["ask"] is False


def test_describe_iri(spark, g):
    out = sparql_query(g, PREFIXES + "DESCRIBE ex:alice")
    got = {tuple(r) for r in out.collect()}
    # alice's 5 triples + one-hop subject triples of its IRI objects (bob's 3)
    assert len(got) == 8
    assert (nt.iri(EX + "bob"), nt.iri(EX + "age"), nt.lit("25", dtype=nt.XSD + "integer")) in got


def test_describe_var_with_where(spark, g):
    out = sparql_query(g, PREFIXES + "DESCRIBE ?s WHERE { ?s ex:age ?a . FILTER(?a > 26) }")
    subjects = {r["subj"] for r in out.collect()}
    assert nt.iri(EX + "alice") in subjects


def test_xsd_cast_and_order_expr(spark, g):
    out = sparql_select(g, PREFIXES + """
        SELECT ?s (xsd:integer(?age) AS ?n) WHERE { ?s ex:age ?age }
        ORDER BY DESC(xsd:integer(?age))""")
    got = [r["n"] for r in out.collect()]
    assert got == [30, 25]


def test_sparql_update_data_and_modify(spark):
    from halyard_spark.query.sparql import sparql_update

    g = spark.createDataFrame(
        [("<urn:a>", "<urn:p:st>", nt.lit("old"), "<urn:g1>")],
        "subj string, pred string, obj string, ctx string",
    )
    out = sparql_update(g, """
        INSERT DATA { <urn:b> <urn:p:st> "fresh" } ;
        DELETE { ?s <urn:p:st> "old" } INSERT { ?s <urn:p:st> "renewed" }
        WHERE { ?s <urn:p:st> "old" }
    """)
    got = {(r["subj"], r["obj"]) for r in out.collect()}
    assert got == {("<urn:b>", nt.lit("fresh")), ("<urn:a>", nt.lit("renewed"))}


def test_sparql_update_delete_where_and_stage_isolation(spark):
    from halyard_spark.query.sparql import sparql_update

    g = spark.createDataFrame(
        [
            ("<urn:a>", "<urn:p>", nt.lit("1"), None),
            ("<urn:b>", "<urn:p>", nt.lit("2"), None),
        ],
        "subj string, pred string, obj string, ctx string",
    )
    # stage 1 rewrites 1->9; stage 2 deletes what stage 1 PRODUCED —
    # snapshot isolation means stage 2 sees stage 1's committed result
    out = sparql_update(g, """
        DELETE { ?s <urn:p> "1" } INSERT { ?s <urn:p> "9" } WHERE { ?s <urn:p> "1" } ;
        DELETE WHERE { ?s <urn:p> "9" }
    """)
    got = {(r["subj"], r["obj"]) for r in out.collect()}
    assert got == {("<urn:b>", nt.lit("2"))}


def test_sparql_update_ground_only_data(spark):
    import pytest as _pytest

    from halyard_spark.query.sparql import sparql_update

    g = spark.createDataFrame([], "subj string, pred string, obj string, ctx string")
    with _pytest.raises(SyntaxError):
        sparql_update(g, 'INSERT DATA { ?s <urn:p> "x" }')


def test_strbefore_strafter_encode(spark, g):
    out = sparql_query(g, PREFIXES + """
        SELECT ?name (STRBEFORE(?name, "li") AS ?b) (STRAFTER(?name, "li") AS ?a)
               (ENCODE_FOR_URI(CONCAT(?name, " & co")) AS ?enc)
        WHERE { ex:alice ex:name ?name }""")
    r = out.collect()[0]
    assert r["b"] == "A" and r["a"] == "ce"
    assert "%20%26%20" in r["enc"] or "+%26+" in r["enc"]  # space/& encoded


def test_in_not_in_and_coalesce(spark, g):
    out = sparql_query(g, PREFIXES + """
        SELECT ?s WHERE { ?s ex:name ?n . FILTER (?n IN ("Alice", "Bob")) }""")
    assert len(rows(out)) == 2
    out2 = sparql_query(g, PREFIXES + """
        SELECT ?s (COALESCE(?friend, ?s) AS ?c) WHERE {
          ?s ex:type ex:Person . OPTIONAL { ?s ex:knows ?friend }
        }""")
    got = dict(rows(out2))
    assert got[nt.iri(EX + "bob")] == nt.iri(EX + "bob")  # unbound -> fallback
    assert got[nt.iri(EX + "alice")] == nt.iri(EX + "bob")


def test_datetime_accessors_and_uuid(spark):
    g2 = spark.createDataFrame(
        [("<urn:e>", "<urn:p:at>", nt.lit("2024-03-05 06:07:08"), None)],
        "subj string, pred string, obj string, ctx string",
    )
    out = sparql_query(g2, """
        SELECT (YEAR(?t) AS ?y) (MONTH(?t) AS ?mo) (DAY(?t) AS ?d)
               (HOURS(?t) AS ?h) (MINUTES(?t) AS ?mi) (SECONDS(?t) AS ?sec)
               (STRUUID() AS ?u1) (STRUUID() AS ?u2)
        WHERE { ?e <urn:p:at> ?t }""")
    r = out.collect()[0]
    assert (r["y"], r["mo"], r["d"], r["h"], r["mi"], r["sec"]) == (2024, 3, 5, 6, 7, 8)
    assert len(r["u1"]) == 36 and r["u1"] != r["u2"]


def test_nested_groups_and_comments(spark, g):
    out = sparql_query(g, PREFIXES + """
        # leading comment
        SELECT ?s WHERE {
          { ?s ex:type ex:Person }   # inline comment
          { ?s ex:knows ?o }
        }""")
    assert rows(out) == [(nt.iri(EX + "alice"),)]


def test_bnode_function_is_deterministic(spark, g):
    out = sparql_query(g, PREFIXES + """
        SELECT ?s (BNODE(STR(?s)) AS ?b) WHERE { ?s ex:type ex:Person }""")
    a = dict(rows(out))
    b = dict(rows(sparql_query(g, PREFIXES + """
        SELECT ?s (BNODE(STR(?s)) AS ?b) WHERE { ?s ex:type ex:Person }""")))
    assert a == b  # seeded skolemization: stable across evaluations
    assert all(v.startswith("_:") for v in a.values())


def test_update_prologue_per_operation():
    """SPARQL 1.1 grammar: Update ::= Prologue ( Update1 ( ';' Update )? )?
    — each ';'-separated operation may carry its own PREFIX/BASE
    declarations, accumulating across the sequence (real update scripts
    concatenated from fragments rely on this)."""
    from halyard_spark.query.sparql import _Parser, _parse_update_ops, tokenize

    ops = _parse_update_ops(_Parser(tokenize(
        "PREFIX ex: <urn:x:> INSERT DATA { ex:a ex:p 1 } ; "
        "PREFIX ey: <urn:y:> INSERT DATA { ey:b ey:q 2 ; ex:p 3 }"
    )))
    assert [o[0] for o in ops] == ["insert_data", "insert_data"]
    # second op used BOTH the new ey: and the carried-over ex: prefix
    quads = ops[1][1]
    preds = {q[1][1] if q[1][0] == "iri" else None for q in quads}
    assert preds == {"urn:y:q", "urn:x:p"}
    # trailing ';' followed by a prologue-only tail is still a valid end
    assert [o[0] for o in _parse_update_ops(_Parser(tokenize(
        "CLEAR DEFAULT ; PREFIX ex: <urn:x:>")))] == ["clear"]
