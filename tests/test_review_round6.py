"""Regression tests for the round-5 ADVICE.md findings fixed in round 6:
parse-time static rules that previously let invalid grouped-query and
update-template shapes through to the planner.
"""

from __future__ import annotations

import pytest

from halyard_spark import nt
from halyard_spark.query.sparql import sparql_query, sparql_update

EX = "http://example.org/"


def _store(spark, rows=None):
    rows = rows or [
        (nt.iri(EX + "s"), nt.iri(EX + "p"), nt.lit("1", dtype=nt.XSD + "integer"), None)
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, ctx string"
    )


# -- ADVICE #1: SELECT * in a grouped query (§18.2.4.1) ------------------

def test_select_star_with_group_by_rejected(spark):
    with pytest.raises(SyntaxError):
        sparql_query(_store(spark), "SELECT * WHERE { ?s ?p ?o } GROUP BY ?s")


def test_select_star_with_having_rejected(spark):
    with pytest.raises(SyntaxError):
        sparql_query(_store(spark), "SELECT * WHERE { ?s ?p ?o } HAVING (COUNT(*) > 1)")


def test_select_star_ungrouped_still_fine(spark):
    assert sparql_query(_store(spark), "SELECT * WHERE { ?s ?p ?o }").count() == 1


# -- ADVICE #2: non-group-key vars in HAVING / ORDER BY ------------------

def test_having_non_group_key_var_rejected(spark):
    with pytest.raises(SyntaxError):
        sparql_query(
            _store(spark),
            "SELECT ?s WHERE { ?s ?p ?o } GROUP BY ?s HAVING (?o > 1)",
        )


def test_order_by_non_group_key_var_rejected(spark):
    with pytest.raises(SyntaxError):
        sparql_query(
            _store(spark),
            "SELECT ?s WHERE { ?s ?p ?o } GROUP BY ?s ORDER BY ?o",
        )


def test_having_on_group_key_and_aggregate_still_fine(spark):
    df = sparql_query(
        _store(spark),
        'SELECT ?s WHERE { ?s ?p ?o } GROUP BY ?s '
        'HAVING (COUNT(*) > 0 && ?s != "x") ORDER BY ?s',
    )
    assert df.count() == 1


def test_order_by_select_alias_still_fine(spark):
    df = sparql_query(
        _store(spark),
        "SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s ORDER BY ?n",
    )
    assert df.count() == 1


# -- ADVICE #3: property path as a template-quad predicate ----------------

def test_insert_data_property_path_rejected(spark):
    with pytest.raises(SyntaxError):
        sparql_update(
            _store(spark),
            f"INSERT DATA {{ <{EX}a> <{EX}p>/<{EX}q> <{EX}b> }}",
        )


def test_delete_insert_template_property_path_rejected(spark):
    with pytest.raises(SyntaxError):
        sparql_update(
            _store(spark),
            f"INSERT {{ ?s <{EX}p>+ ?o }} WHERE {{ ?s ?p ?o }}",
        )


def test_insert_data_plain_iri_still_fine(spark):
    out = sparql_update(
        _store(spark), f"INSERT DATA {{ <{EX}a> <{EX}p> <{EX}b> }}"
    )
    assert out.count() == 2
