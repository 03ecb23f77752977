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


# -- r6 optimization: exact embedding-pair join-condition ordering --------

def test_exact_embedding_condition_orders_cheap_cut_first(spark):
    """The exact path's nested-loop condition must evaluate `a < b`
    BEFORE the cosine fold: And short-circuits, and letting Catalyst
    push the threshold filter in front of the comparison made every
    ordered pair pay the interpreted fold (r6 regression guard).  Also
    pins the boundary semantics: a pair exactly AT the threshold stays
    included."""
    from pyspark.sql import Row

    from halyard_spark.ops import dedup as D

    emb = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 0.0]),
         Row(vec_id=2, embedding=[0.0, 1.0]),   # cos(1,2) = 0.0
         Row(vec_id=3, embedding=[1.0, 1.0])]   # cos(1,3) = cos(2,3) ~ 0.7071
    )
    pairs = D.embedding_cosine_pairs(emb, 0.5, method="exact")
    got = {(r["a"], r["b"]): r["cos"] for r in pairs.collect()}
    assert set(got) == {(1, 3), (2, 3)}
    assert abs(got[(1, 3)] - 0.707107) < 1e-6
    # exact threshold boundary: cos == t must be kept (>=, not >).
    # 1/sqrt(2) as a Python double is bit-identical to Spark's
    # 1.0 / (1.0 * SQRT(2.0)) for these vectors.
    import math

    at_t = D.embedding_cosine_pairs(emb, 1.0 / math.sqrt(2.0), method="exact")
    assert {(r["a"], r["b"]) for r in at_t.collect()} == {(1, 3), (2, 3)}
    # plan gate: the join condition's first conjunct is the id comparison,
    # not the aggregate fold (the join prints as BroadcastNestedLoopJoin
    # or CartesianProduct depending on side sizes; both inline the
    # condition on their operator line)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    join_line = next(
        ln for ln in plan.splitlines()
        if "NestedLoopJoin" in ln or "CartesianProduct" in ln
    )
    assert join_line.index(" < ") < join_line.index("aggregate("), join_line
