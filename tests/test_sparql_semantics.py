"""W3C-conformance-style semantic edge cases (FIXTURES.md B6, B3, B4) —
the behaviors that distinguish SPARQL algebra from plain relational ops,
line-mapped to the reference implementations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from halyard_spark import nt
from halyard_spark.query import algebra as A
from halyard_spark.query import exprs as E


def test_minus_disjoint_domain_row_kept(spark):
    """MINUS drops left rows compatible with a right row sharing >=1 var;
    rows whose domains are DISJOINT are kept
    (HalyardTupleExprEvaluation.java:968-985)."""
    left = spark.createDataFrame([(1, "a"), (2, "b")], "x int, y string")
    right_shared = spark.createDataFrame([(1,)], "x int")
    assert {r.x for r in A.minus(left, right_shared).collect()} == {2}
    # no shared variables at all -> nothing removed
    right_disjoint = spark.createDataFrame([("zzz",)], "z string")
    assert A.minus(left, right_disjoint).count() == 2


def test_filter_error_is_false(spark):
    """FILTER: a type error makes the row FALSE, not a query failure
    (HalyardTupleExprEvaluation.java:346-360).  '12' < 20 is a numeric
    compare; 'abc' < 20 is a type error -> dropped."""
    df = spark.createDataFrame([('"12"',), ('"abc"',), ('"30"',)], "v string")
    cond = E.try_numeric("v") < 20
    out = df.filter(E.filter_cond(cond))
    assert {r.v for r in out.collect()} == {'"12"'}


def test_bind_error_is_unbound(spark):
    """BIND: evaluation error leaves the variable unbound (NULL), the row
    survives (HalyardTupleExprEvaluation.java:579-585)."""
    df = spark.createDataFrame([('"5"',), ('"oops"',)], "v string")
    out = df.withColumn("doubled", E.bind_safe(E.try_numeric("v") * 2))
    rows = {r.v: r.doubled for r in out.collect()}
    assert rows['"5"'] == 10.0 and rows['"oops"'] is None
    assert out.count() == 2


def test_badly_designed_optional(spark):
    """OPTIONAL whose condition references a var bound outside the right
    pattern (Perez et al. §4.2; HalyardTupleExprEvaluation.java:770-866):
    the condition must be evaluated in the JOIN scope, not pushed into the
    right side as a pre-filter."""
    people = spark.createDataFrame([("alice", 10), ("bob", 99)], "name string, threshold int")
    scores = spark.createDataFrame([("alice", 50), ("bob", 50)], "name string, score int")
    out = A.optional_join(people, scores, condition=F.col("score") > F.col("threshold"))
    rows = {r.name: r.score for r in out.collect()}
    # alice: 50 > 10 -> extended; bob: 50 > 99 fails -> kept with NULL
    assert rows == {"alice": 50, "bob": None}


def test_union_bag_keeps_duplicates(spark):
    a = spark.createDataFrame([(1,)], "x int")
    assert A.union_bag(a, a).count() == 2


def test_values_compatibility_join(spark):
    """VALUES merge: rows merge when shared vars agree, conflict -> drop
    (HalyardTupleExprEvaluation.java:1106-1145)."""
    incoming = spark.createDataFrame([(1, "p"), (2, "q")], "x int, y string")
    vals = A.values_table(spark, [(1, "extra")], "x int, z string")
    out = A.bgp_join(incoming, vals)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].y == "p" and rows[0].z == "extra"


def test_sparql_order_key_type_ranking(spark):
    """ORDER BY over mixed terms: bnode < IRI < literal, numerics by value
    (ValueComparator semantics)."""
    df = spark.createDataFrame(
        [('"10"',), ('"2"',), ("<urn:z>",), ("_:b",), ('"apple"',)], "t string"
    )
    got = [r.t for r in df.orderBy(*E.order_key("t")).collect()]
    assert got == ["_:b", "<urn:z>", '"2"', '"10"', '"apple"']


def test_big_literal_roundtrip_pipeline(spark):
    """100k-char literal shape (HalyardTableUtilsTest.java:62-78): survives
    nt encode/decode and the extract stage's sha256 invariant."""
    big = "x" * 100_000 + '"quote\ttab\nnl'
    term = nt.lit(big)
    assert nt.parse_term(term)["value"] == big

    import hashlib

    src = spark.createDataFrame(
        [("r/big", "src/p/big.py", "c", "python", "class Big:\n    pass\n# " + big)],
        "repo string, path string, commit string, lang string, content string",
    )
    from halyard_spark.pipeline import extract

    m = extract.extract_mentions(src).select("content_sha256").first()
    expected = hashlib.sha256(("class Big:\n    pass\n# " + big).encode()).hexdigest()
    assert m["content_sha256"] == expected


def test_dedup_hash_collision_defense(spark):
    """B3: dedup must be on full values, never hash alone.  exact_dedup
    groups by digest; equal digests with different text (a collision)
    must NOT merge — verified by the value-equality confirmation."""
    from halyard_spark.ops.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")], "doc_id long, text string"
    )
    got = {(r.doc_id, r.canonical_id) for r in exact_dedup(docs).collect()}
    assert got == {(1, 1), (2, 1), (3, 3)}
