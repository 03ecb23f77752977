"""Fulltext scan, ND-JSON-LD reader, summary/stats-RDF unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from halyard_spark import nt
from halyard_spark.pipeline import stats as ST
from halyard_spark.query.fulltext import fulltext_scan, parse_query, search_literals
from halyard_spark.sources.rio import ndjsonld_to_triples


def _g(spark):
    rows = [
        ("<urn:d1>", "<urn:p:title>", nt.lit("The Quick Brown Fox"), None),
        ("<urn:d2>", "<urn:p:title>", nt.lit("quick fixes for slow foxes"), None),
        ("<urn:d3>", "<urn:p:title>", nt.lit("nothing to see"), None),
        ("<urn:d4>", "<urn:p:ref>", "<urn:quick>", None),  # IRI: never matches
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string, ctx string")


def test_parse_query_terms_and_phrases():
    assert parse_query('alpha "two words" beta') == ["alpha", "two words", "beta"]


def test_fulltext_scan_matches_literals_only(spark):
    g = _g(spark)
    got = {r["subj"] for r in fulltext_scan(g, "quick fox").collect()}
    assert got == {"<urn:d1>", "<urn:d2>"}  # case-insensitive, AND semantics
    got2 = {r["subj"] for r in fulltext_scan(g, '"quick brown"').collect()}
    assert got2 == {"<urn:d1>"}  # phrase = exact substring
    assert fulltext_scan(g, "urn:quick").count() == 0  # IRIs excluded


def test_search_literals_batch(spark):
    g = _g(spark)
    qs = spark.createDataFrame([("q1", "fox"), ("q2", "nothing")], "query_id string, query string")
    got = {(r["query_id"], r["subj"]) for r in search_literals(g, qs).collect()}
    assert got == {("q1", "<urn:d1>"), ("q1", "<urn:d2>"), ("q2", "<urn:d3>")}


def test_search_literals_single_store_scan(spark, tmp_path):
    """Set-oriented contract: Q queries compile into ONE store scan (the
    old shape unioned one full scan per query)."""
    store = str(tmp_path / "store")
    _g(spark).write.parquet(store)
    g = spark.read.parquet(store)
    qs = spark.createDataFrame(
        [(f"q{i}", w) for i, w in enumerate(["fox", "quick", "see", "slow", "brown"])],
        "query_id string, query string",
    )
    out = search_literals(g, qs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    # a query matching multiple rows and a row matching multiple queries
    got = {(r["query_id"], r["subj"]) for r in out.collect()}
    assert ("q0", "<urn:d1>") in got and ("q1", "<urn:d1>") in got


def test_fulltext_magic_literal_in_sparql(spark):
    """An object literal typed halyard-spark:search inside a SPARQL triple
    pattern triggers the fulltext scan (HBaseSail.java:392-398 datatype
    dispatch), not an equality filter."""
    from halyard_spark.query.sparql import sparql_query

    g = _g(spark)
    out = sparql_query(g, f"""
        SELECT ?s WHERE {{ ?s <urn:p:title> "quick fox"^^<{nt.NS}search> }}""")
    assert {r["s"] for r in out.collect()} == {"<urn:d1>", "<urn:d2>"}


def test_ndjsonld_reader(spark):
    lines = [
        '{"@context": {"ex": "http://ex.org/", "name": "http://ex.org/name"},'
        ' "@id": "ex:a", "@type": "ex:Person", "name": "Alice",'
        ' "ex:age": 30, "ex:knows": {"@id": "ex:b"}}',
        '{"@id": "http://ex.org/b", "http://ex.org/name":'
        ' {"@value": "Bob", "@language": "en"}}',
        'not json at all',  # dirty-parse tolerance: skipped
        '{"name": "anon doc"}',  # no @id -> deterministic skolem bnode
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    got = {(r["subj"], r["pred"], r["obj"]) for r in ndjsonld_to_triples(df).collect()}
    ex = "http://ex.org/"
    assert (nt.iri(ex + "a"), nt.iri(nt.RDF + "type"), nt.iri(ex + "Person")) in got
    assert (nt.iri(ex + "a"), nt.iri(ex + "name"), nt.lit("Alice")) in got
    assert (nt.iri(ex + "a"), nt.iri(ex + "age"), nt.lit("30", dtype=nt.XSD + "integer")) in got
    assert (nt.iri(ex + "a"), nt.iri(ex + "knows"), nt.iri(ex + "b")) in got
    assert (nt.iri(ex + "b"), nt.iri(ex + "name"), nt.lit("Bob", lang="en")) in got
    anon = [s for s, p, o in got if o == nt.lit("anon doc")]
    assert len(anon) == 1 and anon[0].startswith("_:b")
    # determinism: same input -> same skolem ids regardless of partitioning
    again = {(r["subj"], r["pred"], r["obj"])
             for r in ndjsonld_to_triples(df.repartition(4)).collect()}
    assert again == got


def test_summary_domain_range(spark):
    t = nt.iri(nt.RDF + "type")
    rows = [
        ("<urn:a>", t, "<urn:T:A>", None),
        ("<urn:b>", t, "<urn:T:B>", None),
        ("<urn:a>", "<urn:p:knows>", "<urn:b>", None),
        ("<urn:a>", "<urn:p:name>", nt.lit("x"), None),
    ]
    g = spark.createDataFrame(rows, "subj string, pred string, obj string, ctx string")
    got = {(r["stat_kind"], r["pred"], r["domain"], r["range"], r["est_count"])
           for r in ST.summary(g, decimation=1).collect()}
    assert ("class", None, "<urn:T:A>", None, 1) in got
    assert ("predicate", "<urn:p:knows>", None, None, 1) in got
    assert ("domain", "<urn:p:name>", "<urn:T:A>", None, 1) in got
    assert ("range", "<urn:p:knows>", None, "<urn:T:B>", 1) in got
    assert ("domain_range", "<urn:p:knows>", "<urn:T:A>", "<urn:T:B>", 1) in got


def test_stats_rdf_emits_void_quads(spark):
    rows = [
        ("<urn:a>", "<urn:p>", "<urn:b>", "<urn:graph:g1>"),
        ("<urn:a>", "<urn:p>", "<urn:c>", None),
    ]
    g = spark.createDataFrame(rows, "subj string, pred string, obj string, ctx string")
    out = ST.stats_rdf(g)
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    one = nt.lit("1", dtype=nt.XSD + "integer")
    assert ("<urn:graph:g1>", f"<{ST.VOID}triples>", one) in got
    assert (ST.DEFAULT_GRAPH_IRI, f"<{ST.VOID}distinctObjects>", one) in got
    assert {r["ctx"] for r in out.collect()} == {ST.STATS_GRAPH}


def test_es_index_sink_bulk_bodies(spark, tmp_path):
    """The ES sink emits well-formed _bulk ND-JSON with content-derived
    ids, deduped across identical literals (transport injected)."""
    import glob
    import hashlib
    import json as _json
    import os
    import uuid

    from halyard_spark.sources.es_index import build_index_docs, bulk_index

    rows = [
        ("<urn:a>", "<urn:p>", nt.lit("hello world"), None),
        ("<urn:b>", "<urn:p>", nt.lit("hello world"), None),  # dup literal
        ("<urn:c>", "<urn:p>", nt.lit("other"), None),
        ("<urn:c>", "<urn:q>", "<urn:d>", None),  # IRI: not indexed
    ]
    g = spark.createDataFrame(rows, "subj string, pred string, obj string, ctx string")

    out_dir = str(tmp_path / "bulk")
    os.makedirs(out_dir, exist_ok=True)

    def transport(body: str) -> None:
        with open(os.path.join(out_dir, f"{uuid.uuid4().hex}.ndjson"), "w") as f:
            f.write(body)

    bulk_index(g, transport, batch_docs=1)
    lines = []
    for fn in glob.glob(f"{out_dir}/*.ndjson"):
        lines.extend(l for l in open(fn).read().splitlines() if l)
    actions = [_json.loads(l) for l in lines[0::2]]
    docs = [_json.loads(l) for l in lines[1::2]]
    labels = sorted(d["l"] for d in docs)
    assert labels == ["hello world", "other"]  # deduped, IRIs excluded
    expect_id = hashlib.sha1(nt.lit("hello world").encode()).hexdigest()
    assert {a["index"]["_id"] for a in actions} >= {expect_id}
    assert build_index_docs(g).count() == 2


def test_ntriples_source_and_load(spark, tmp_path):
    """Native N-Triples/N-Quads line source: JVM-side regex parse,
    dirty-parse tolerant; LOAD INTO GRAPH ingests it as an update stage."""
    from halyard_spark.query.sparql import sparql_update
    from halyard_spark.sources.rio import read_ntriples

    p = tmp_path / "data.nq"
    p.write_text(
        "# comment line\n"
        '<urn:a> <urn:p> "hello" .\n'
        '<urn:b> <urn:p> "tagged"@en <urn:g1> .\n'
        '<urn:c> <urn:p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        "malformed junk line\n"
        "_:b1 <urn:q> <urn:a> .\n"
        "\n"
    )
    df = read_ntriples(spark, str(p))
    got = {(r["subj"], r["obj"], r["ctx"]) for r in df.collect()}
    assert got == {
        ("<urn:a>", '"hello"', None),
        ("<urn:b>", '"tagged"@en', "<urn:g1>"),
        ("<urn:c>", '"42"^^<http://www.w3.org/2001/XMLSchema#integer>', None),
        ("_:b1", "<urn:a>", None),
    }
    # the parse is pure JVM: no python runner in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan

    store = spark.createDataFrame([], "subj string, pred string, obj string, ctx string")
    out = sparql_update(store, f"LOAD <file://{p}> INTO GRAPH <urn:gload>")
    assert out.count() == 4
    assert {r["ctx"] for r in out.collect()} == {"<urn:gload>"}
    # SILENT swallows a missing file; non-silent raises
    assert sparql_update(store, "LOAD SILENT <file:///nope/missing.nt>").count() == 0
    import pytest as _pytest
    with _pytest.raises(Exception):
        sparql_update(store, "LOAD <file:///nope/missing.nt>").count()


def test_search_literals_preserves_query_id_type(spark):
    """Integer query ids must come back as integers (schema round-trip),
    so joins against the pattern DataFrame still match — the compiled
    batch form used to coerce every id to string (ADVICE regression)."""
    g = _g(spark)
    qs = spark.createDataFrame([(1, "fox"), (2, "nothing")], "query_id long, query string")
    out = search_literals(g, qs)
    assert out.schema["query_id"].dataType.simpleString() == "bigint"
    got = {(r["query_id"], r["subj"]) for r in out.collect()}
    assert got == {(1, "<urn:d1>"), (1, "<urn:d2>"), (2, "<urn:d3>")}
    # joining back on the typed id works
    assert out.join(qs, "query_id").count() == 3
    # empty pattern set keeps the declared id type too
    empty = search_literals(g, qs.limit(0))
    assert empty.schema["query_id"].dataType.simpleString() == "bigint"
