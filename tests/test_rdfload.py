"""RDF-file bulk load end-to-end (pipeline/rdfload.py) — the
`halyard bulkload` tool composition: mixed-format RDF corpus -> sorted
store -> SPARQL (HalyardBulkLoad.java:502-573)."""

from __future__ import annotations

import gzip

from halyard_spark.pipeline import materialize, rdfload
from halyard_spark.query.sparql import sparql_query


def _write_corpus(tmp_path):
    (tmp_path / "a.ttl").write_text(
        """@prefix ex: <http://ex.org/> .
        ex:alice a ex:Person ; ex:name "Alice" ; ex:knows ex:bob ."""
    )
    (tmp_path / "b.nt").write_text(
        '<http://ex.org/bob> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Person> .\n'
        '<http://ex.org/bob> <http://ex.org/name> "Bob" .\n'
    )
    (tmp_path / "c.nq.gz").write_bytes(
        gzip.compress(
            b'<http://ex.org/carol> <http://ex.org/name> "Carol" <http://ex.org/g1> .\n'
        )
    )


def test_bulk_load_mixed_formats_and_query(spark, tmp_path):
    _write_corpus(tmp_path)
    out = str(tmp_path / "kg")
    manifest = rdfload.bulk_load_rdf(spark, str(tmp_path) + "/*", out)
    assert manifest["triple_count"] == 6
    store = rdfload.load_dataset(spark, out + "/store")
    # SPARQL over the loaded store
    names = sparql_query(
        store, "SELECT ?n WHERE { ?s a <http://ex.org/Person> . ?s <http://ex.org/name> ?n }"
    )
    assert sorted(r["n"] for r in names.collect()) == ['"Alice"', '"Bob"']
    # the named graph from the .nq survived
    g = sparql_query(store, "SELECT ?g WHERE { GRAPH ?g { ?s <http://ex.org/name> \"Carol\" } }")
    assert [r["g"] for r in g.collect()] == ["<http://ex.org/g1>"]
    # all three mirrors written and consistent
    for idx in ("spo", "pos", "osp"):
        assert materialize.read_index(spark, out + "/store", idx).count() == 6


def test_bulk_load_graph_options(spark, tmp_path):
    _write_corpus(tmp_path)
    out = str(tmp_path / "kg2")
    rdfload.bulk_load_rdf(
        spark, str(tmp_path) + "/*", out, default_graph="<http://ex.org/default>"
    )
    store = rdfload.load_dataset(spark, out + "/store")
    ctxs = {r["ctx"] for r in store.select("ctx").distinct().collect()}
    # context-less statements got the default graph; the .nq kept its own
    assert ctxs == {"<http://ex.org/default>", "<http://ex.org/g1>"}

    out3 = str(tmp_path / "kg3")
    rdfload.bulk_load_rdf(
        spark, str(tmp_path) + "/*", out3, override_graph="<http://ex.org/all>"
    )
    store3 = rdfload.load_dataset(spark, out3 + "/store")
    assert {r["ctx"] for r in store3.select("ctx").distinct().collect()} == {"<http://ex.org/all>"}


def test_bulk_load_incremental_and_truncate(spark, tmp_path):
    _write_corpus(tmp_path)
    out = str(tmp_path / "kg4")
    rdfload.bulk_load_rdf(spark, str(tmp_path / "a.ttl"), out)
    assert rdfload.load_dataset(spark, out + "/store").count() == 3
    # incremental load ADDS (set semantics: reloading a.ttl is a no-op)
    m2 = rdfload.bulk_load_rdf(spark, str(tmp_path / "b.nt"), out)
    assert m2["triple_count"] == 5
    m3 = rdfload.bulk_load_rdf(spark, str(tmp_path / "a.ttl"), out)
    assert m3["triple_count"] == 5  # no duplicate quads
    # truncate wipes first (the reference's truncate-before-load option)
    m4 = rdfload.bulk_load_rdf(spark, str(tmp_path / "b.nt"), out, truncate=True)
    assert m4["triple_count"] == 2


def test_jsonld_whole_document_reader(spark, tmp_path):
    """.jsonld = one (pretty-printed) document per file, incl. @graph
    containers — routed to the whole-document reader, not the
    line-delimited one (code-review regression: multi-line JSON-LD used
    to silently yield zero triples)."""
    from halyard_spark.sources.rio import read_rdf

    (tmp_path / "doc.jsonld").write_text(
        """{
  "@context": {"ex": "http://ex.org/"},
  "@graph": [
    {"@id": "ex:a", "ex:name": "Ann"},
    {"@id": "ex:b", "ex:name": {"@value": "Ben", "@language": "en"}}
  ]
}"""
    )
    df = read_rdf(spark, str(tmp_path / "doc.jsonld"))
    got = {(r["subj"], r["obj"]) for r in df.collect()}
    assert got == {
        ("<http://ex.org/a>", '"Ann"'),
        ("<http://ex.org/b>", '"Ben"@en'),
    }


def test_read_rdf_remote_scheme_not_driver_expanded(spark):
    """A schemed path (s3a://, hdfs://) must pass through to Spark for
    target-filesystem glob expansion — never be expanded with the
    driver-local glob (code-review regression: remote globs used to
    raise FileNotFoundError from an empty local expansion)."""
    from halyard_spark.sources.rio import read_rdf

    try:
        read_rdf(spark, "s3a://no-such-bucket/data/*.nt").count()
        raise AssertionError("expected a Spark filesystem error")
    except FileNotFoundError as exc:  # our expansion error = the regression
        raise AssertionError(f"driver-local expansion intercepted the path: {exc}")
    except Exception:
        pass  # Spark-side error (no s3a filesystem here) is the correct path
