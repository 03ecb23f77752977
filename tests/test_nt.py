from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from halyard_spark import nt


def test_roundtrip_python():
    for s in ['plain', 'with "quotes"', "tabs\tand\nnewlines\\slash", "x" * 100_000]:
        t = nt.lit(s)
        parsed = nt.parse_term(t)
        assert parsed["kind"] == "literal"
        assert parsed["value"] == s
    assert nt.parse_term(nt.iri("urn:x"))["value"] == "urn:x"
    assert nt.parse_term(nt.bnode("b0"))["kind"] == "bnode"
    assert nt.parse_term(nt.lit("hi", lang="en"))["lang"] == "en"
    assert nt.parse_term(nt.lit("3", dtype=nt.XSD + "integer"))["datatype"].endswith("integer")


def test_spark_matches_python(spark):
    values = ['plain', 'q"uo"te', "nl\nnl", "tab\ttab", "back\\slash"]
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    rows = df.select(
        nt.nt_lit("v").alias("lit"),
        nt.nt_iri("v").alias("iri"),
    ).collect()
    for v, row in zip(values, rows):
        assert row["lit"] == nt.lit(v), v
        assert row["iri"] == nt.iri(v)
    # pandas variant agrees too
    pdv = nt.pd_lit(pd.Series(values))
    assert list(pdv) == [nt.lit(v) for v in values]


def test_spark_accessors(spark):
    df = spark.createDataFrame(
        [(nt.iri("urn:ns#Local"),), (nt.lit("hello", lang="en"),), (nt.lit("3", dtype=nt.XSD + "integer"),), (nt.lit('a"b'),)],
        ["t"],
    )
    got = df.select(
        nt.nt_is_iri("t").alias("is_iri"),
        nt.nt_is_literal("t").alias("is_lit"),
        nt.nt_str("t").alias("s"),
        nt.nt_lang("t").alias("lang"),
        nt.nt_datatype("t").alias("dt"),
    ).collect()
    assert got[0]["is_iri"] and not got[0]["is_lit"] and got[0]["s"] == "urn:ns#Local"
    assert got[1]["lang"] == "en" and got[1]["dt"] == nt.RDF + "langString"
    assert got[2]["dt"] == nt.XSD + "integer" and got[2]["s"] == "3"
    # STR() returns the UNESCAPED label (HalyardValueExprEvaluation.java:272-286)
    assert got[3]["dt"] == nt.XSD + "string" and got[3]["s"] == 'a"b'

    loc = spark.createDataFrame([(nt.iri("urn:ns#Local"),)], ["t"]).select(nt.nt_localname("t").alias("l")).collect()
    assert loc[0]["l"] == "Local"


def test_spark_accessors_adversarial_literals(spark):
    """Labels that textually contain @xx / ^^<...> / escapes must not be
    misparsed (the extraction anchors on the escape-aware closing quote),
    and nt_str must invert nt_escape exactly."""
    tricky = [
        'ends with @en',            # fake language tag inside label
        'fake dt ^^<urn:x>',        # fake datatype suffix inside label
        'quote " then @fr',         # escaped quote, then fake tag
        'back\\slash\\n not nl',    # escaped backslash followed by n
        'tab\tnl\ncr\r mix "q" \\', # every escape class at once
    ]
    df = spark.createDataFrame([(nt.lit(v),) for v in tricky], ["t"])
    got = df.select(
        nt.nt_str("t").alias("s"),
        nt.nt_lang("t").alias("lang"),
        nt.nt_datatype("t").alias("dt"),
    ).collect()
    for v, row in zip(tricky, got):
        assert row["s"] == v, repr(v)
        assert row["lang"] == "", repr(v)
        assert row["dt"] == nt.XSD + "string", repr(v)
    # real tag / datatype still recognized on an adversarial label
    real = spark.createDataFrame(
        [(nt.lit('fake ^^<urn:x> inside', lang="en"),),
         (nt.lit('ends with @de', dtype=nt.XSD + "integer"),)],
        ["t"],
    ).select(nt.nt_lang("t").alias("lang"), nt.nt_datatype("t").alias("dt")).collect()
    assert real[0]["lang"] == "en" and real[0]["dt"] == nt.RDF + "langString"
    assert real[1]["lang"] == "" and real[1]["dt"] == nt.XSD + "integer"


def test_nt_reader_decodes_uchar_escapes(spark, tmp_path):
    """Numeric escapes in N-Triples normalize to code points at read
    time (NTriplesUtil parity), canonical escaping preserved, and the
    scan stays pure-JVM (no Python in the plan)."""
    from halyard_spark.sources.rio import read_rdf

    p = tmp_path / "u.nt"
    p.write_text(
        '<urn:s\\u0041> <urn:p> "caf\\u00e9" .\n'
        '<urn:a> <urn:p> "q\\u0022inner" .\n'      # -> canonical \\"
        '<urn:a> <urn:p> "nl\\u000Ax" .\n'          # -> canonical \\n
        '<urn:a> <urn:p> "bs\\u005Cx" .\n'          # -> canonical \\\\
        '<urn:a> <urn:p> "keep\\\\u0041" .\n'       # escaped \\ + text: kept
        '<urn:a> <urn:p> "emoji\\U0001F600" .\n'    # surrogate-pair plane
    )
    df = read_rdf(spark, str(p))
    objs = {r.obj for r in df.collect()}
    assert objs == {
        '"café"', '"q\\"inner"', '"nl\\nx"', '"bs\\\\x"',
        '"keep\\\\u0041"', '"emoji😀"',
    }
    assert {r.subj for r in df.collect()} == {"<urn:sA>", "<urn:a>"}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
