"""One-shot generator for the round-5e batch: conformance cases rewritten
from official W3C SPARQL 1.1 approved-suite semantics in areas the
manifest did not yet pin — aggregate empty-group special cases
(§18.5.1.5: Sum/Avg of {} are 0, Min/Max error, GroupConcat ""), IN /
NOT IN error propagation through || / && three-valued logic (§17.4.1.9),
STR over a blank node (type error, §17.4.2.5), the xsd:boolean
CONSTRUCTOR cast vs the EBV (§17.5: lexical mapping only), EBV of
ill-formed xsd:boolean and of simple "false" (§17.2.2), dateTime
comparison across timezone offsets, NOW() stability within one query,
langMatches "*" vs untagged, REPLACE backreferences, aggregation with an
unbound GROUP BY key, and MINUS inner-filter scope.

Run from tests/w3c/:  python gen_r5e.py
"""

import json

XSD = "http://www.w3.org/2001/XMLSchema#"

CASES = []


def q(name, data, query, rows=None, vars=None, boolean=None, ordered=False,
      type=None):
    with open(f"queries/{name}.rq", "w") as f:
        f.write(query + "\n")
    entry = {"name": name, "data": data, "query": f"queries/{name}.rq"}
    if type:
        entry["type"] = type
    else:
        exp = {"boolean": boolean} if boolean is not None else (
            {"vars": vars, "rows": rows, **({"ordered": True} if ordered else {})})
        with open(f"expected/{name}.json", "w") as f:
            json.dump(exp, f, indent=1)
        entry["result"] = f"expected/{name}.json"
    CASES.append(entry)


# ---- aggregate empty-group special cases (§18.5.1.5) ----
q("agg-max-empty-unbound", "data/people.nt",
  'SELECT (MAX(?x) AS ?m) WHERE { <urn:alice> <urn:nope> ?x }',
  rows=[[None]], vars=["m"])
q("agg-avg-empty-zero", "data/people.nt",
  'SELECT (AVG(?x) AS ?m) WHERE { <urn:alice> <urn:nope> ?x }',
  rows=[[0.0]], vars=["m"])
q("agg-groupconcat-empty-string", "data/people.nt",
  'SELECT (GROUP_CONCAT(?x) AS ?m) WHERE { <urn:alice> <urn:nope> ?x }',
  rows=[[""]], vars=["m"])

# ---- IN / NOT IN error propagation (§17.4.1.9 over ||/&& 3VL) ----
q("in-error-shortcircuit-true", "data/people.nt",
  'ASK { FILTER(2 IN (1/0, 2)) }', boolean=True)
q("in-error-propagates", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:name> "Alice" FILTER(2 IN (1/0, 3)) }',
  rows=[], vars=["s"])
q("notin-error-propagates", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:name> "Alice" FILTER(2 NOT IN (1/0, 3)) }',
  rows=[], vars=["s"])

# ---- value comparison of non-canonical numeric lexicals ----
q("eq-integer-leading-zeros", "data/people.nt",
  'ASK { FILTER("01"^^<http://www.w3.org/2001/XMLSchema#integer>'
  ' = "1"^^<http://www.w3.org/2001/XMLSchema#integer>) }', boolean=True)

# ---- STR over a blank node is a type error (§17.4.2.5) ----
q("str-of-bnode-error", "data/people.nt",
  'SELECT (STR(BNODE("x")) AS ?y) WHERE { <urn:alice> <urn:type> ?t }',
  rows=[[None]], vars=["y"])

# ---- EBV: xsd:boolean-typed vs simple literals (§17.2.2) ----
q("ebv-boolean-illformed-false", "data/people.nt",
  'ASK { FILTER("TRUE"^^<http://www.w3.org/2001/XMLSchema#boolean>) }',
  boolean=False)
q("ebv-boolean-one-true", "data/people.nt",
  'ASK { FILTER("1"^^<http://www.w3.org/2001/XMLSchema#boolean>) }',
  boolean=True)
q("ebv-simple-false-is-true", "data/people.nt",
  'ASK { FILTER("false") }', boolean=True)

# ---- xsd:boolean constructor cast: lexical mapping, not EBV (§17.5) ----
q("cast-boolean-lexical", "data/people.nt",
  'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n'
  'SELECT (xsd:boolean("1") AS ?a) (xsd:boolean("TRUE") AS ?b)'
  ' (xsd:boolean("false") AS ?c) (xsd:boolean(0) AS ?d)\n'
  'WHERE { <urn:alice> <urn:type> ?t }',
  rows=[[True, None, False, False]], vars=["a", "b", "c", "d"])
q("cast-integer-leading-zeros", "data/people.nt",
  'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n'
  'ASK { FILTER(xsd:integer("007") = 7) }', boolean=True)

# ---- dateTime comparison across timezone offsets ----
q("dt-tz-mixed-compare", "data/tzmisc.nt",
  'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n'
  'SELECT ?s WHERE { ?s <urn:when> ?w\n'
  '  FILTER(?w > "2010-12-01T00:00:00Z"^^xsd:dateTime) }',
  rows=[["<urn:t1>"], ["<urn:t3>"], ["<urn:t6>"]], vars=["s"])

# ---- NOW() is constant within one query execution (§17.4.5.1) ----
q("now-constant-in-query", "data/people.nt",
  'ASK { FILTER(NOW() = NOW()) }', boolean=True)

# ---- langMatches "*" does not match the empty tag ----
q("langmatches-star-untagged", "data/people.nt",
  'SELECT ?n WHERE { ?s <urn:name> ?n FILTER(langMatches(LANG(?n), "*")) }',
  rows=[['"Bob"@en']], vars=["n"])

# ---- REPLACE with capture-group backreferences (fn:replace) ----
q("replace-backrefs", "data/people.nt",
  'SELECT (REPLACE("abcd", "(b)(c)", "$2$1") AS ?y)'
  ' WHERE { <urn:alice> <urn:type> ?t }',
  rows=[["acbd"]], vars=["y"])

# ---- REGEX over a non-string literal is a type error ----
q("regex-typed-arg-error", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:age> ?a FILTER(REGEX(?a, "3")) }',
  rows=[], vars=["s"])

# ---- GROUP BY over a key left unbound by OPTIONAL ----
q("group-by-unbound-key", "data/people.nt",
  'SELECT ?k (COUNT(*) AS ?c) WHERE {\n'
  '  ?s <urn:type> <urn:Person> OPTIONAL { ?s <urn:knows> ?k }\n'
  '} GROUP BY ?k',
  rows=[["<urn:bob>", 1], [None, 2]], vars=["k", "c"])

# ---- MINUS: outer vars are NOT in scope inside the inner filter ----
q("minus-inner-filter-scope", "data/people.nt",
  'SELECT ?n WHERE { ?s <urn:name> ?n\n'
  '  MINUS { ?s <urn:age> ?a FILTER(STR(?n) = "Alice") } }',
  rows=[['"Alice"'], ['"Bob"@en'], ['"Carol"']], vars=["n"])

# ---- HAVING without GROUP BY (global group) ----
q("having-no-groupby", "data/people.nt",
  'SELECT (SUM(?a) AS ?t) WHERE { ?s <urn:age> ?a } HAVING (SUM(?a) > 50)',
  rows=[[55.0]], vars=["t"])
q("having-no-groupby-empty", "data/people.nt",
  'SELECT (SUM(?a) AS ?t) WHERE { ?s <urn:age> ?a } HAVING (SUM(?a) > 99)',
  rows=[], vars=["t"])

# ---- STRLEN accepts an xsd:string-typed literal (§17.4.3) ----
q("strlen-xsd-string-typed", "data/people.nt",
  'ASK { FILTER(STRLEN("abc"^^<http://www.w3.org/2001/XMLSchema#string>)'
  ' = 3) }', boolean=True)

# ---- ENCODE_FOR_URI percent-encodes UTF-8 bytes, uppercase hex ----
q("encode-uri-unicode", "data/people.nt",
  'SELECT (ENCODE_FOR_URI("é A") AS ?y) WHERE { <urn:alice> <urn:type> ?t }',
  rows=[["%C3%A9%20A"]], vars=["y"])

# ---- CONSTRUCT WHERE shortform admits only triple patterns (§16.2.4) ----
q("synbad-construct-where-path", "data/people.nt",
  'CONSTRUCT WHERE { ?s <urn:p>+ ?o }', type="syntax-negative")

# ---- PN_LOCAL percent and backslash escapes (grammar §19.8) ----
q("syn-pnlocal-percent", "data/people.nt",
  'PREFIX ex: <urn:x#>\nSELECT * WHERE { ex:a%20b ex:p ?o }',
  type="syntax-positive")
q("syn-pnlocal-escape", "data/people.nt",
  "PREFIX ex: <urn:x#>\nSELECT * WHERE { ex:a\\,b ex:p ?o }",
  type="syntax-positive")


if __name__ == "__main__":
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
