"""One-shot generator for the round-5f batch: more official-suite-derived
evaluation areas — dateTime component accessors over the LEXICAL form
(§17.4.5: no timezone normalization; SECONDS keeps fractions), FILTER
inside OPTIONAL seeing the outer group's bindings (the classic
dawg-optional-filter shape), COALESCE(), RDFterm-equal type errors on
incompatible literals, IN over IRIs, and MINUS with an empty right side.

Run from tests/w3c/:  python gen_r5f.py
"""

import json

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


# ---- dateTime accessors read the lexical form (§17.4.5) ----
q("datetime-lexical-offset", "data/tzmisc.nt",
  'SELECT (HOURS(?w) AS ?h) (SECONDS(?w) AS ?sec)'
  ' WHERE { <urn:t1> <urn:when> ?w }',
  rows=[[14, 13.815]], vars=["h", "sec"])
q("datetime-components-neg-offset", "data/tzmisc.nt",
  'SELECT (YEAR(?w) AS ?y) (MONTH(?w) AS ?m) (DAY(?w) AS ?d)'
  ' (MINUTES(?w) AS ?mi) WHERE { <urn:t4> <urn:when> ?w }',
  rows=[[2006, 8, 23, 0]], vars=["y", "m", "d", "mi"])

# ---- FILTER inside OPTIONAL sees the outer group's bindings ----
q("optional-filter-outer-var", "data/people.nt",
  'SELECT ?s (BOUND(?a) AS ?b) WHERE {\n'
  '  ?s <urn:name> ?n OPTIONAL { ?s <urn:age> ?a FILTER(?n = "Alice") }\n'
  '}',
  rows=[["<urn:alice>", True], ["<urn:bob>", False], ["<urn:carol>", False]],
  vars=["s", "b"])

# ---- COALESCE with no expressions is an evaluation error ----
q("coalesce-no-args-unbound", "data/people.nt",
  'SELECT (COALESCE() AS ?x) WHERE { <urn:alice> <urn:type> ?t }',
  rows=[[None]], vars=["x"])

# ---- RDFterm-equal: distinct incomparable literals -> type error ----
q("eq-incompatible-literals-error", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:name> "Alice" FILTER("a" = 1) }',
  rows=[], vars=["s"])
q("neq-incompatible-literals-error", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:name> "Alice" FILTER("a" != 1) }',
  rows=[], vars=["s"])
q("lt-incompatible-types-error", "data/people.nt",
  'ASK { FILTER("a" < 1) }', boolean=False)

# ---- IN over IRI terms ----
q("in-iri-terms", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:type> <urn:Person>\n'
  '  FILTER(?s IN (<urn:alice>, <urn:carol>)) }',
  rows=[["<urn:alice>"], ["<urn:carol>"]], vars=["s"])

# ---- MINUS with an empty right side removes nothing ----
q("minus-empty-rhs", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:type> <urn:Person> MINUS { ?s <urn:nope> ?x } }',
  rows=[["<urn:alice>"], ["<urn:bob>"], ["<urn:carol>"]], vars=["s"])


# ---- dateTime comparison is on the INSTANT, not the lexical form ----
# t1 = 2011-01-10T14:45:13.815-05:00 = 19:45:13.815Z: lexically BELOW
# the 15:00Z threshold, 4h45 above it as an instant
q("dt-instant-not-lexical", "data/tzmisc.nt",
  'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n'
  'SELECT ?s WHERE { ?s <urn:when> ?w\n'
  '  FILTER(?w > "2011-01-10T15:00:00Z"^^xsd:dateTime) }',
  rows=[["<urn:t1>"]], vars=["s"])
q("dt-equal-across-offsets", "data/tzmisc.nt",
  'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n'
  'SELECT ?s WHERE { ?s <urn:when> ?w\n'
  '  FILTER(?w = "2010-12-21T07:57:00Z"^^xsd:dateTime) }',
  rows=[["<urn:t3>"]], vars=["s"])

# ---- ORDER BY over dateTimes sorts by instant: e1=10:30Z < e3=12:00Z
#      < e2=19:45Z, while the lexical forms order e3 < e2 < e1 ----
q("order-by-datetime-instant", "data/tzorder.nt",
  'SELECT ?s WHERE { ?s <urn:when> ?w } ORDER BY ?w',
  rows=[["<urn:e1>"], ["<urn:e3>"], ["<urn:e2>"]], vars=["s"],
  ordered=True)

# ---- numeric term vs non-numeric literal: type error, even for != ----
q("neq-numeric-vs-string-term-error", "data/misc.nt",
  'SELECT ?s WHERE { ?s <urn:v> ?v . ?s <urn:tag> ?t FILTER(?v != ?t) }',
  rows=[], vars=["s"])


if __name__ == "__main__":
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
