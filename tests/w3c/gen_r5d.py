"""One-shot generator for the round-5d batch: conformance cases pinning
the round-5 self-review fixes — CONCAT's §17.4.3.1 string-literal
argument requirement and tag-combination rule, DATATYPE over derived
numeric expressions, and CONSTRUCT solution modifiers (§16.2: ORDER BY/
LIMIT/OFFSET select SOLUTIONS before template instantiation) — each
rewritten from the corresponding area of the official W3C SPARQL 1.1
approved suite semantics.

Run from tests/w3c/:  python gen_r5d.py
"""

import json

XSD = "http://www.w3.org/2001/XMLSchema#"

CASES = []


def q(name, data, query, rows=None, vars=None, boolean=None, ordered=False):
    with open(f"queries/{name}.rq", "w") as f:
        f.write(query + "\n")
    exp = {"boolean": boolean} if boolean is not None else (
        {"vars": vars, "rows": rows, **({"ordered": True} if ordered else {})})
    with open(f"expected/{name}.json", "w") as f:
        json.dump(exp, f, indent=1)
    CASES.append({"name": name, "data": data, "query": f"queries/{name}.rq",
                  "result": f"expected/{name}.json"})


# ---- CONCAT argument typing (§17.4.3.1: args must be string literals;
#      an IRI / bnode / non-string-typed literal is a type error) ----
q("concat-iri-arg-error", "data/people.nt",
  'SELECT (CONCAT(?o, "x") AS ?y) WHERE { <urn:alice> <urn:knows> ?o }',
  rows=[[None]], vars=["y"])
q("concat-typed-arg-error", "data/people.nt",
  'SELECT (CONCAT(?a, "y") AS ?y) WHERE { <urn:alice> <urn:age> ?a }',
  rows=[[None]], vars=["y"])
# tag combination (§17.4.3.1.2): result tagged only when EVERY argument
# carries the same tag; any simple argument makes the result simple
q("concat-lang-same-tag", "data/people.nt",
  'SELECT (CONCAT(?n, ?n) AS ?y) WHERE { <urn:bob> <urn:name> ?n }',
  rows=[['"BobBob"@en']], vars=["y"])
# (the mixed-tag -> simple case already exists: concat-lang-mixed-simple)

# ---- DATATYPE over derived numeric expressions (§17.4.2.7 applied to
#      the §17.2 operator result: numeric, integral -> xsd:integer) ----
q("datatype-numeric-add", "data/people.nt",
  'SELECT (DATATYPE(?a + 1) AS ?d) WHERE { <urn:alice> <urn:age> ?a }',
  rows=[[XSD + "integer"]], vars=["d"])
q("datatype-numeric-fractional", "data/people.nt",
  'SELECT (DATATYPE(?a + 0.25) AS ?d) WHERE { <urn:alice> <urn:age> ?a }',
  rows=[[XSD + "double"]], vars=["d"])

# ---- CONSTRUCT solution modifiers (§16.2: the solution sequence is
#      ordered/sliced FIRST, then the template instantiates per
#      solution — LIMIT n means n solutions, not n triples) ----
q("construct-limit-solutions", "data/people.nt",
  'CONSTRUCT { ?s <urn:a> ?n . ?s <urn:b> ?n }\n'
  'WHERE { ?s <urn:name> ?n } ORDER BY ?s LIMIT 2',
  rows=[["<urn:alice>", "<urn:a>", '"Alice"'],
        ["<urn:alice>", "<urn:b>", '"Alice"'],
        ["<urn:bob>", "<urn:a>", '"Bob"@en'],
        ["<urn:bob>", "<urn:b>", '"Bob"@en']],
  vars=["subj", "pred", "obj"])
q("construct-offset-solutions", "data/people.nt",
  'CONSTRUCT { ?s <urn:a> ?n }\n'
  'WHERE { ?s <urn:name> ?n } ORDER BY DESC(?s) OFFSET 1 LIMIT 1',
  rows=[["<urn:bob>", "<urn:a>", '"Bob"@en']],
  vars=["subj", "pred", "obj"])


if __name__ == "__main__":
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
