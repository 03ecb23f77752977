"""One-shot generator for the round-5b evaluation-case batch: the
group-pattern and expression edge semantics fixed alongside it
(rewritten from the corresponding areas of the official W3C SPARQL 1.1
approved suite — CONSTRUCT §16.2, empty group patterns §18.5,
OPTIONAL/MINUS as the leading group element, GRAPH ?g with an empty
body, BIND in-scope static errors §10.1/§19.8-n12, grouped-projection
static errors §18.2.4.1, IN with an empty list §17.4.1.9, and XPath
regex flags incl. `q` and invalid-flag evaluation errors).

Run from tests/w3c/:  python gen_r5b.py
"""

import json
import os

CASES = []


def q(name, data, query, rows=None, vars=None, boolean=None, ordered=False,
      type=None):
    case = {"name": name, "data": data, "query": query}
    if type:
        case["type"] = type
        if type == "negative-eval":
            CASES.append(case)
            return
    exp = {"boolean": boolean} if boolean is not None else (
        {"vars": vars, "rows": rows, **({"ordered": True} if ordered else {})})
    case["expected"] = exp
    CASES.append(case)


# ---- CONSTRUCT semantics (§16.2) ----
q("construct-unbound-drop", "data/people.nt",
  'CONSTRUCT { ?s <urn:nick> ?k } '
  'WHERE { ?s <urn:type> <urn:Person> OPTIONAL { ?s <urn:knows> ?k } }',
  rows=[["<urn:alice>", "<urn:nick>", "<urn:bob>"]],
  vars=["subj", "pred", "obj"])
q("construct-illformed-drop", "data/people.nt",
  # first template row has a literal subject -> omitted; second is fine
  'CONSTRUCT { ?n <urn:of> ?s . ?s <urn:named> ?n } '
  'WHERE { ?s <urn:name> ?n . FILTER(?s = <urn:carol>) }',
  rows=[["<urn:carol>", "<urn:named>", '"Carol"']],
  vars=["subj", "pred", "obj"])

# ---- empty group pattern (§18.5: BGP() = { mu0 }) ----
q("empty-group-ask", "data/people.nt", "ASK {}", boolean=True)
q("empty-group-select-expr", "data/people.nt",
  "SELECT (42 AS ?x) WHERE {}", rows=[[42]], vars=["x"])

# ---- OPTIONAL / MINUS as the first group element ----
q("optional-first", "data/people.nt",
  "SELECT ?x WHERE { OPTIONAL { <urn:alice> <urn:knows> ?x } }",
  rows=[["<urn:bob>"]], vars=["x"])
q("optional-first-nomatch", "data/people.nt",
  "SELECT ?x WHERE { OPTIONAL { <urn:alice> <urn:missing> ?x } }",
  rows=[[None]], vars=["x"])
q("minus-first-keeps-unit", "data/people.nt",
  "ASK { MINUS { ?s <urn:type> ?o } }", boolean=True)

# ---- GRAPH ?g {} enumerates the named graphs ----
q("graph-var-empty-body", "data/quads.nq",
  "SELECT ?g WHERE { GRAPH ?g {} }",
  rows=[["<urn:g1>"], ["<urn:g2>"]], vars=["g"])

# ---- BIND static error: target already in scope (§10.1) ----
q("synbad-bind-rebind-eval", "data/people.nt",
  "SELECT ?s WHERE { ?s <urn:name> ?n BIND(1 AS ?s) }",
  type="negative-eval")

# ---- grouped-query projection static errors (§18.2.4.1) ----
q("synbad-group-proj-var-eval", "data/people.nt",
  "SELECT ?s (COUNT(*) AS ?c) WHERE { ?s <urn:name> ?n } GROUP BY ?n",
  type="negative-eval")
q("synbad-group-proj-expr-eval", "data/people.nt",
  "SELECT (STR(?s) AS ?y) (COUNT(*) AS ?c) "
  "WHERE { ?s <urn:name> ?n } GROUP BY ?n",
  type="negative-eval")

# ---- IN with an empty list (§17.4.1.9) ----
q("fn-in-empty-list", "data/people.nt",
  "SELECT ?s WHERE { ?s <urn:age> ?a FILTER(?a IN ()) }",
  rows=[], vars=["s"])
q("fn-not-in-empty-list", "data/people.nt",
  "SELECT ?s WHERE { ?s <urn:age> ?a FILTER(?a NOT IN ()) }",
  rows=[["<urn:alice>"], ["<urn:bob>"]], vars=["s"])

# ---- XPath regex flags ----
q("regex-flag-q-literal", "data/people.nt",
  'ASK { BIND("a.c" AS ?x) FILTER(REGEX(?x, "a.c", "q")) }', boolean=True)
q("regex-flag-q-no-meta", "data/people.nt",
  # under q the dot is literal, so "abc" must NOT match
  'ASK { BIND("abc" AS ?x) FILTER(REGEX(?x, "a.c", "q")) }', boolean=False)
q("regex-bad-flag-is-error", "data/people.nt",
  # an invalid flag letter is an evaluation error -> filter removes row
  'SELECT ?s WHERE { ?s <urn:name> ?n FILTER(REGEX(?n, "a", "z")) }',
  rows=[], vars=["s"])
q("replace-bad-flag-unbound", "data/people.nt",
  'SELECT (REPLACE("aaa", "a", "b", "z") AS ?r) '
  'WHERE { <urn:alice> <urn:type> ?t }',
  rows=[[None]], vars=["r"])

# ---- unbound variable in an expression evaluates as UNBOUND ----
q("bound-never-bound-var", "data/people.nt",
  "SELECT (BOUND(?zzz) AS ?b) WHERE { <urn:alice> <urn:name> ?n }",
  rows=[[False]], vars=["b"])


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    manifest = json.load(open(os.path.join(here, "manifest.json")))
    have = {c["name"] for c in manifest}
    for c in CASES:
        assert c["name"] not in have, f"duplicate case {c['name']}"
        qpath = f"queries/{c['name']}.rq"
        with open(os.path.join(here, qpath), "w") as f:
            f.write(c.pop("query") + "\n")
        entry = {"name": c["name"], "data": c["data"], "query": qpath}
        if c.get("type"):
            entry["type"] = c["type"]
        if "expected" in c:
            rpath = f"expected/{c['name']}.json"
            with open(os.path.join(here, rpath), "w") as f:
                json.dump(c["expected"], f, indent=1)
            entry["result"] = rpath
        manifest.append(entry)
    with open(os.path.join(here, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"added {len(CASES)} cases; manifest now {len(manifest)}")


if __name__ == "__main__":
    main()
