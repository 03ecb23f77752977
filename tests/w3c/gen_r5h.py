"""Round-5h batch: remaining evaluation-area gaps found by a coverage
sweep — GROUP_CONCAT SEPARATOR evaluation, aggregate error propagation
(Sum over a non-numeric member errors the whole group), BIND scope
(later elements of the group see the bound var), property-path
precedence ('/' binds tighter than '|'), LCASE language preservation,
and the xsd:dateTime constructor cast.

Run from tests/w3c/:  python gen_r5h.py
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


# ---- GROUP_CONCAT SEPARATOR (evaluation; sequence order is undefined,
#      so assert the length: "blue;red" / "red;blue" are both 8) ----
q("groupconcat-separator-eval", "data/misc.nt",
  'SELECT (STRLEN(GROUP_CONCAT(?t; SEPARATOR=";")) AS ?n)\n'
  'WHERE { <urn:x2> <urn:tag> ?t }',
  rows=[[8]], vars=["n"])

# ---- Sum over a group containing a non-numeric member is an error ->
#      the aggregate binding is UNBOUND for that group (§18.5) ----
q("agg-sum-error-member-unbound", "data/misc.nt",
  'SELECT (SUM(?o) AS ?s) (COUNT(?o) AS ?c)\n'
  'WHERE { <urn:x2> ?p ?o }',
  rows=[[None, 3]], vars=["s", "c"])

# ---- BIND scope: later group elements see the bound variable ----
q("bind-then-filter-scope", "data/misc.nt",
  'SELECT ?s WHERE {\n'
  '  ?s <urn:v> ?v . BIND(?v * 2 AS ?d) FILTER(?d > 3)\n'
  '}',
  rows=[["<urn:x2>"], ["<urn:x3>"]], vars=["s"])

# ---- path precedence: '/' binds tighter than '|':
#      next/next|name = (next/next)|name ----
q("path-precedence-seq-over-alt", "data/chain.nt",
  'SELECT ?o WHERE { <urn:d> <urn:next>/<urn:next>|<urn:name> ?o }',
  rows=[['"D"']], vars=["o"])

# ---- LCASE keeps the language tag (§17.4.3.4 derives the result
#      literal from arg1's lang) ----
q("lcase-lang-preserved", "data/people.nt",
  'SELECT (LCASE(?n) AS ?l) WHERE { <urn:bob> <urn:name> ?n }',
  rows=[['"bob"@en']], vars=["l"])

# ---- xsd:dateTime constructor cast from a string, then compare ----
q("cast-datetime-then-compare", "data/tzmisc.nt",
  'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n'
  'SELECT ?s WHERE { ?s <urn:when> ?w\n'
  '  FILTER(?w < xsd:dateTime("2010-01-01T00:00:00Z")) }',
  rows=[["<urn:t4>"]], vars=["s"])


if __name__ == "__main__":
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
