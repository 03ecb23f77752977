"""Round-5i batch: xsd:date constructor cast, AVG error-member
propagation (shares Sum's §18.5 rule), STRENDS §17.4.3.1 argument
compatibility (mismatched language tags are a type error), and the
term-KIND rank in ORDER BY (blank nodes < IRIs < literals, §15.1).

Run from tests/w3c/:  python gen_r5i.py
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


with open("data/kinds.nt", "w") as f:
    f.write('<urn:k> <urn:p> "zlit" .\n'
            '<urn:k> <urn:p> <urn:iri1> .\n'
            '<urn:k> <urn:p> _:b1 .\n')

with open("data/dates.nt", "w") as f:
    f.write('<urn:d1> <urn:on> "2010-01-15"^^<http://www.w3.org/2001/XMLSchema#date> .\n'
            '<urn:d2> <urn:on> "2011-03-02"^^<http://www.w3.org/2001/XMLSchema#date> .\n')

# ---- xsd:date constructor cast + comparison over date values ----
q("cast-date-then-compare", "data/dates.nt",
  'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n'
  'SELECT ?s WHERE { ?s <urn:on> ?d\n'
  '  FILTER(?d < xsd:date("2010-06-01")) }',
  rows=[["<urn:d1>"]], vars=["s"])

# ---- AVG over a group containing a non-numeric member errors ----
q("agg-avg-error-member-unbound", "data/misc.nt",
  'SELECT (AVG(?o) AS ?a) WHERE { <urn:x2> ?p ?o }',
  rows=[[None]], vars=["a"])

# ---- STRENDS argument compatibility (§17.4.3.1): same-tag ok,
#      cross-tag is a type error ----
q("strends-lang-compat", "data/people.nt",
  'ASK { <urn:bob> <urn:name> ?n FILTER(STRENDS(?n, "ob"@en)) }',
  boolean=True)
q("strends-lang-incompat-error", "data/people.nt",
  'ASK { <urn:bob> <urn:name> ?n FILTER(STRENDS(?n, "ob"@fr)) }',
  boolean=False)

# ---- ORDER BY dateTime + LIMIT: the instant key must survive the
#      TakeOrderedAndProject fusion (try_cast in a sort expression) ----
q("order-by-datetime-limit-topk", "data/tzorder.nt",
  'SELECT ?s WHERE { ?s <urn:when> ?w } ORDER BY DESC(?w) LIMIT 2',
  rows=[["<urn:e2>"], ["<urn:e3>"]], vars=["s"], ordered=True)

# ---- ORDER BY total order: bnodes < IRIs < literals (§15.1) ----
q("order-by-term-kind-rank", "data/kinds.nt",
  'SELECT ?o WHERE { <urn:k> <urn:p> ?o } ORDER BY ?o',
  rows=[["_:b1"], ["<urn:iri1>"], ['"zlit"']], vars=["o"], ordered=True)


if __name__ == "__main__":
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
