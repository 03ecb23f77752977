"""Round-5j batch: EXISTS as a VALUE EXPRESSION (§17.4.1.4 — evaluated
per solution in ANY expression position, not only as a top-level FILTER
conjunct): BIND(EXISTS{} AS ?v), EXISTS under || and ! inside FILTER,
EXISTS inside IF() in a SELECT expression, ORDER BY EXISTS, and the
no-shared-variables form (row-independent flag).

Engine mechanics under test: _materialize_exists rewrites each EXISTS
node into a boolean marker column (distinct-key semi-join + null-safe
re-attach), so these cases also pin the no-row-multiplication property.

Run from tests/w3c/:  python gen_r5j.py
"""

import json

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


# people.nt: alice knows bob; alice age 30, bob age 25, carol no age
q("bind-exists-expr", "data/people.nt",
  'SELECT ?s ?e WHERE { ?s <urn:age> ?a\n'
  '  BIND(EXISTS { ?s <urn:knows> ?k } AS ?e) }',
  rows=[["<urn:alice>", True], ["<urn:bob>", False]],
  vars=["s", "e"])

q("bind-not-exists-expr", "data/people.nt",
  'SELECT ?s ?e WHERE { ?s <urn:age> ?a\n'
  '  BIND(NOT EXISTS { ?s <urn:knows> ?k } AS ?e) }',
  rows=[["<urn:alice>", False], ["<urn:bob>", True]],
  vars=["s", "e"])

q("filter-exists-in-or", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:age> ?a\n'
  '  FILTER(?a > 29 || EXISTS { ?s <urn:knows> ?k }) }',
  rows=[["<urn:alice>"]], vars=["s"])

q("filter-bang-exists-in-or", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:age> ?a\n'
  '  FILTER(?a < 29 || !(EXISTS { ?s <urn:knows> ?k })) }',
  rows=[["<urn:bob>"]], vars=["s"])

q("select-if-exists", "data/people.nt",
  'SELECT ?s (IF(EXISTS { ?s <urn:knows> ?k }, "social", "loner") AS ?t)\n'
  'WHERE { ?s <urn:age> ?a }',
  rows=[["<urn:alice>", "social"], ["<urn:bob>", "loner"]],
  vars=["s", "t"])

q("order-by-exists-key", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:age> ?a }\n'
  'ORDER BY DESC(EXISTS { ?s <urn:knows> ?k }) ?s',
  rows=[["<urn:alice>"], ["<urn:bob>"]], vars=["s"], ordered=True)

# no shared variables: the sub-pattern's truth is row-independent
q("exists-no-shared-vars", "data/people.nt",
  'SELECT ?s (EXISTS { <urn:alice> <urn:knows> <urn:bob> } AS ?e)\n'
  'WHERE { ?s <urn:age> ?a }',
  rows=[["<urn:alice>", True], ["<urn:bob>", True]],
  vars=["s", "e"])

# two EXISTS under one || — both materialized, either may satisfy
q("filter-two-exists-or", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:age> ?a\n'
  '  FILTER(EXISTS { ?s <urn:knows> ?k } || EXISTS { ?w <urn:knows> ?s }) }',
  rows=[["<urn:alice>"], ["<urn:bob>"]], vars=["s"])


if __name__ == "__main__":
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
