"""Round-5g batch: LeftJoin-condition (OPTIONAL+FILTER) edge cases —
the §18.2.2.5 translation evaluated over the MERGED solution, bag
multiplicity through the Diff branch, UNDEF outer vars in the
condition, EXISTS as the condition, and nested-group scope limits.

Run from tests/w3c/:  python gen_r5g.py
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


# ---- lifted filter mixing inner and outer vars ----
q("optional-filter-mixed-scope", "data/people.nt",
  'SELECT ?s ?a WHERE {\n'
  '  ?s <urn:name> ?n\n'
  '  OPTIONAL { ?s <urn:age> ?a FILTER(?a = 25 && ?n = "Bob"@en) }\n'
  '}',
  rows=[["<urn:alice>", None],
        ["<urn:bob>", '"25"^^<http://www.w3.org/2001/XMLSchema#integer>'],
        ["<urn:carol>", None]],
  vars=["s", "a"])

# ---- a var bound on NEITHER side: type error -> everyone unextended ----
q("optional-filter-ghost-var", "data/people.nt",
  'SELECT ?s (BOUND(?a) AS ?b) WHERE {\n'
  '  ?s <urn:type> <urn:Person>\n'
  '  OPTIONAL { ?s <urn:age> ?a FILTER(?ghost = 1) }\n'
  '}',
  rows=[["<urn:alice>", False], ["<urn:bob>", False], ["<urn:carol>", False]],
  vars=["s", "b"])

# ---- UNDEF outer var in the condition: comparing UNBOUND errors ----
q("optional-filter-undef-outer", "data/people.nt",
  'SELECT ?s ?a WHERE {\n'
  '  VALUES (?s ?want) { (<urn:alice> "Alice") (<urn:bob> UNDEF) }\n'
  '  ?s <urn:name> ?n\n'
  '  OPTIONAL { ?s <urn:age> ?a FILTER(?want = ?n) }\n'
  '}',
  rows=[["<urn:alice>", '"30"^^<http://www.w3.org/2001/XMLSchema#integer>'],
        ["<urn:bob>", None]],
  vars=["s", "a"])

# ---- nested group inside OPTIONAL keeps its own filter scope ----
q("optional-nested-group-filter-scope", "data/people.nt",
  'SELECT ?s (BOUND(?a) AS ?b) WHERE {\n'
  '  ?s <urn:name> ?n\n'
  '  OPTIONAL { { ?s <urn:age> ?a FILTER(?n = "Alice") } }\n'
  '}',
  rows=[["<urn:alice>", False], ["<urn:bob>", False], ["<urn:carol>", False]],
  vars=["s", "b"])

# ---- EXISTS as (part of) the LeftJoin condition ----
q("optional-filter-exists-condition", "data/people.nt",
  'SELECT ?s ?a WHERE {\n'
  '  ?s <urn:name> ?n\n'
  '  OPTIONAL { ?s <urn:age> ?a\n'
  '             FILTER(?n != "nobody" && EXISTS { ?s <urn:knows> ?k }) }\n'
  '}',
  rows=[["<urn:alice>", '"30"^^<http://www.w3.org/2001/XMLSchema#integer>'],
        ["<urn:bob>", None], ["<urn:carol>", None]],
  vars=["s", "a"])


if __name__ == "__main__":
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
