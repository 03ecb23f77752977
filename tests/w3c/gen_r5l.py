"""Round-5l batch: SELECT-clause and solution-modifier static errors the
grammar + §18.2.4.2 require — duplicate projection variables (plain and
AS-assigned, incl. inside subqueries), AS over an already-selected var,
negative and repeated LIMIT/OFFSET.  All syntax-negative (the official
syn-bad duplicate-AS shapes).

Run from tests/w3c/:  python gen_r5l.py
"""

import json

CASES = []


def bad(name, query):
    with open(f"queries/{name}.rq", "w") as f:
        f.write(query + "\n")
    CASES.append({"name": name, "data": "data/people.nt",
                  "query": f"queries/{name}.rq", "type": "syntax-negative"})


bad("synbad-select-dup-alias",
    "SELECT (1 AS ?x) (2 AS ?x) WHERE { ?s ?p ?o }")
bad("synbad-select-alias-over-var",
    "SELECT ?x (2 AS ?x) WHERE { ?s ?p ?x }")
bad("synbad-select-dup-var",
    "SELECT ?x ?x WHERE { ?s ?p ?x }")
bad("synbad-limit-negative",
    "SELECT ?s WHERE { ?s ?p ?o } LIMIT -1")
bad("synbad-limit-twice",
    "SELECT ?s WHERE { ?s ?p ?o } LIMIT 1 LIMIT 2")
bad("synbad-offset-twice",
    "SELECT ?s WHERE { ?s ?p ?o } OFFSET 1 OFFSET 2")
bad("synbad-subquery-dup-var",
    "SELECT ?s WHERE { { SELECT ?x ?x WHERE { ?s ?p ?x } } }")


if __name__ == "__main__":
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
