"""Round-5m batch: SolutionModifier clause-order grammar (§19.8 —
GroupClause? HavingClause? OrderClause? LimitOffsetClauses?, LIMIT and
OFFSET in either order within rank), HAVING with multiple bracketted
conditions in ONE clause, and duplicate variables in a VALUES var list.

Run from tests/w3c/:  python gen_r5m.py
"""

import json

CASES = []


def case(name, query, type=None, rows=None, vars=None):
    with open(f"queries/{name}.rq", "w") as f:
        f.write(query + "\n")
    entry = {"name": name, "data": "data/people.nt", "query": f"queries/{name}.rq"}
    if type:
        entry["type"] = type
    else:
        with open(f"expected/{name}.json", "w") as f:
            json.dump({"vars": vars, "rows": rows}, f, indent=1)
        entry["result"] = f"expected/{name}.json"
    CASES.append(entry)


case("synbad-order-after-limit",
     "SELECT ?s WHERE { ?s ?p ?o } LIMIT 3 ORDER BY ?s",
     type="syntax-negative")
case("synbad-group-after-order",
     "SELECT ?s WHERE { ?s ?p ?o } ORDER BY ?s GROUP BY ?s",
     type="syntax-negative")
case("synbad-having-before-group",
     "SELECT (COUNT(*) AS ?c) WHERE { ?s ?p ?o } HAVING(COUNT(*) > 1) GROUP BY ?s",
     type="syntax-negative")
case("synbad-values-dup-var",
     "SELECT ?a WHERE { VALUES (?a ?a) { (1 2) } }",
     type="syntax-negative")
case("syn-offset-before-limit",
     "SELECT ?s WHERE { ?s ?p ?o } OFFSET 2 LIMIT 5",
     type="syntax-positive")
case("syn-having-multi-conditions",
     "SELECT ?p (COUNT(*) AS ?c) WHERE { ?s ?p ?o } GROUP BY ?p\n"
     "HAVING(COUNT(*) > 0) (COUNT(*) < 100)",
     type="syntax-positive")

# evaluation: both HAVING conditions of one clause apply (AND semantics)
case("having-multi-conditions-eval",
     'SELECT ?s (COUNT(*) AS ?c) WHERE { ?s ?p ?o } GROUP BY ?s\n'
     'HAVING(COUNT(*) > 2) (COUNT(*) < 4)',
     rows=[["<urn:alice>", 4], ["<urn:bob>", 3], ["<urn:carol>", 2]][1:2],
     vars=["s", "c"])


if __name__ == "__main__":
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
