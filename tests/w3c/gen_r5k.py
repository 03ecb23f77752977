"""Round-5k batch: property-path closures interacting with the dataset
(§13.3/§18.4): a `+` closure under GRAPH <g> chains only that graph's
edges; under GRAPH ?g it chains per named graph; with no dataset clause
it runs over the union graph (the reference's unbound-context scan);
FROM <g> makes g the default graph; FROM NAMED alone leaves the default
graph EMPTY for patterns outside GRAPH.  Data: a -n-> b in g1,
b -n-> c in g2, c -n-> d in g1, x -n-> a in the default graph — so the
closure's reach differs under every dataset rule, which is what makes
these cases discriminating.

Run from tests/w3c/:  python gen_r5k.py
"""

import json

CASES = []


def q(name, data, query, rows=None, vars=None, boolean=None):
    with open(f"queries/{name}.rq", "w") as f:
        f.write(query + "\n")
    exp = {"boolean": boolean} if boolean is not None else {"vars": vars, "rows": rows}
    with open(f"expected/{name}.json", "w") as f:
        json.dump(exp, f, indent=1)
    CASES.append({"name": name, "data": data, "query": f"queries/{name}.rq",
                  "result": f"expected/{name}.json"})


q("path-plus-graph-const", "data/pathgraph.nq",
  'SELECT ?o WHERE { GRAPH <urn:g1> { <urn:a> <urn:n>+ ?o } }',
  rows=[["<urn:b>"]], vars=["o"])

q("path-plus-graph-var", "data/pathgraph.nq",
  'SELECT ?g ?o WHERE { GRAPH ?g { <urn:a> <urn:n>+ ?o } }',
  rows=[["<urn:g1>", "<urn:b>"]], vars=["g", "o"])

q("path-plus-union-graph", "data/pathgraph.nq",
  'SELECT ?o WHERE { <urn:a> <urn:n>+ ?o }',
  rows=[["<urn:b>"], ["<urn:c>"], ["<urn:d>"]], vars=["o"])

q("path-plus-from", "data/pathgraph.nq",
  'SELECT ?o FROM <urn:g1> WHERE { <urn:a> <urn:n>+ ?o }',
  rows=[["<urn:b>"]], vars=["o"])

q("path-plus-fromnamed-empty-default", "data/pathgraph.nq",
  'SELECT ?o FROM NAMED <urn:g1> WHERE { <urn:a> <urn:n>+ ?o }',
  rows=[], vars=["o"])

# ZeroLengthPath over equal constant terms: true regardless of graph
# membership (RDF4J ZeroLengthPathIteration parity — the reference's
# behavior, kept deliberately)
q("path-zero-equal-consts-in-graph", "data/pathgraph.nq",
  'ASK { GRAPH <urn:g2> { <urn:q> <urn:n>? <urn:q> } }',
  boolean=True)


if __name__ == "__main__":
    with open("data/pathgraph.nq", "w") as f:
        f.write('<urn:a> <urn:n> <urn:b> <urn:g1> .\n'
                '<urn:b> <urn:n> <urn:c> <urn:g2> .\n'
                '<urn:c> <urn:n> <urn:d> <urn:g1> .\n'
                '<urn:x> <urn:n> <urn:a> .\n')
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
