"""Round-5n batch: BASE / relative-IRI resolution in PATTERN position
(RFC 3986 reference resolution, shared Turtle/SPARQL rule): plain
relative refs, dot-segments (`../p`), absolute-path refs (`/abs`),
relative PREFIX IRIs resolved against the BASE in scope at declaration,
and successive BASE declarations resolving against the prior one.
Simple string concatenation mangles every one of these (the defect this
batch pins).

Run from tests/w3c/:  python gen_r5n.py
"""

import json

CASES = []


def q(name, query, rows, vars):
    with open(f"queries/{name}.rq", "w") as f:
        f.write(query + "\n")
    with open(f"expected/{name}.json", "w") as f:
        json.dump({"vars": vars, "rows": rows}, f, indent=1)
    CASES.append({"name": name, "data": "data/basedoc.nt",
                  "query": f"queries/{name}.rq",
                  "result": f"expected/{name}.json"})


q("base-relative-pattern",
  'BASE <http://ex/d/>\nSELECT ?o WHERE { <doc> <../p> ?o }',
  rows=[['"v"']], vars=["o"])

q("base-abspath-pattern",
  'BASE <http://ex/d/>\nSELECT ?o WHERE { </abs> <../p> ?o }',
  rows=[['"w"']], vars=["o"])

q("base-relative-prefix",
  'BASE <http://ex/>\nPREFIX p: <d/>\nSELECT ?o WHERE { p:doc <p> ?o }',
  rows=[['"v"']], vars=["o"])

q("base-successive",
  'BASE <http://ex/>\nBASE <d/>\nSELECT ?o WHERE { <doc> <../p> ?o }',
  rows=[['"v"']], vars=["o"])


if __name__ == "__main__":
    with open("data/basedoc.nt", "w") as f:
        f.write('<http://ex/d/doc> <http://ex/p> "v" .\n'
                '<http://ex/abs> <http://ex/p> "w" .\n')
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
