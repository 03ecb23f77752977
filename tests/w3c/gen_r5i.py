"""Round-5i batch: UPDATE template-instantiation semantics (§3.1.3) —
fresh blank nodes per solution in INSERT templates, ill-formed /
unbound template rows skipped, blank nodes PROHIBITED in DELETE
templates (DELETE DATA / DELETE WHERE / DELETE {} forms — the official
NegativeUpdateSyntaxTest11 shapes), USING overriding WITH for the WHERE
pattern while WITH still receives the inserts, and ';'-sequences where
a later operation reads an earlier one's effects.

Run from tests/w3c/:  python gen_r5i.py
"""

import json

CASES = []


def q(name, data, query, rows=None, vars=None, boolean=None, update=None,
      type=None):
    entry = {"name": name, "data": data}
    if update is not None:
        with open(f"updates/{name}.ru", "w") as f:
            f.write(update + "\n")
        entry["update"] = f"updates/{name}.ru"
    if type:
        entry["type"] = type
        CASES.append(entry)
        return
    with open(f"queries/{name}.rq", "w") as f:
        f.write(query + "\n")
    entry["query"] = f"queries/{name}.rq"
    exp = {"boolean": boolean} if boolean is not None else {"vars": vars, "rows": rows}
    with open(f"expected/{name}.json", "w") as f:
        json.dump(exp, f, indent=1)
    entry["result"] = f"expected/{name}.json"
    CASES.append(entry)


# ---- INSERT bnode template: ONE fresh bnode per solution, shared
# across the template rows instantiated from that solution ----
q("upd-insert-bnode-fresh", "data/people.nt",
  'SELECT (COUNT(DISTINCT ?x) AS ?c) WHERE {\n'
  '  ?x <urn:label> ?n . ?x <urn:of> ?s FILTER(isBlank(?x))\n'
  '}',
  update='INSERT { _:x <urn:label> ?n . _:x <urn:of> ?s }\n'
         'WHERE { ?s <urn:name> ?n }',
  rows=[[3]], vars=["c"])

# ---- ill-formed template rows (literal subject) are skipped; the
# well-formed rows from the SAME template still land ----
q("upd-insert-illformed-skip", "data/people.nt",
  'SELECT (COUNT(*) AS ?bad) (SUM(IF(?p = <urn:ok>, 1, 0)) AS ?good)\n'
  'WHERE { ?s ?p ?o FILTER(?p IN (<urn:bad>, <urn:ok>)) }',
  update='INSERT { ?n <urn:bad> <urn:o> . ?s <urn:ok> "y" }\n'
         'WHERE { ?s <urn:name> ?n }',
  rows=[[3, 3.0]], vars=["bad", "good"])

# ---- a solution leaving a template variable unbound produces no quad
# for that row (and deletes nothing for a DELETE row) ----
q("upd-delete-unbound-skip", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:age> ?a }',
  update='DELETE { ?s <urn:age> ?x }\n'
         'WHERE { ?s <urn:name> ?n OPTIONAL { ?s <urn:missing> ?x } }',
  rows=[["<urn:alice>"], ["<urn:bob>"]], vars=["s"])

# ---- blank nodes prohibited in every DELETE form ----
q("updbad-delete-data-bnode", "data/people.nt", None,
  update='DELETE DATA { _:b <urn:name> "x" }', type="update-negative")
q("updbad-delete-where-bnode", "data/people.nt", None,
  update='DELETE WHERE { _:b <urn:name> ?n }', type="update-negative")
q("updbad-delete-template-bnode", "data/people.nt", None,
  update='DELETE { _:b <urn:p> ?o } WHERE { ?s <urn:p> ?o }',
  type="update-negative")

# ---- USING overrides WITH for the WHERE pattern; inserts still go to
# the WITH graph ----
q("upd-using-overrides-with", "data/quads.nq",
  'SELECT ?s WHERE { GRAPH <urn:tgt> { ?s <urn:flag> "f" } }',
  update='WITH <urn:tgt>\n'
         'INSERT { ?s <urn:flag> "f" }\n'
         'USING <urn:g1>\n'
         'WHERE { ?s ?p ?o }',
  rows=[["<urn:g1s>"]], vars=["s"])

# ---- op 2 of a sequence sees op 1's effects ----
q("upd-sequence-sees-prior", "data/people.nt",
  'SELECT ?p WHERE { <urn:dave> ?p ?o } ORDER BY ?p',
  update='INSERT DATA { <urn:dave> <urn:name> "Dave" } ;\n'
         'INSERT { ?s <urn:seen> "1" } WHERE { ?s <urn:name> "Dave" }',
  rows=[["<urn:name>"], ["<urn:seen>"]], vars=["p"])


if __name__ == "__main__":
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
