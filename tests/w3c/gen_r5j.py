"""Round-5j batch: xsd:dateTime/xsd:date constructor casts must
validate FIELD RANGES (month<=12, day valid for month, hour<=23), not
just the lexical shape — §17.5 casting via XPath constructor functions
makes an out-of-range lexical a type error.  Plus the two XSD-legal
forms a naive timestamp cast rejects: T24:00:00 end-of-day and a
timezoned xsd:date.

Run from tests/w3c/:  python gen_r5j.py
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


XSD = "http://www.w3.org/2001/XMLSchema#"
P = f"PREFIX xsd: <{XSD}>\n"

# out-of-range fields -> cast error -> unbound projection
q("cast-datetime-month-13-error", "data/misc.nt",
  P + 'SELECT (xsd:dateTime("2010-13-40T99:99:99") AS ?c)\n'
      'WHERE { <urn:x1> <urn:v> ?o }',
  rows=[[None]], vars=["c"])
q("cast-date-feb-31-error", "data/misc.nt",
  P + 'SELECT (xsd:date("2010-02-31") AS ?c) WHERE { <urn:x1> <urn:v> ?o }',
  rows=[[None]], vars=["c"])
q("cast-datetime-hour-99-error", "data/misc.nt",
  P + 'SELECT (xsd:dateTime("2010-01-15T99:00:00") AS ?c)\n'
      'WHERE { <urn:x1> <urn:v> ?o }',
  rows=[[None]], vars=["c"])

# XSD-legal forms that a plain timestamp cast would reject
q("cast-datetime-t24-end-of-day", "data/misc.nt",
  P + 'SELECT (xsd:dateTime("2010-01-15T24:00:00") AS ?c)\n'
      'WHERE { <urn:x1> <urn:v> ?o }',
  rows=[[f'"2010-01-15T24:00:00"^^<{XSD}dateTime>']], vars=["c"])
q("cast-date-with-timezone", "data/misc.nt",
  P + 'SELECT (xsd:date("2010-01-15Z") AS ?c) WHERE { <urn:x1> <urn:v> ?o }',
  rows=[[f'"2010-01-15Z"^^<{XSD}date>']], vars=["c"])
q("cast-date-negative-year", "data/misc.nt",
  P + 'SELECT (xsd:date("-0044-03-15") AS ?c) WHERE { <urn:x1> <urn:v> ?o }',
  rows=[[f'"-0044-03-15"^^<{XSD}date>']], vars=["c"])

# T24 with a nonzero fraction is NOT in the lexical space (24:00:00
# only, §3.2.7 of XML Schema datatypes)
q("cast-datetime-t24-frac-error", "data/misc.nt",
  P + 'SELECT (xsd:dateTime("2010-01-15T24:00:00.5") AS ?c)\n'
      'WHERE { <urn:x1> <urn:v> ?o }',
  rows=[[None]], vars=["c"])


if __name__ == "__main__":
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
