"""One-shot generator for the round-5c evaluation-case batch: XPath
substring semantics, §17.4.3 language-tag preservation through the
string function library, STRLANG/STRDT simple-literal requirements,
IF error propagation, DATATYPE of derived strings, EBV edge values,
ORDER BY type ranks, NPS with inverse members, inverse-over-sequence
paths, and SILENT / set-semantics update behaviors — each rewritten
from the corresponding area of the official W3C SPARQL 1.1 approved
suite semantics.

Run from tests/w3c/:  python gen_r5c.py
"""

import json
import os

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

CASES = []


def q(name, data, query, rows=None, vars=None, boolean=None, ordered=False,
      type=None, update=None):
    case = {"name": name, "data": data, "query": query}
    if update:
        case["update"] = update
    if type:
        case["type"] = type
        if type in ("syntax-positive", "syntax-negative", "negative-eval"):
            CASES.append(case)
            return
    exp = {"boolean": boolean} if boolean is not None else (
        {"vars": vars, "rows": rows, **({"ordered": True} if ordered else {})})
    case["expected"] = exp
    CASES.append(case)


# ---- fn:substring semantics (SUBSTR, §17.4.3.3) ----
# positions p with round(start) <= p < round(start)+round(length), 1-based
q("substr-zero-start", "data/people.nt",
  'SELECT (SUBSTR("abcdef", 0, 3) AS ?x) WHERE {}',
  rows=[["ab"]], vars=["x"])
q("substr-negative-start", "data/people.nt",
  'SELECT (SUBSTR("abcde", -1, 4) AS ?x) WHERE {}',
  rows=[["ab"]], vars=["x"])
q("substr-past-end", "data/people.nt",
  'SELECT (SUBSTR("abc", 2, 10) AS ?x) WHERE {}',
  rows=[["bc"]], vars=["x"])
q("substr-zero-length", "data/people.nt",
  'SELECT (SUBSTR("abc", 2, 0) AS ?x) WHERE {}',
  rows=[[""]], vars=["x"])

# ---- language-tag preservation (§17.4.3: UCASE/LCASE/SUBSTR/
#      STRBEFORE/STRAFTER/REPLACE carry arg1's tag; CONCAT only when
#      every argument shares it) ----
q("ucase-lang-preserved", "data/people.nt",
  "SELECT (UCASE(?n) AS ?u) (LANG(UCASE(?n)) AS ?l) "
  "WHERE { <urn:bob> <urn:name> ?n }",
  rows=[['"BOB"@en', "en"]], vars=["u", "l"])
q("substr-lang-preserved", "data/people.nt",
  "SELECT (SUBSTR(?n, 1, 2) AS ?x) WHERE { <urn:bob> <urn:name> ?n }",
  rows=[['"Bo"@en']], vars=["x"])
q("strbefore-lang-match", "data/people.nt",
  'SELECT (STRBEFORE(?n, "o") AS ?x) WHERE { <urn:bob> <urn:name> ?n }',
  rows=[['"B"@en']], vars=["x"])
q("strbefore-nomatch-simple", "data/people.nt",
  # strBefore("Bob"@en, "z") is the empty SIMPLE literal, not ""@en
  'SELECT (STRBEFORE(?n, "z") AS ?x) (LANG(STRBEFORE(?n, "z")) AS ?l) '
  "WHERE { <urn:bob> <urn:name> ?n }",
  rows=[["", ""]], vars=["x", "l"])
q("strafter-empty-arg2", "data/people.nt",
  # strAfter("Bob"@en, "") = "Bob"@en
  'SELECT (STRAFTER(?n, "") AS ?x) WHERE { <urn:bob> <urn:name> ?n }',
  rows=[['"Bob"@en']], vars=["x"])
q("strbefore-lang-incompat", "data/people.nt",
  # argument-compatibility (§17.4.1.5): "Bob"@en vs "b"@cy is an error
  'SELECT (STRBEFORE(?n, "b"@cy) AS ?x) WHERE { <urn:bob> <urn:name> ?n }',
  rows=[[None]], vars=["x"])
q("concat-lang-same", "data/people.nt",
  "SELECT (CONCAT(?n, ?n) AS ?x) WHERE { <urn:bob> <urn:name> ?n }",
  rows=[['"BobBob"@en']], vars=["x"])
q("concat-lang-mixed-simple", "data/people.nt",
  # one plain argument makes the result a simple literal
  'SELECT (CONCAT(?n, "!") AS ?x) WHERE { <urn:bob> <urn:name> ?n }',
  rows=[["Bob!"]], vars=["x"])
q("replace-lang-preserved", "data/people.nt",
  'SELECT (REPLACE(?n, "o", "0") AS ?x) WHERE { <urn:bob> <urn:name> ?n }',
  rows=[['"B0b"@en']], vars=["x"])

# ---- STRLANG / STRDT simple-literal requirement (§17.4.2.5/6) ----
q("strlang-simple-ok", "data/people.nt",
  'SELECT (STRLANG("chat", "en") AS ?x) WHERE {}',
  rows=[['"chat"@en']], vars=["x"])
q("strlang-on-tagged-is-error", "data/people.nt",
  'SELECT (STRLANG(?n, "fr") AS ?x) WHERE { <urn:bob> <urn:name> ?n }',
  rows=[[None]], vars=["x"])
q("strlang-on-number-is-error", "data/people.nt",
  'SELECT (STRLANG(?a, "en") AS ?x) WHERE { <urn:alice> <urn:age> ?a }',
  rows=[[None]], vars=["x"])
q("strdt-on-tagged-is-error", "data/people.nt",
  f'SELECT (STRDT(?n, <{XSD}string>) AS ?x) '
  "WHERE { <urn:bob> <urn:name> ?n }",
  rows=[[None]], vars=["x"])

# ---- DATATYPE over lang-tagged and derived strings ----
q("datatype-langstring", "data/people.nt",
  "SELECT (DATATYPE(?n) AS ?d) WHERE { <urn:bob> <urn:name> ?n }",
  rows=[[RDF + "langString"]], vars=["d"])
q("datatype-derived-string", "data/people.nt",
  'SELECT (DATATYPE(UCASE("x")) AS ?d) WHERE {}',
  rows=[[XSD + "string"]], vars=["d"])

# ---- IF error propagation / COALESCE error skipping (§17.4.1) ----
q("if-error-cond-is-error", "data/people.nt",
  'SELECT (IF(1/0 = 1, "a", "b") AS ?x) WHERE {}',
  rows=[[None]], vars=["x"])
q("coalesce-error-skipped", "data/people.nt",
  'SELECT (COALESCE(1/0, "ok") AS ?x) WHERE {}',
  rows=[["ok"]], vars=["x"])

# ---- EBV edge values (§17.2.2) ----
q("ebv-zero-string-true", "data/people.nt",
  'ASK { FILTER("0") }', boolean=True)
q("ebv-zero-int-false", "data/people.nt",
  "ASK { FILTER(0) }", boolean=False)
q("ebv-empty-string-false", "data/people.nt",
  'ASK { FILTER("") }', boolean=False)

# ---- ORDER BY type ranks (§15.1: IRIs order before literals) ----
q("order-type-ranks", "data/people.nt",
  'SELECT ?x WHERE { VALUES ?x { <urn:b> "a" <urn:a> } } ORDER BY ?x',
  rows=[["<urn:a>"], ["<urn:b>"], ['"a"']], vars=["x"], ordered=True)

# ---- property paths: inverse over a sequence; NPS with an inverse
#      member (§9.1) ----
q("path-inverse-over-sequence", "data/chain.nt",
  "SELECT ?x WHERE { ?x ^(<urn:next>/<urn:next>) <urn:a> }",
  rows=[["<urn:c>"]], vars=["x"])
q("path-nps-inverse-member", "data/chain.nt",
  # !(^next|name): forward edges with pred not in {name} plus reversed
  # edges with pred not in {next}
  "SELECT ?x ?y WHERE { ?x !(^<urn:next>|<urn:name>) ?y }",
  rows=[["<urn:a>", "<urn:b>"], ["<urn:b>", "<urn:c>"],
        ["<urn:c>", "<urn:d>"], ['"D"', "<urn:d>"]], vars=["x", "y"])

# ---- updates: SILENT graph management; set semantics ----
q("upd-clear-silent-missing", "data/quads.nq",
  "SELECT (COUNT(*) AS ?c) WHERE { ?s ?p ?o }",
  update="CLEAR SILENT GRAPH <urn:nosuch>",
  rows=[[3]], vars=["c"])
q("upd-insert-duplicate-set", "data/quads.nq",
  'SELECT (COUNT(*) AS ?c) WHERE { <urn:s3> <urn:p> "z" }',
  update='INSERT DATA { <urn:s3> <urn:p> "z" }',
  rows=[[1]], vars=["c"])

# ---- syntax ----
q("syn-path-nps-inverse-mix", "data/people.nt",
  "SELECT * WHERE { ?x !(^<urn:a>|<urn:b>|^<urn:c>) ?y }",
  type="syntax-positive")
q("syn-concat-no-args", "data/people.nt",
  "SELECT (CONCAT() AS ?x) WHERE {}",
  type="syntax-positive")


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    manifest = json.load(open(os.path.join(here, "manifest.json")))
    have = {c["name"] for c in manifest}
    for c in CASES:
        assert c["name"] not in have, f"duplicate case {c['name']}"
        qpath = f"queries/{c['name']}.rq"
        with open(os.path.join(here, qpath), "w") as f:
            f.write(c.pop("query") + "\n")
        entry = {"name": c["name"], "data": c["data"], "query": qpath}
        if "update" in c:
            upath = f"updates/{c['name']}.ru"
            with open(os.path.join(here, upath), "w") as f:
                f.write(c.pop("update") + "\n")
            entry["update"] = upath
        if c.get("type"):
            entry["type"] = c["type"]
        if "expected" in c:
            rpath = f"expected/{c['name']}.json"
            with open(os.path.join(here, rpath), "w") as f:
                json.dump(c["expected"], f, indent=1)
            entry["result"] = rpath
        manifest.append(entry)
    with open(os.path.join(here, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"added {len(CASES)} cases; manifest now {len(manifest)}")


if __name__ == "__main__":
    main()
