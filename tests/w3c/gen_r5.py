"""One-shot generator for the round-5 evaluation-case batch (rewritten
from the official W3C SPARQL 1.1 approved suite's areas: functions,
aggregates, negation, solution sequences, property paths, GRAPH,
CONSTRUCT, and update evaluation).  Run from tests/w3c/."""

import json
import os

XSD = "http://www.w3.org/2001/XMLSchema#"
INT = f"^^<{XSD}integer>"

MISC_NT = """\
<urn:t> <urn:when> "2010-06-21T11:28:01Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> .
<urn:x1> <urn:v> "-2.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .
<urn:x2> <urn:v> "1.8"^^<http://www.w3.org/2001/XMLSchema#decimal> .
<urn:x3> <urn:v> "4"^^<http://www.w3.org/2001/XMLSchema#integer> .
<urn:x2> <urn:tag> "blue" .
<urn:x2> <urn:tag> "red" .
<urn:x3> <urn:tag> "red" .
"""

CASES = []


def q(name, data, query, rows=None, vars=None, boolean=None, ordered=False,
      update=None):
    exp = {"boolean": boolean} if boolean is not None else (
        {"vars": vars, "rows": rows, **({"ordered": True} if ordered else {})})
    CASES.append({"name": name, "data": data, "query": query,
                  "expected": exp, "update": update})


A, B, C = "<urn:alice>", "<urn:bob>", "<urn:carol>"

# ---- scalar functions (fn: area of the official suite) ----
q("fn-abs-round", "data/misc.nt",
  'SELECT (ABS(?v) AS ?a) (ROUND(?v) AS ?r) WHERE { <urn:x1> <urn:v> ?v }',
  rows=[[2.5, -2]], vars=["a", "r"])
q("fn-ceil-floor", "data/misc.nt",
  'SELECT (CEIL(?v) AS ?c) (FLOOR(?v) AS ?f) WHERE { <urn:x2> <urn:v> ?v }',
  rows=[[2, 1]], vars=["c", "f"])
q("fn-concat-case", "data/people.nt",
  'SELECT (UCASE(?n) AS ?u) (LCASE(?n) AS ?l) (CONCAT(?n,"!") AS ?c) '
  'WHERE { <urn:carol> <urn:name> ?n }',
  rows=[["CAROL", "carol", "Carol!"]], vars=["u", "l", "c"])
q("fn-strlen-ends-contains", "data/people.nt",
  'SELECT (STRLEN(?n) AS ?l) (STRENDS(?n,"ce") AS ?e) (CONTAINS(?n,"li") AS ?c) '
  'WHERE { <urn:alice> <urn:name> ?n }',
  rows=[[5, True, True]], vars=["l", "e", "c"])
q("fn-encode-uri", "data/people.nt",
  'SELECT (ENCODE_FOR_URI("Los Angeles") AS ?e) WHERE { <urn:alice> <urn:type> ?t }',
  rows=[["Los%20Angeles"]], vars=["e"])
q("fn-hashes", "data/people.nt",
  'SELECT (MD5("abc") AS ?m) (SHA1("abc") AS ?s1) (SHA256("abc") AS ?s2) '
  'WHERE { <urn:alice> <urn:type> ?t }',
  rows=[["900150983cd24fb0d6963f7d28e17f72",
         "a9993e364706816aba3e25717850c26c9cd0d89d",
         "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"]],
  vars=["m", "s1", "s2"])
q("fn-replace", "data/people.nt",
  'SELECT (REPLACE("banana","an","*") AS ?r1) (REPLACE(?n,"l","L") AS ?r2) '
  'WHERE { <urn:alice> <urn:name> ?n }',
  rows=[["b**a", "ALice"]], vars=["r1", "r2"])
q("fn-in-list", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:age> ?a FILTER(?a IN (25, 99)) }',
  rows=[[B]], vars=["s"])
q("fn-not-in", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:age> ?a FILTER(?a NOT IN (25)) }',
  rows=[[A]], vars=["s"])
q("fn-sameterm-lang", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:name> ?n FILTER(sameTerm(?n, "Bob"@en)) }',
  rows=[[B]], vars=["s"])
q("fn-isnumeric", "data/misc.nt",
  'SELECT ?s WHERE { ?s <urn:v> ?v FILTER(isNumeric(?v)) }',
  rows=[["<urn:x1>"], ["<urn:x2>"], ["<urn:x3>"]], vars=["s"])
q("fn-str-iri-roundtrip", "data/people.nt",
  'ASK { <urn:alice> <urn:knows> ?o FILTER(IRI(STR(?o)) = ?o) }',
  boolean=True)
q("fn-strlang-strdt-ask", "data/people.nt",
  'ASK { <urn:alice> <urn:type> ?t '
  'FILTER(LANG(STRLANG("chat","fr")) = "fr" && '
  'DATATYPE(STRDT("5", <http://www.w3.org/2001/XMLSchema#integer>)) = '
  '<http://www.w3.org/2001/XMLSchema#integer>) }',
  boolean=True)
q("fn-datetime-date", "data/misc.nt",
  'SELECT (YEAR(?w) AS ?y) (MONTH(?w) AS ?m) (DAY(?w) AS ?d) '
  'WHERE { <urn:t> <urn:when> ?w }',
  rows=[[2010, 6, 21]], vars=["y", "m", "d"])
q("fn-datetime-time", "data/misc.nt",
  'SELECT (HOURS(?w) AS ?h) (MINUTES(?w) AS ?m) (SECONDS(?w) AS ?s) (TZ(?w) AS ?z) '
  'WHERE { <urn:t> <urn:when> ?w }',
  rows=[[11, 28, 1, "Z"]], vars=["h", "m", "s", "z"])
q("fn-type-error-is-false", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:age> ?a FILTER(STRSTARTS(?a,"2")) }',
  rows=[], vars=["s"])
q("fn-bnode-isblank", "data/people.nt",
  'ASK { <urn:alice> <urn:type> ?t FILTER(isBlank(BNODE())) }',
  boolean=True)
q("fn-uuid-struuid", "data/people.nt",
  'ASK { <urn:alice> <urn:type> ?t FILTER(isIRI(UUID()) && '
  'REGEX(STRUUID(), "^[0-9a-fA-F]{8}-")) }',
  boolean=True)
q("fn-int-division-is-decimal", "data/people.nt",
  'SELECT (?a / 4 AS ?q) WHERE { <urn:bob> <urn:age> ?a }',
  rows=[[6.25]], vars=["q"])
q("fn-unary-minus", "data/misc.nt",
  'SELECT (-?v AS ?neg) WHERE { <urn:x2> <urn:v> ?v }',
  rows=[[-1.8]], vars=["neg"])
q("fn-if-with-in", "data/people.nt",
  'SELECT (IF(?a IN (25,30),"known","other") AS ?k) '
  'WHERE { <urn:alice> <urn:age> ?a }',
  rows=[["known"]], vars=["k"])

# ---- aggregates ----
q("agg-sample-det", "data/people.nt",
  'SELECT ?s (SAMPLE(?a) AS ?v) WHERE { ?s <urn:age> ?a } GROUP BY ?s ORDER BY ?s',
  rows=[[A, f'"30"{INT}'], [B, f'"25"{INT}']], vars=["s", "v"], ordered=True)
q("agg-groupconcat-distinct", "data/misc.nt",
  'SELECT (GROUP_CONCAT(DISTINCT ?t; SEPARATOR="|") AS ?ts) '
  'WHERE { ?s <urn:tag> ?t }',
  rows=[["blue|red"]], vars=["ts"])
q("agg-count-star-vs-var", "data/people.nt",
  'SELECT (COUNT(*) AS ?all) (COUNT(?a) AS ?ages) WHERE '
  '{ ?s <urn:type> <urn:Person> OPTIONAL { ?s <urn:age> ?a } }',
  rows=[[3, 2]], vars=["all", "ages"])
q("agg-sum-empty-is-zero", "data/people.nt",
  'SELECT (SUM(?a) AS ?t) WHERE { ?s <urn:nothere> ?a }',
  rows=[[0]], vars=["t"])
q("agg-avg-group", "data/misc.nt",
  'SELECT ?t (AVG(?v) AS ?m) WHERE { ?s <urn:tag> ?t ; <urn:v> ?v } '
  'GROUP BY ?t ORDER BY ?t',
  rows=[["blue", 1.8], ["red", 2.9]], vars=["t", "m"], ordered=True)
q("agg-min-max-numeric", "data/misc.nt",
  'SELECT (MIN(?v) AS ?lo) (MAX(?v) AS ?hi) WHERE { ?s <urn:v> ?v }',
  rows=[[f'"-2.5"^^<{XSD}decimal>', f'"4"{INT}']], vars=["lo", "hi"])
q("agg-having-count", "data/misc.nt",
  'SELECT ?t (COUNT(?s) AS ?n) WHERE { ?s <urn:tag> ?t } GROUP BY ?t '
  'HAVING(COUNT(?s) > 1)',
  rows=[["red", 2]], vars=["t", "n"])
q("agg-count-distinct-var", "data/misc.nt",
  'SELECT (COUNT(DISTINCT ?t) AS ?n) WHERE { ?s <urn:tag> ?t }',
  rows=[[2]], vars=["n"])

# ---- negation ----
q("neg-notexists-graph", "data/quads.nq",
  'SELECT ?g WHERE { GRAPH ?g { ?s <urn:p> ?o } '
  'FILTER NOT EXISTS { GRAPH ?g { ?s <urn:p> "y" } } }',
  rows=[["<urn:g1>"]], vars=["g"])
q("neg-minus-disjoint-keeps", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:name> ?n MINUS { ?x <urn:zzz> ?y } }',
  rows=[[A], [B], [C]], vars=["s"])
q("neg-exists-after-optional", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:type> <urn:Person> OPTIONAL { ?s <urn:knows> ?k } '
  'FILTER(!BOUND(?k) && EXISTS { ?s <urn:name> ?n }) }',
  rows=[[B], [C]], vars=["s"])
q("neg-notin-on-predicate", "data/people.nt",
  'SELECT ?o WHERE { <urn:alice> ?p ?o FILTER(?p NOT IN (<urn:type>, <urn:knows>)) }',
  rows=[['"Alice"'], [f'"30"{INT}']], vars=["o"])

# ---- solution sequences ----
q("seq-offset-no-limit", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:type> <urn:Person> } ORDER BY ?s OFFSET 1',
  rows=[[B], [C]], vars=["s"], ordered=True)
q("seq-limit-zero", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:type> <urn:Person> } LIMIT 0',
  rows=[], vars=["s"])
q("seq-order-by-expr-tie", "data/people.nt",
  'SELECT ?n WHERE { ?s <urn:name> ?n } ORDER BY DESC(STRLEN(?n)) ?n',
  rows=[['"Alice"'], ['"Carol"'], ['"Bob"@en']], vars=["n"], ordered=True)
q("seq-offset-limit-combo", "data/people.nt",
  'SELECT ?s WHERE { ?s <urn:type> <urn:Person> } ORDER BY ?s OFFSET 1 LIMIT 1',
  rows=[[B]], vars=["s"], ordered=True)
q("seq-reduced-eval", "data/people.nt",
  'SELECT REDUCED ?p WHERE { ?s ?p ?o }',
  rows=[["<urn:type>"], ["<urn:name>"], ["<urn:age>"], ["<urn:knows>"]],
  vars=["p"])

# ---- VALUES / BIND ----
q("values-two-vars-join", "data/people.nt",
  'SELECT ?s WHERE { VALUES (?s ?exp) { (<urn:alice> 30) (<urn:bob> 99) } '
  '?s <urn:age> ?exp }',
  rows=[[A]], vars=["s"])
q("bind-chained", "data/people.nt",
  'SELECT ?e WHERE { <urn:bob> <urn:age> ?a BIND(?a*2 AS ?d) BIND(?d+1 AS ?e) }',
  rows=[[51]], vars=["e"])
q("bind-error-leaves-unbound", "data/people.nt",
  'SELECT ?s ?x WHERE { ?s <urn:type> <urn:Person> BIND(1/0 AS ?x) '
  'FILTER(?s = <urn:alice>) }',
  rows=[[A, None]], vars=["s", "x"])

# ---- property paths ----
q("path-seq-then-inverse", "data/chain.nt",
  'SELECT ?x ?z WHERE { ?x (<urn:next>/^<urn:next>) ?z }',
  rows=[["<urn:a>", "<urn:a>"], ["<urn:b>", "<urn:b>"], ["<urn:c>", "<urn:c>"]],
  vars=["x", "z"])
q("path-plus-bound-object", "data/chain.nt",
  'SELECT ?x WHERE { ?x <urn:next>+ <urn:d> }',
  rows=[["<urn:a>"], ["<urn:b>"], ["<urn:c>"]], vars=["x"])
q("path-star-ask-both-bound", "data/chain.nt",
  'ASK { <urn:a> <urn:next>* <urn:c> }', boolean=True)
q("path-plus-ask-reversed-false", "data/chain.nt",
  'ASK { <urn:d> <urn:next>+ <urn:a> }', boolean=False)
q("path-seq-three-hops", "data/chain.nt",
  'SELECT ?x ?y WHERE { ?x (<urn:next>/<urn:next>/<urn:next>) ?y }',
  rows=[["<urn:a>", "<urn:d>"]], vars=["x", "y"])

# ---- GRAPH / dataset ----
q("graph-default-excludes-named", "data/graphchain.nq",
  'SELECT ?s ?o WHERE { ?s <urn:e> ?o }',
  rows=[["<urn:n0>", "<urn:n1>"]], vars=["s", "o"])
q("graph-var-bound-object", "data/graphchain.nq",
  'SELECT ?g ?s WHERE { GRAPH ?g { ?s <urn:e> <urn:n2> } }',
  rows=[["<urn:gA>", "<urn:n1>"]], vars=["g", "s"])
q("graph-union-with-default", "data/graphchain.nq",
  'SELECT ?s WHERE { { ?s <urn:e> ?o } UNION { GRAPH <urn:gB> { ?s <urn:e> ?o } } }',
  rows=[["<urn:n0>"], ["<urn:n3>"]], vars=["s"])

# ---- CONSTRUCT ----
q("construct-constant-template", "data/people.nt",
  'CONSTRUCT { <urn:r> <urn:mark> "x" } WHERE { <urn:alice> <urn:type> ?t }',
  rows=[["<urn:r>", "<urn:mark>", '"x"']], vars=["subj", "pred", "obj"])
q("construct-where-shortform-eval", "data/people.nt",
  'CONSTRUCT WHERE { ?s <urn:age> ?a }',
  rows=[[A, "<urn:age>", f'"30"{INT}'], [B, "<urn:age>", f'"25"{INT}']],
  vars=["subj", "pred", "obj"])

# ---- subquery / optional / union / distinct ----
q("subquery-topk-then-join", "data/people.nt",
  'SELECT ?s ?n WHERE { { SELECT ?s WHERE { ?s <urn:age> ?a } '
  'ORDER BY DESC(?a) LIMIT 1 } ?s <urn:name> ?n }',
  rows=[[A, '"Alice"']], vars=["s", "n"])
q("optional-nested-twice", "data/people.nt",
  'SELECT ?s ?k ?ka WHERE { ?s <urn:type> <urn:Person> '
  'OPTIONAL { ?s <urn:knows> ?k OPTIONAL { ?k <urn:age> ?ka } } }',
  rows=[[A, B, f'"25"{INT}'], [B, None, None], [C, None, None]],
  vars=["s", "k", "ka"])
q("union-bag-duplicates", "data/people.nt",
  'SELECT ?s WHERE { { ?s <urn:name> "Alice" } UNION { ?s <urn:age> 30 } }',
  rows=[[A], [A]], vars=["s"])
q("distinct-across-union", "data/people.nt",
  'SELECT DISTINCT ?s WHERE { { ?s <urn:name> ?n } UNION { ?s <urn:age> ?a } }',
  rows=[[A], [B], [C]], vars=["s"])

# ---- update evaluation ----
UPD = [
    ("upd-insert-data", "data/people.nt",
     'INSERT DATA { <urn:new> <urn:name> "New" }',
     'SELECT (COUNT(?n) AS ?c) WHERE { ?s <urn:name> ?n }',
     {"vars": ["c"], "rows": [[4]]}),
    ("upd-delete-data", "data/people.nt",
     'DELETE DATA { <urn:alice> <urn:knows> <urn:bob> }',
     'ASK { ?s <urn:knows> ?o }',
     {"boolean": False}),
    ("upd-delete-where", "data/people.nt",
     'DELETE WHERE { ?s <urn:age> ?a }',
     'SELECT (COUNT(?a) AS ?c) WHERE { ?s <urn:age> ?a }',
     {"vars": ["c"], "rows": [[0]]}),
    ("upd-with-modify", "data/quads.nq",
     'WITH <urn:g1> DELETE { ?s <urn:p> ?o } INSERT { ?s <urn:p> "w" } '
     'WHERE { ?s <urn:p> ?o }',
     'SELECT ?o WHERE { GRAPH <urn:g1> { ?s <urn:p> ?o } }',
     {"vars": ["o"], "rows": [['"w"']]}),
    ("upd-using-named", "data/quads.nq",
     'INSERT { ?s <urn:q> ?o } USING NAMED <urn:g2> '
     'WHERE { GRAPH ?g { ?s <urn:p> ?o } }',
     'SELECT ?s ?o WHERE { ?s <urn:q> ?o }',
     {"vars": ["s", "o"], "rows": [["<urn:s2>", '"y"']]}),
    ("upd-clear-default", "data/quads.nq",
     'CLEAR DEFAULT',
     'SELECT ?s WHERE { ?s <urn:p> ?o }',
     {"vars": ["s"], "rows": []}),
    ("upd-drop-graph", "data/quads.nq",
     'DROP GRAPH <urn:g1>',
     'SELECT ?g WHERE { GRAPH ?g { ?s ?p ?o } }',
     {"vars": ["g"], "rows": [["<urn:g2>"]]}),
    ("upd-create-is-noop-on-quads", "data/quads.nq",
     'CREATE GRAPH <urn:gnew>',
     'SELECT ?g WHERE { GRAPH ?g { ?s ?p ?o } }',
     {"vars": ["g"], "rows": [["<urn:g1>"], ["<urn:g2>"]]}),
    ("upd-insert-where-bind", "data/people.nt",
     'INSERT { ?s <urn:double> ?d } WHERE { ?s <urn:age> ?a BIND(?a*2 AS ?d) }',
     'SELECT ?s ?d WHERE { ?s <urn:double> ?d } ORDER BY ?s',
     {"vars": ["s", "d"], "ordered": True,
      "rows": [[A, f'"60"{INT}'], [B, f'"50"{INT}']]}),
    ("upd-copy-overwrites", "data/quads.nq",
     'COPY <urn:g1> TO <urn:g2>',
     'SELECT ?o WHERE { GRAPH <urn:g2> { ?s <urn:p> ?o } }',
     {"vars": ["o"], "rows": [['"x"']]}),
    ("upd-two-ops-sequence", "data/quads.nq",
     'INSERT DATA { <urn:a1> <urn:p> "1" } ; DELETE DATA { <urn:s3> <urn:p> "z" }',
     'SELECT ?s ?o WHERE { ?s <urn:p> ?o }',
     {"vars": ["s", "o"], "rows": [["<urn:a1>", '"1"']]}),
]


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    os.chdir(here)
    with open("data/misc.nt", "w") as f:
        f.write(MISC_NT)
    manifest = json.load(open("manifest.json"))
    have = {e["name"] for e in manifest}
    added = 0
    for c in CASES:
        if c["name"] in have:
            continue
        with open(f"queries/{c['name']}.rq", "w") as f:
            f.write(c["query"] + "\n")
        with open(f"expected/{c['name']}.json", "w") as f:
            json.dump(c["expected"], f, indent=1)
        manifest.append({"name": c["name"], "data": c["data"],
                         "query": f"queries/{c['name']}.rq",
                         "result": f"expected/{c['name']}.json"})
        added += 1
    for name, data, upd, query, exp in UPD:
        if name in have:
            continue
        with open(f"updates/{name}.ru", "w") as f:
            f.write(upd + "\n")
        with open(f"queries/{name}.rq", "w") as f:
            f.write(query + "\n")
        with open(f"expected/{name}.json", "w") as f:
            json.dump(exp, f, indent=1)
        manifest.append({"name": name, "data": data,
                         "update": f"updates/{name}.ru",
                         "query": f"queries/{name}.rq",
                         "result": f"expected/{name}.json"})
        added += 1
    with open("manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"added {added}; total {len(manifest)}")


if __name__ == "__main__":
    main()
