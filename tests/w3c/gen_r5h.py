"""Round-5h batch: dateTime component accessors (YEAR..SECONDS, TZ,
TIMEZONE), hash builtins (MD5/SHA1/SHA256/SHA512), IN/NOT IN error-member
short-circuit (|| / && algebra, §17.4.1.9), isIRI/isURI, deterministic
GROUP_CONCAT separator / SAMPLE evaluation, and negated property sets
with inverse members (§9.1 splits !(^p|q) into a forward NPS over {q}
and a reverse NPS over {p}).

Every expected value is hand-derived from the spec:
- fn:seconds-from-dateTime returns xsd:decimal (13.815, not 13);
- TIMEZONE() is xsd:dayTimeDuration ("-PT5H" for -05:00, "PT0S" for Z)
  and a TYPE ERROR for a timezone-less dateTime (BIND -> unbound);
- TZ() is a simple literal ("-05:00", "Z", "" when absent);
- hash builtins return lowercase hex simple literals (RFC test vectors
  for "abc");
- `2 IN (1/0, 2)` is TRUE (error || true = true), `2 IN (1/0, 3)` is an
  ERROR (error || false = error -> FILTER drops), `2 NOT IN (1/0, 2)`
  is FALSE — the official suite's in01..in04/notin01.. shapes.

Run from tests/w3c/:  python gen_r5h.py
"""

import json

CASES = []

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"
DAYTIME = "http://www.w3.org/2001/XMLSchema#dayTimeDuration"


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


# ---- dateTime component accessors over tzmisc.nt t1/t2/t6 ----
# t1 = 2011-01-10T14:45:13.815-05:00 (accessors read the LEXICAL value
# in its own timezone, per fn:year-from-dateTime on the typed value)
q("fn-accessors-ymd", "data/tzmisc.nt",
  'SELECT ?s (YEAR(?w) AS ?y) (MONTH(?w) AS ?mo) (DAY(?w) AS ?d)\n'
  'WHERE { ?s <urn:when> ?w FILTER(?s IN (<urn:t1>, <urn:t2>)) }',
  rows=[["<urn:t1>", 2011, 1, 10], ["<urn:t2>", 2010, 6, 21]],
  vars=["s", "y", "mo", "d"])

q("fn-accessors-hms", "data/tzmisc.nt",
  'SELECT ?s (HOURS(?w) AS ?h) (MINUTES(?w) AS ?mi) (SECONDS(?w) AS ?sec)\n'
  'WHERE { ?s <urn:when> ?w FILTER(?s IN (<urn:t1>, <urn:t2>)) }',
  rows=[["<urn:t1>", 14, 45, 13.815], ["<urn:t2>", 11, 28, 1.0]],
  vars=["s", "h", "mi", "sec"])

# TZ(): simple literal "-05:00" / "Z" / "" (absent)
q("fn-tz-forms", "data/tzmisc.nt",
  'SELECT ?s (TZ(?w) AS ?tz)\n'
  'WHERE { ?s <urn:when> ?w FILTER(?s IN (<urn:t1>, <urn:t2>, <urn:t6>)) }',
  rows=[["<urn:t1>", "-05:00"], ["<urn:t2>", "Z"], ["<urn:t6>", ""]],
  vars=["s", "tz"])

# TIMEZONE(): xsd:dayTimeDuration; absent timezone is a TYPE ERROR, so
# the BIND leaves ?tzd unbound for t6
q("fn-timezone-duration", "data/tzmisc.nt",
  'SELECT ?s ?tzd WHERE {\n'
  '  ?s <urn:when> ?w FILTER(?s IN (<urn:t1>, <urn:t2>, <urn:t6>))\n'
  '  BIND(TIMEZONE(?w) AS ?tzd)\n'
  '}',
  rows=[["<urn:t1>", f'"-PT5H"^^<{DAYTIME}>'],
        ["<urn:t2>", f'"PT0S"^^<{DAYTIME}>'],
        ["<urn:t6>", None]],
  vars=["s", "tzd"])

# ---- hash builtins: RFC 1321 / FIPS 180 test vectors for "abc" ----
q("fn-hash-md5-sha1", "data/people.nt",
  'SELECT (MD5("abc") AS ?m) (SHA1("abc") AS ?s1)\n'
  'WHERE { <urn:alice> <urn:name> ?n }',
  rows=[["900150983cd24fb0d6963f7d28e17f72",
         "a9993e364706816aba3e25717850c26c9cd0d89d"]],
  vars=["m", "s1"])

q("fn-hash-sha256-512", "data/people.nt",
  'SELECT (SHA256("abc") AS ?h2) (SHA512("abc") AS ?h5)\n'
  'WHERE { <urn:alice> <urn:name> ?n }',
  rows=[["ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad",
         "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a"
         "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f"]],
  vars=["h2", "h5"])

# ---- IN / NOT IN with an error member (§17.4.1.9 = chained ||) ----
q("fn-in-error-member-true", "data/people.nt",
  'ASK { <urn:alice> <urn:name> ?n FILTER(2 IN (1/0, 2)) }',
  boolean=True)

q("fn-in-error-member-error", "data/people.nt",
  'ASK { <urn:alice> <urn:name> ?n FILTER(2 IN (1/0, 3)) }',
  boolean=False)

q("fn-not-in-error-member", "data/people.nt",
  'ASK { <urn:alice> <urn:name> ?n FILTER(2 NOT IN (1/0, 2)) }',
  boolean=False)

# ---- isIRI / isURI ----
q("fn-isiri-isuri", "data/people.nt",
  'SELECT (isIRI(?s) AS ?a) (isURI(?s) AS ?b) (isIRI(?n) AS ?c)\n'
  'WHERE { ?s <urn:name> ?n FILTER(?s = <urn:alice>) }',
  rows=[[True, True, False]],
  vars=["a", "b", "c"])

# ---- GROUP_CONCAT with SEPARATOR / SAMPLE, deterministic groups ----
# x3 carries exactly one tag ("red"): separator form evaluates without
# depending on multiset order; SAMPLE over a single-value group must
# return that value
q("agg-groupconcat-separator-eval", "data/misc.nt",
  'SELECT ?s (GROUP_CONCAT(?t; SEPARATOR="|") AS ?g) (SAMPLE(?t) AS ?one)\n'
  'WHERE { ?s <urn:tag> ?t FILTER(?s = <urn:x3>) } GROUP BY ?s',
  rows=[["<urn:x3>", "red", '"red"']],
  vars=["s", "g", "one"])

# ---- NPS with inverse members (§9.1): !(^p|q) = forward NPS over {q}
# UNION reverse NPS over {p} ----
q("path-nps-inverse-mixed", "data/npsinv.nt",
  'SELECT ?s ?o WHERE { ?s !(^<urn:p>|<urn:q>) ?o }',
  rows=[["<urn:a>", "<urn:b>"],   # forward (a,p,b), p not in {q}
        ["<urn:c>", "<urn:a>"],   # forward (c,r,a), r not in {q}
        ["<urn:c>", "<urn:b>"],   # reverse of (b,q,c), q not in {p}
        ["<urn:a>", "<urn:c>"]],  # reverse of (c,r,a), r not in {p}
  vars=["s", "o"])

q("path-nps-inverse-only", "data/npsinv.nt",
  'SELECT ?s ?o WHERE { ?s !(^<urn:p>) ?o }',
  rows=[["<urn:c>", "<urn:b>"], ["<urn:a>", "<urn:c>"]],
  vars=["s", "o"])

# closure over a sequence with an inverse step: from a, (p/^r)* only
# reaches a itself on this data (no x with x r b)
q("path-closure-seq-inverse", "data/npsinv.nt",
  'SELECT ?o WHERE { <urn:a> (<urn:p>/^<urn:r>)* ?o }',
  rows=[["<urn:a>"]],
  vars=["o"])


if __name__ == "__main__":
    with open("data/npsinv.nt", "w") as f:
        f.write("<urn:a> <urn:p> <urn:b> .\n"
                "<urn:b> <urn:q> <urn:c> .\n"
                "<urn:c> <urn:r> <urn:a> .\n")
    manifest = json.load(open("manifest.json"))
    have = {c["name"] for c in manifest}
    added = [c for c in CASES if c["name"] not in have]
    manifest.extend(added)
    json.dump(manifest, open("manifest.json", "w"), indent=1)
    print(f"added {len(added)} cases; manifest now {len(manifest)}")
