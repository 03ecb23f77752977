"""Independent golden reference emitter for the KG pipeline.

Plays the role of the Halyard bulk-load reference emission that the
pipeline's triples are scored against (P/R >= 0.95, BASELINE.json).  This
is a deliberately different code path from the Spark pipeline: plain
per-row Python `re` + a union-find, operating on a collected pandas frame.
If the two agree, the distributed implementation computes the intended
function.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

P = {
    "imports": "<urn:p:imports>",
    "definesClass": "<urn:p:definesClass>",
    "definesFunction": "<urn:p:definesFunction>",
    "references": "<urn:p:references>",
    "inRepo": "<urn:p:inRepo>",
    "atPath": "<urn:p:atPath>",
    "atCommit": "<urn:p:atCommit>",
    "lang": "<urn:p:lang>",
    "sha256": "<urn:p:sha256>",
    "canonical": "<urn:p:canonical>",
    "namespacePrefix": "<urn:p:namespacePrefix>",
}

_PY = {
    "import": re.compile(r"^from\s+([\w\.]+)\.(\w+)\s+import", re.M),
    "class": re.compile(r"^class\s+(\w+)", re.M),
    "function": re.compile(r"^def\s+(\w+)\s*\(", re.M),
}
_JAVA = {
    "import": re.compile(r"^import\s+([\w\.]+)\.(\w+);", re.M),
    "class": re.compile(r"^(?:public\s+)?class\s+(\w+)", re.M),
    "function": re.compile(r"^\s*(?:void|int|String)\s+(\w+)\s*\(", re.M),
}
_XREF = re.compile(r'CROSS_REF\("([^"]+)",\s*"(\w+)"\)')


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def lit(s: str) -> str:
    for raw, esc in [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]:
        s = s.replace(raw, esc)
    return f'"{s}"'


def golden_triples(src: pd.DataFrame) -> set[tuple]:
    """Expected (subj, pred, obj, ctx) set for a src corpus frame."""
    out: set[tuple] = set()
    defined_modules: set[str] = set()
    file_classes: dict[tuple, list[str]] = {}
    pending_refs: list[tuple] = []  # (file_iri, pred, kind, name, ctx)

    for row in src.itertuples(index=False):
        m = re.search(r"/(\w+)\.\w+$", row.path)
        if m:
            defined_modules.add(m.group(1))

    uf = UnionFind()
    for row in src.itertuples(index=False):
        fi = f"<urn:file:{row.repo}/{row.path}>"
        ctx = f"<urn:graph:{row.repo}>"
        sha = hashlib.sha256(row.content.encode()).hexdigest()
        out.add((fi, P["inRepo"], f"<urn:repo:{row.repo}>", ctx))
        out.add((fi, P["atPath"], lit(row.path), ctx))
        out.add((fi, P["atCommit"], lit(row.commit), ctx))
        out.add((fi, P["lang"], lit(row.lang), ctx))
        out.add((fi, P["sha256"], lit(sha), ctx))

        pats = _JAVA if row.lang == "java" else _PY
        classes = []
        for name in pats["class"].findall(row.content):
            ent = f"<urn:entity:class:{name}>"
            out.add((fi, P["definesClass"], ent, ctx))
            classes.append(ent)
        if classes:
            file_classes[(row.repo, row.path)] = classes
            hub = min(classes)
            for ent in classes:
                uf.union(ent, hub)
        for name in pats["function"].findall(row.content):
            out.add((fi, P["definesFunction"], f"<urn:entity:function:{name}>", ctx))
        for _pkg, name in pats["import"].findall(row.content):
            pending_refs.append((fi, P["imports"], name, ctx))
        for _repo, name in _XREF.findall(row.content):
            pending_refs.append((fi, P["references"], name, ctx))

    for fi, pred, name, ctx in pending_refs:
        if name in defined_modules:
            out.add((fi, pred, f"<urn:entity:module:{name}>", ctx))

    for ent in list(uf.parent):
        root = uf.find(ent)
        if root != ent:
            out.add((ent, P["canonical"], root, None))

    out.add(("<urn:halyard-spark:>", P["namespacePrefix"], '"hs"', None))
    return out


def precision_recall(actual: set[tuple], expected: set[tuple]) -> tuple[float, float]:
    if not actual or not expected:
        return 0.0, 0.0
    tp = len(actual & expected)
    return tp / len(actual), tp / len(expected)
