"""Stage 1 — mention extraction from file content.

The Spark analog of Halyard's ParserPump RDF parsing
(tools/.../HalyardBulkLoad.java:321-482): instead of a per-file RDF parser
thread feeding a SynchronousQueue, we run vectorized regex extraction over
Arrow batches in ``mapInPandas``.  No per-row Python: every pattern runs
through ``pandas.Series.str.extractall`` (C regex engine over the whole
batch).

Dirty-parse tolerance (HalyardBulkLoad.java:127-189 "skipinvalid"): rows
whose content is null/empty simply yield no matches; a count of skipped
rows is carried in the lineage metrics, not raised.

Output schema: mentions(repo, path, commit, lang, kind, name, qualifier,
content_sha256) where kind in {module, import, class, function, xref}.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MENTIONS_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "kind string, name string, qualifier string, content_sha256 string"
)

# (kind, pattern, name_group, qualifier_group) per language.  Patterns are
# multiline; extractall returns one row per match, vectorized.
_PATTERNS: dict[str, list[tuple[str, str, int, int | None]]] = {
    "python": [
        ("import", r"(?m)^from\s+([\w\.]+)\.(\w+)\s+import", 2, 1),
        ("class", r"(?m)^class\s+(\w+)", 1, None),
        ("function", r"(?m)^def\s+(\w+)\s*\(", 1, None),
        ("xref", r'CROSS_REF\("([^"]+)",\s*"(\w+)"\)', 2, 1),
    ],
    "java": [
        ("import", r"(?m)^import\s+([\w\.]+)\.(\w+);", 2, 1),
        ("class", r"(?m)^(?:public\s+)?class\s+(\w+)", 1, None),
        ("function", r"(?m)^\s*(?:void|int|String)\s+(\w+)\s*\(", 1, None),
        ("xref", r'CROSS_REF\("([^"]+)",\s*"(\w+)"\)', 2, 1),
    ],
}

_META_COLS = ["repo", "path", "commit", "lang", "content_sha256"]


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    frames: list[pd.DataFrame] = []
    meta = pdf[_META_COLS]
    content = pdf["content"].fillna("")

    # the file itself is a module mention: name from the path stem
    mod = pdf["path"].str.extract(r"/(\w+)\.\w+$", expand=False)
    mframe = meta.copy()
    mframe["kind"] = "module"
    mframe["name"] = mod
    mframe["qualifier"] = pdf["path"].str.extract(r"src/(\w+)/", expand=False)
    frames.append(mframe[mframe["name"].notna()])

    for lang, specs in _PATTERNS.items():
        sel = pdf["lang"] == lang
        if not sel.any():
            continue
        sub = content[sel]
        for kind, pattern, name_g, qual_g in specs:
            hits = sub.str.extractall(pattern)
            if hits.empty:
                continue
            hits = hits.reset_index(level=1, drop=True)
            out = meta.loc[hits.index].copy()
            out["kind"] = kind
            out["name"] = hits[name_g - 1].values
            out["qualifier"] = hits[qual_g - 1].values if qual_g else ""
            frames.append(out)

    cols = _META_COLS[:4] + ["kind", "name", "qualifier", "content_sha256"]
    if not frames:
        return pd.DataFrame(columns=cols)
    res = pd.concat(frames, ignore_index=True)
    return res[cols]


def extract_mentions(src: DataFrame) -> DataFrame:
    """src(repo,path,commit,lang,content) -> mentions.

    content_sha256 is computed JVM-side with ``F.sha2`` (codegen'd) before
    the Arrow exchange — the per-row invariant column never touches Python.
    """
    with_sha = src.withColumn("content_sha256", F.sha2(F.col("content").cast("binary"), 256))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf)

    return with_sha.mapInPandas(gen, schema=MENTIONS_SCHEMA)
