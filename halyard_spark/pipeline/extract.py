"""Stage 1 — mention extraction from file content.

The Spark analog of Halyard's ParserPump RDF parsing
(tools/.../HalyardBulkLoad.java:321-482): instead of a per-file RDF parser
thread feeding a SynchronousQueue, we run vectorized regex extraction over
Arrow batches in ``mapInPandas``.  No per-row Python: every pattern runs
through ``pandas.Series.str.extractall`` (C regex engine over the whole
batch).

Boundary-width discipline (the 100 TB concern): the Python exchange
carries ONLY (fid, lang, content) in and (fid, kind, name, qualifier)
out — an 8-byte key instead of echoing repo/path/commit/sha256 strings
through the Arrow socket per mention.  File metadata (computed JVM-side:
sha256 via codegen'd F.sha2) is re-attached after extraction by a join on
fid, which Catalyst turns into a broadcast join whenever the file-meta
side fits (per-partition hash join otherwise).  Cutting the socket bytes
~5x is what lets the python stage scale with executor count.

Dirty-parse tolerance (HalyardBulkLoad.java:127-189 "skipinvalid"): rows
whose content is null/empty simply yield no matches.

Output schema: mentions(repo, path, commit, lang, kind, name, qualifier,
content_sha256) where kind in {file, module, import, class, function,
xref}; the 'file' kind is a per-file registry row (exactly one per input
file) that makes the mentions parquet a complete file inventory for
lineage aggregation.
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

_RAW_SCHEMA = "fid long, kind string, name string, qualifier string"

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


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    frames: list[pd.DataFrame] = []
    fid = pdf["fid"]
    content = pdf["content"].fillna("")

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
            out = pd.DataFrame(
                {
                    "fid": fid.loc[hits.index].values,
                    "kind": kind,
                    "name": hits[name_g - 1].values,
                    "qualifier": hits[qual_g - 1].values if qual_g else "",
                }
            )
            frames.append(out)

    cols = ["fid", "kind", "name", "qualifier"]
    if not frames:
        return pd.DataFrame(columns=cols)
    return pd.concat(frames, ignore_index=True)[cols]


def file_meta(src: DataFrame) -> DataFrame:
    """Per-file metadata incl. the sha256 invariant — all JVM-side
    (codegen'd), one row per file."""
    return src.select(
        _fid(),
        "repo",
        "path",
        "commit",
        "lang",
        F.sha2(F.col("content").cast("binary"), 256).alias("content_sha256"),
    )


def _fid():
    """File id for the narrow Arrow boundary: includes COMMIT so two
    snapshots of the same path never share an id (a shared id would
    cross-join both versions' metadata onto every mention through the
    fid join).  64-bit collisions remain theoretical at ~10^9 files;
    the downstream quad emission is keyed on the full natural columns."""
    return F.xxhash64("repo", "path", "commit").alias("fid")


def extract_mentions(src: DataFrame) -> DataFrame:
    """src(repo,path,commit,lang,content) -> mentions."""
    compact = src.select(_fid(), "lang", "path", "content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf)

    raw = compact.select("fid", "lang", "content").mapInPandas(gen, schema=_RAW_SCHEMA)

    # the file-is-a-module mention needs only the path — pure JVM
    module_rows = compact.select(
        "fid",
        F.lit("module").alias("kind"),
        F.regexp_extract("path", r"/(\w+)\.\w+$", 1).alias("name"),
        F.regexp_extract("path", r"src/(\w+)/", 1).alias("qualifier"),
    ).where(F.col("name") != "")

    # guaranteed per-file registry row: every input file appears in the
    # mentions parquet exactly once with kind='file' even when no pattern
    # (or module-name regex) matched — downstream lineage aggregates the
    # persisted content_sha256 from these rows instead of re-reading and
    # re-hashing the corpus (pipeline/lineage.py::partition_lineage)
    file_rows = compact.select(
        "fid",
        F.lit("file").alias("kind"),
        F.col("path").alias("name"),
        F.lit("").alias("qualifier"),
    )

    meta = file_meta(src)
    all_raw = raw.unionByName(module_rows).unionByName(file_rows)
    return all_raw.join(meta, "fid").select(
        "repo", "path", "commit", "lang", "kind", "name", "qualifier", "content_sha256"
    )
