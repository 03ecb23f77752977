"""Statement-pattern scan — the leaf of every SPARQL query.

Halyard picks the index permutation whose prefix covers the bound terms
and builds an HBase range scan (common/.../HalyardTableUtils.java:300-373,
scan builders :496-510, 16-way dispatch).  Spark-side, the same effect is
a filter over the sorted mirror chosen by ``materialize.pick_index``:
partition pruning (ctx partition column) + parquet min/max row-group
pruning on the sort-leading column do what start/stop rows do, and the
filter itself is pushed into the scan (PushedFilters in explain()).

Unbound positions become projected variables (renamed columns);
bound positions become equality filters and are dropped from the output —
exactly the binding semantics of HBaseSail.StatementScanner
(sail/.../HBaseSail.java:685-787) minus the hash-collision re-check,
which is unnecessary because we store full values in columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POSITIONS = ["subj", "pred", "obj", "ctx"]


def statement_pattern(
    triples: DataFrame,
    s: str | None = None,
    p: str | None = None,
    o: str | None = None,
    c: str | None = None,
    vars: dict[str, str] | None = None,
) -> DataFrame:
    """Evaluate pattern (s?, p?, o?, c?); None = unbound.

    ``vars`` renames unbound positions to SPARQL variable names, e.g.
    ``{"subj": "file", "obj": "entity"}``.
    """
    bound = {"subj": s, "pred": p, "obj": o, "ctx": c}
    df = triples
    for pos, term in bound.items():
        if term is not None:
            df = df.filter(F.col(pos) == term)
    vars = vars or {}
    out_cols = []
    seen: dict[str, str] = {}
    for pos in _POSITIONS:
        if bound[pos] is not None or pos not in df.columns:
            continue
        # ctx is only a variable in a QUAD pattern — project it solely when
        # the caller names it; otherwise a NULL ctx would join NULL<->NULL
        # and (correctly but surprisingly) empty every BGP join.
        if pos == "ctx" and "ctx" not in vars:
            continue
        name = vars.get(pos, pos)
        if name in seen:
            # repeated variable in one pattern (?x <p> ?x): equality
            # constraint + a single output column, as in SPARQL
            df = df.filter(F.col(seen[name]) == F.col(pos))
            continue
        seen[name] = pos
        out_cols.append(F.col(pos).alias(name))
    return df.select(*out_cols)
