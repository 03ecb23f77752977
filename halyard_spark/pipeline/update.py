"""Bulk update / delete over the triple store — the HalyardBulkUpdate /
HalyardBulkDelete analogs (SURVEY.md §2.7).

Reference semantics to preserve (tools/.../HalyardBulkUpdate.java:104-292):
an update runs in STAGES; within a stage every DELETE/INSERT effect is
computed against the PRE-STAGE snapshot and applied atomically at stage
end (MR job per stage, HFile bulk adopt).  Spark-native: each stage is a
pure DataFrame transform of the previous snapshot; ``localCheckpoint``
between stages pins the pre-stage state so stage N+1 cannot observe its
own writes mid-flight.  Applying the final snapshot is an overwrite of the
store (the atomic-adopt analog; on Iceberg, a MERGE/snapshot commit).

BulkDelete (tools/.../HalyardBulkDelete.java:69-203): full scan +
pattern match + delete markers -> here a single anti-join rewrite.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POSITIONS = ("subj", "pred", "obj", "ctx")


def _pattern_cond(s=None, p=None, o=None, c=None):
    cond = F.lit(True)
    for pos, term in zip(_POSITIONS, (s, p, o, c)):
        if term is not None:
            cond = cond & (F.col(pos) == term)
    return cond


def bulk_delete(triples: DataFrame, s=None, p=None, o=None, c=None) -> DataFrame:
    """Remove every statement matching the (s?, p?, o?, c?) pattern.

    The reference emits HBase DeleteColumn markers per matching cell; the
    relational rewrite is a single filter (no shuffle at all).
    """
    return triples.where(~_pattern_cond(s, p, o, c))


Stage = Callable[[DataFrame], tuple[DataFrame | None, DataFrame | None]]


def bulk_update(triples: DataFrame, stages: list[Stage]) -> DataFrame:
    """Multi-stage SPARQL-UPDATE-style mutation.

    Each stage fn maps the pre-stage snapshot to (deletes, inserts) — either
    may be None.  Deletes are matched on full (subj,pred,obj,ctx) equality
    (set semantics); inserts are unioned and deduplicated.  All reads within
    a stage see only the pre-stage snapshot (snapshot isolation, mirrors
    TimeAwareHBaseSail timestamp ordering + per-stage MR jobs).
    """
    snapshot = triples
    for stage_fn in stages:
        deletes, inserts = stage_fn(snapshot)
        nxt = snapshot
        if deletes is not None:
            d = deletes.select(*[F.col(c).alias(f"_d_{c}") for c in _POSITIONS]).distinct()
            cond = None
            for c in _POSITIONS:
                # null-safe: the default graph (ctx NULL) must match itself
                term = nxt[c].eqNullSafe(d[f"_d_{c}"])
                cond = term if cond is None else cond & term
            nxt = nxt.join(d, on=cond, how="left_anti")
        if inserts is not None:
            nxt = nxt.unionByName(inserts.select(*_POSITIONS)).dropDuplicates(list(_POSITIONS))
        snapshot = nxt.localCheckpoint(eager=True)  # pin pre-stage state for stage N+1
    return snapshot


def timestamped_update(
    triples: DataFrame, ops: DataFrame, base_ts: int = 0
) -> DataFrame:
    """MVCC cell-timestamp resolution — the TimeAwareHBaseSail analog.

    `ops` rows are (subj, pred, obj, ctx, ts long, op in {insert, delete})
    with USER-SUPPLIED timestamps (the reference binds them from query
    variables, TimeAwareHBaseSail.java:81-106); ops may arrive in ANY
    order.  Resolution mirrors the HBase cell encoding exactly
    (HalyardTableUtils.java:271-276): each op's effective version is
    ``ts << 1 | is_insert`` so at equal timestamps an insert always beats
    a delete ("inserts are considered always later after deletes on a
    timeline"); per quad the op with the max effective version decides
    presence.  The base snapshot participates as inserts at `base_ts`.

    Spark shape: ONE hash aggregation on the quad key — last-write-wins
    needs no ordering of the input, so out-of-order and replayed op logs
    resolve identically on any partitioning (scales like any groupBy;
    no window, no sort).
    """
    is_insert = F.when(F.col("op") == "insert", F.lit(1)).otherwise(F.lit(0))
    base_rows = triples.select(*_POSITIONS).withColumn(
        "__eff", F.lit((int(base_ts) << 1) | 1).cast("long")
    )
    op_rows = ops.select(
        *_POSITIONS,
        (F.shiftleft(F.col("ts").cast("long"), 1) + is_insert).alias("__eff"),
    )
    resolved = (
        base_rows.unionByName(op_rows)
        .groupBy(*_POSITIONS)
        .agg(F.max("__eff").alias("__winner"))
    )
    return resolved.where(F.col("__winner").bitwiseAND(1) == 1).drop("__winner")
