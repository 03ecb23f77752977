"""SPARQL algebra nodes -> DataFrame combinators.

Line-mapped to the reference implementations in
strategy/.../HalyardTupleExprEvaluation.java (HTEE below).  Halyard's one
physical join strategy is an async index-nested-loop bind join
(HTEE:735-762); Spark instead picks broadcast / shuffled-hash /
sort-merge per Catalyst + AQE, which is the point of the rebuild.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shared_vars(left: DataFrame, right: DataFrame) -> list[str]:
    return [c for c in left.columns if c in set(right.columns)]


def bgp_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Join (BGP '.'): inner join on shared variables (HTEE:735-762).

    No shared variables -> cross product, per SPARQL join semantics.
    """
    shared = _shared_vars(left, right)
    if not shared:
        return left.crossJoin(right)
    return left.join(right, on=shared, how="inner")


def optional_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column | None = None,
    wildcard_cols: set | None = None,
) -> DataFrame:
    """LeftJoin (OPTIONAL), condition evaluated in the right scope
    (HTEE:770-866).

    wildcard_cols: shared columns where a NULL on the left means UNBOUND
    (e.g. a VALUES UNDEF cell) — SPARQL compatibility says an unbound
    variable matches ANY right binding, so those columns join with the
    null-wildcard condition and the output takes whichever side is bound.
    Ordinary shared columns keep the null-safe equality fast path."""
    shared = _shared_vars(left, right)
    wc = set(wildcard_cols or ()) & set(shared)
    if shared:
        terms = []
        for c in shared:
            if c in wc:
                terms.append(left[c].isNull() | right[c].isNull() | (left[c] == right[c]))
            else:
                terms.append(left[c].eqNullSafe(right[c]))
        cond = reduce(lambda a, b: a & b, terms)
        if condition is not None:
            cond = cond & condition
        joined = left.join(right, on=cond, how="left_outer")
        if not wc:
            # collapse the duplicated shared columns (keep left's)
            for c in shared:
                joined = joined.drop(right[c])
            return joined
        left_cols = set(left.columns)
        sel = [
            (F.coalesce(left[c], right[c]) if c in wc else left[c]).alias(c)
            for c in left.columns
        ] + [right[c].alias(c) for c in right.columns if c not in left_cols]
        return joined.select(*sel)
    if condition is not None:
        return left.join(right, on=condition, how="left_outer")
    return left.join(right, how="left_outer")


def minus(
    left: DataFrame, right: DataFrame, wildcard_cols: set | None = None
) -> DataFrame:
    """Difference (MINUS): drop left rows compatible with a right row
    sharing >=1 variable; rows with disjoint domains are KEPT
    (HTEE:944-994 — the SPARQL-algebra subtlety).

    wildcard_cols: shared columns where a left NULL means UNBOUND.  With
    any present, the anti-join uses full SPARQL compatibility — per
    shared var: unbound-on-either-side OR equal — plus the >=1-var
    overlap requirement evaluated PER ROW (an all-unbound row has a
    disjoint domain and is kept)."""
    shared = _shared_vars(left, right)
    if not shared:
        return left  # no shared vars -> nothing is removed
    wc = set(wildcard_cols or ()) & set(shared)
    r = right.select(*shared).distinct()
    if not wc:
        return left.join(r, on=shared, how="left_anti")
    for c in shared:
        r = r.withColumnRenamed(c, f"__minus_{c}")
    compat = reduce(
        lambda a, b: a & b,
        [
            left[c].isNull() | r[f"__minus_{c}"].isNull() | (left[c] == r[f"__minus_{c}"])
            for c in shared
        ],
    )
    overlap = reduce(
        lambda a, b: a | b,
        [left[c].isNotNull() & r[f"__minus_{c}"].isNotNull() for c in shared],
    )
    return left.join(r, on=compat & overlap, how="left_anti")


def intersection(left: DataFrame, right: DataFrame) -> DataFrame:
    """Intersection: left rows whose full binding set appears in right
    (HTEE:900-936; spill set -> Spark native left-semi).  Null-safe per
    column: a row containing an unbound value present in BOTH inputs is
    in the intersection (plain equality would drop it)."""
    cond = reduce(
        lambda a, b: a & b, [left[c].eqNullSafe(right[c]) for c in left.columns]
    )
    return left.join(right, on=cond, how="left_semi")


def union_bag(left: DataFrame, right: DataFrame) -> DataFrame:
    """Union: bag semantics, no dedup (HTEE:874-892)."""
    return left.unionByName(right, allowMissingColumns=True)


def values_table(spark, rows: list[tuple], schema: str) -> DataFrame:
    """BindingSetAssignment (VALUES): inline table (HTEE:1106-1145);
    merging with incoming bindings is values_join."""
    return spark.createDataFrame(rows, schema)


def values_join(left: DataFrame, vals: DataFrame) -> DataFrame:
    """Merge a VALUES table into a solution set with SPARQL compatibility
    semantics (HTEE:1106-1145 -> BindingSetAssignment): two solutions are
    compatible when every SHARED variable bound in BOTH agrees — an UNDEF
    cell (NULL on the VALUES side) or an unbound left column constrains
    nothing, and the merged row takes whichever side is bound.  A plain
    null-unsafe equi-join would silently drop UNDEF rows instead."""
    shared = [c for c in vals.columns if c in set(left.columns)]
    if not shared:
        return left.crossJoin(vals)
    renamed = vals
    for c in shared:
        renamed = renamed.withColumnRenamed(c, f"__values_{c}")
    cond = reduce(
        lambda a, b: a & b,
        [
            renamed[f"__values_{c}"].isNull()
            | left[c].isNull()
            | (renamed[f"__values_{c}"] == left[c])
            for c in shared
        ],
    )
    out = left.join(renamed, on=cond, how="inner")
    for c in shared:
        out = out.withColumn(c, F.coalesce(left[c], renamed[f"__values_{c}"]))
    return out.drop(*[f"__values_{c}" for c in shared])


def distinct(df: DataFrame) -> DataFrame:
    """DISTINCT: global dedup (HTEE:526-551 BigHashSet spill set ->
    Spark's spilling dropDuplicates)."""
    return df.dropDuplicates()


def reduced(df: DataFrame) -> DataFrame:
    """REDUCED permits any amount of dedup (HTEE:503-518 removes only
    adjacent dups); full dedup is a conforming implementation."""
    return df.dropDuplicates()


def order_limit(df: DataFrame, *order: Column, limit: int | None = None) -> DataFrame:
    """Order (+ fused LIMIT -> top-K).  Halyard fuses a downstream LIMIT
    into its spill sorter (Sorter.java:63-82, getLimit HTEE:1150-1172);
    Spark's TakeOrderedAndProject is the same optimization for free."""
    out = df.orderBy(*order)
    if limit is not None:
        out = out.limit(limit)
    return out


def slice_rows(df: DataFrame, offset: int = 0, limit: int | None = None) -> DataFrame:
    """Slice (LIMIT/OFFSET) (HTEE:601-622)."""
    out = df.offset(offset) if offset else df
    if limit is not None:
        out = out.limit(limit)
    return out


def group_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """Group: SPARQL 1.1 aggregate set — COUNT/SUM/MIN/MAX/AVG/
    GROUP_CONCAT/SAMPLE each with DISTINCT (HTEE:487-495 delegates to the
    RDF4J pull GroupIterator; all are Spark built-ins).  For deterministic
    SAMPLE use F.min; for GROUP_CONCAT use
    array_join(array_sort(collect_set/list(...)), sep)."""
    if not keys:
        return df.agg(*aggs)
    return df.groupBy(*keys).agg(*aggs)


def multi_projection(
    df: DataFrame, templates: list[dict[str, Column]], drop_incomplete: bool = False
) -> DataFrame:
    """MultiProjection (CONSTRUCT templates): one input row -> N projected
    rows (HTEE:293-319), with duplicate suppression.

    drop_incomplete: CONSTRUCT semantics (§16.2) — a projected row with
    any NULL component (unbound template variable) or an ill-formed
    triple (literal subject, non-IRI predicate) is omitted."""
    cols = list(templates[0].keys())
    structs = [F.struct(*[t[c].alias(c) for c in cols]) for t in templates]
    exploded = df.select(F.explode(F.array(*structs)).alias("_t"))
    out = exploded.select(*[F.col(f"_t.{c}").alias(c) for c in cols])
    if drop_incomplete:
        for c in cols:
            out = out.where(F.col(c).isNotNull())
        if {"subj", "pred"} <= set(cols):
            out = out.where(
                ~F.col("subj").startswith('"') & F.col("pred").startswith("<")
            )
    return out.dropDuplicates()


def exists_filter(
    df: DataFrame, sub: DataFrame, negate: bool = False, wildcard_cols: set | None = None
) -> DataFrame:
    """(NOT) EXISTS per row -> (anti-)semi join on shared vars
    (HTEE value-expr Exists :992-996).

    wildcard_cols: shared columns where a NULL on the df side means
    UNBOUND — substituting an unbound variable leaves the pattern's
    variable free, so it matches any sub binding (null-wildcard
    condition) instead of equi-matching nothing."""
    shared = _shared_vars(df, sub)
    how = "left_anti" if negate else "left_semi"
    wc = set(wildcard_cols or ()) & set(shared)
    r = sub.select(*shared).distinct()
    if not wc:
        return df.join(r, on=shared, how=how)
    for c in shared:
        r = r.withColumnRenamed(c, f"__ex_{c}")
    cond = reduce(
        lambda a, b: a & b,
        [
            (df[c].isNull() | (df[c] == r[f"__ex_{c}"])) if c in wc
            else df[c].eqNullSafe(r[f"__ex_{c}"])
            for c in shared
        ],
    )
    return df.join(r, on=cond, how=how)
