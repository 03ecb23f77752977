"""SPARQL-ish query algebra as thin DataFrame combinators.

Halyard evaluates the RDF4J TupleExpr algebra with a hand-built
push-based async engine (strategy/.../HalyardTupleExprEvaluation.java);
here every algebra node maps to a declarative DataFrame operation and
Catalyst replaces the whole scheduler + optimizer pipeline
(HalyardQueryOptimizerPipeline.java:54-67 — constant folding, filter
pushdown, join reordering, top-K fusion are all built in).
"""

from halyard_spark.query.pattern import statement_pattern  # noqa: F401
from halyard_spark.query.algebra import (  # noqa: F401
    bgp_join,
    distinct,
    group_agg,
    minus,
    multi_projection,
    optional_join,
    order_limit,
    slice_rows,
    union_bag,
    values_table,
)
from halyard_spark.query.path import transitive_closure  # noqa: F401
