"""SPARQL value-expression semantics on Spark columns.

Error model (strategy/.../HalyardValueExprEvaluation.java:104-111):
a SPARQL "type error" makes FILTER treat the row as false and BIND leave
the variable unbound.  Spark's ANSI mode throws instead — so every
potentially-failing expression is wrapped in a ``try_*`` form that yields
NULL, and NULL then behaves exactly like the reference's error value
under 3-valued logic (And/Or recoverability, HalyardValueExprEvaluation
.java:688-742, matches Spark's native 3VL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from halyard_spark import nt


def try_numeric(col: str | Column) -> Column:
    """Lexical term -> double, NULL on non-numeric (error->unbound)."""
    return nt.nt_str(col).try_cast("double")


def ebv(col: str | Column) -> Column:
    """Effective boolean value (HalyardValueExprEvaluation.java:104-111):
    booleans as-is; numbers: != 0; strings: non-empty; error -> NULL."""
    c = nt.nt_str(col)
    num = c.try_cast("double")
    return (
        F.when(F.lower(c).isin("true", "false"), F.lower(c) == "true")
        .when(num.isNotNull(), num != 0.0)
        .otherwise(F.length(c) > 0)
    )


def filter_cond(cond: Column) -> Column:
    """FILTER: error (NULL) => false (HalyardTupleExprEvaluation.java:346-360)."""
    return F.coalesce(cond, F.lit(False))


def bind_safe(expr: Column) -> Column:
    """BIND: evaluation error => unbound — the NULL already is unbound
    (HalyardTupleExprEvaluation.java:579-585); provided for intent."""
    return expr


def sparql_compare(a: str | Column, b: str | Column) -> Column:
    """SPARQL value comparison key: numeric promotion when both terms are
    numeric, else string comparison on the lexical form
    (HalyardValueExprEvaluation.java:815-819 -> QueryEvaluationUtil)."""
    na, nb = try_numeric(a), try_numeric(b)
    both_num = na.isNotNull() & nb.isNotNull()
    return F.when(both_num, F.when(na < nb, -1).when(na > nb, 1).otherwise(0)).otherwise(
        F.when(nt.nt_str(a) < nt.nt_str(b), -1).when(nt.nt_str(a) > nt.nt_str(b), 1).otherwise(0)
    )


def order_key(col: str | Column) -> list[Column]:
    """SPARQL ORDER BY key for mixed terms: type rank (bnode < IRI <
    literal, per ValueComparator), then numeric value when numeric, then
    lexical form."""
    c = F.col(col) if isinstance(col, str) else col
    rank = (
        F.when(nt.nt_is_bnode(c), 0).when(nt.nt_is_iri(c), 1).otherwise(2)
    )
    # numeric literals order by value BEFORE plain strings (nulls_last:
    # a non-numeric literal has NULL numeric key and must not sort first)
    return [rank, F.asc_nulls_last(try_numeric(c)), nt.nt_str(c)]
