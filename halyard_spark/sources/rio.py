"""Generic JSON -> RDF triple mapping — the rio JSONParser analog
(rio/src/main/java/com/msd/gin/halyard/rio/JSONParser.java:64-116).

Reference semantics: every JSON object becomes a node (blank node with a
hash-derived id), each key a ``:key`` predicate, array elements indexed
predicates, leaves literals.  Spark-native: the traversal is SCHEMA-driven
— the struct schema (from spark.read.json / from_json) is walked once on
the driver, generating pure Column expressions; execution stays in the
JVM with posexplode for arrays.  No per-row Python.

Supported shapes: nested structs, arrays of scalars, scalars.  Arrays of
structs are exploded one level (the reference recurses arbitrarily; deep
nesting can be handled by chaining json_to_triples on exploded frames).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from halyard_spark import nt


def _leaf_lit(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.StringType):
        return nt.nt_lit(col)
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
        return nt.nt_lit(col.cast("string"), dtype=nt.XSD + "integer")
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return nt.nt_lit(col.cast("string"), dtype=nt.XSD + "double")
    if isinstance(dtype, T.BooleanType):
        return nt.nt_lit(col.cast("string"), dtype=nt.XSD + "boolean")
    return nt.nt_lit(col.cast("string"))


def json_to_triples(df: DataFrame, node_col: str, struct_col: str, ns: str = "urn:json:") -> DataFrame:
    """df[node_col] = subject id string; df[struct_col] = parsed struct.

    Returns (subj, pred, obj, ctx=NULL) rows for every leaf.
    """
    schema = df.schema[struct_col].dataType
    assert isinstance(schema, T.StructType), "struct_col must be a struct"
    subj = nt.nt_iri(F.col(node_col).cast("string"))
    parts: list[DataFrame] = []

    def walk(prefix: str, col: Column, dtype: T.DataType) -> None:
        pred = f"<{ns}{prefix}>"
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f"{prefix}.{f.name}" if prefix else f.name, col[f.name], f.dataType)
        elif isinstance(dtype, T.ArrayType) and not isinstance(dtype.elementType, (T.ArrayType, T.StructType)):
            exploded = df.select(subj.alias("subj"), F.posexplode_outer(col).alias("idx", "v"))
            parts.append(
                exploded.select(
                    "subj",
                    F.concat(F.lit(f"<{ns}{prefix}:"), F.col("idx").cast("string"), F.lit(">")).alias("pred"),
                    _leaf_lit(F.col("v"), dtype.elementType).alias("obj"),
                    F.lit(None).cast("string").alias("ctx"),
                ).where(F.col("obj").isNotNull())
            )
        elif isinstance(dtype, T.MapType):
            exploded = df.select(subj.alias("subj"), F.explode_outer(col).alias("k", "v"))
            parts.append(
                exploded.select(
                    "subj",
                    F.concat(F.lit(f"<{ns}{prefix}:"), F.col("k"), F.lit(">")).alias("pred"),
                    _leaf_lit(F.col("v"), dtype.valueType).alias("obj"),
                    F.lit(None).cast("string").alias("ctx"),
                ).where(F.col("k").isNotNull())
            )
        else:
            parts.append(
                df.select(
                    subj.alias("subj"),
                    F.lit(pred).alias("pred"),
                    _leaf_lit(col, dtype).alias("obj"),
                    F.lit(None).cast("string").alias("ctx"),
                ).where(col.isNotNull())
            )

    walk("", F.col(struct_col), schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
