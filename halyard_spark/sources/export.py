"""Export sinks — the HalyardExport analog (SURVEY.md §2.1 sinks).

Reference (tools/.../HalyardExport.java): SELECT -> CSV with custom
escaping (:162-256), CONSTRUCT -> RDF writers +gz/bz2 (:258-299),
SELECT -> batched JDBC INSERT (:301-423), null dry-run sink (:425-458).
Every one maps to a built-in DataFrame writer; the only custom piece is
N-Triples line formatting (JVM-side concat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_csv(df: DataFrame, path: str, compression: str | None = None) -> None:
    """CSV with full quoting/escaping (the reference hand-rolls \\uXXXX
    escaping; Spark's writer emits RFC-4180 quoted fields)."""
    w = df.write.mode("overwrite").option("header", "true").option("escape", '"')
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def export_ntriples(triples: DataFrame, path: str, compression: str | None = None) -> None:
    """(subj, pred, obj[, ctx]) -> N-Triples / N-Quads text lines.

    Terms are already stored in N-Triples lexical form (halyard_spark.nt),
    so a line is a codegen'd concat — no UDF.
    """
    has_ctx = "ctx" in triples.columns
    # fail CLOSED on null required terms: concat_ws silently SKIPS nulls,
    # which would export short/shifted garbage lines (e.g. a null pred
    # turns '<s> <o> <ctx> .' into a syntactically valid wrong triple)
    bad = F.col("subj").isNull() | F.col("pred").isNull() | F.col("obj").isNull()
    guarded = F.when(
        bad,
        F.raise_error(F.lit("export_ntriples: null subj/pred/obj in input row")),
    )
    line = F.coalesce(
        guarded, F.concat_ws(" ", F.col("subj"), F.col("pred"), F.col("obj"))
    )
    if has_ctx:
        line = F.when(
            F.col("ctx").isNotNull(), F.concat_ws(" ", line, F.col("ctx"))
        ).otherwise(line)
    out = triples.select(F.concat(line, F.lit(" .")).alias("value"))
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def export_jdbc(df: DataFrame, url: str, table: str, properties: dict | None = None, batchsize: int = 1000) -> None:
    """Batched JDBC insert (HalyardExport.java:301-423; 1000-row batches).
    Requires the JDBC driver jar on the classpath — passthrough to Spark's
    writer, which does type introspection like the reference."""
    (
        df.write.mode("append")
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**(properties or {}))
        .save()
    )


def export_dbapi(
    df: DataFrame,
    connect,
    table: str,
    batchsize: int = 1000,
    create: bool = True,
    paramstyle: str = "qmark",
) -> None:
    """Batched relational insert through an injectable DB-API connection
    factory — the testable core of the JDBC sink (HalyardExport.java's
    batched INSERT loop, :301-423), same shape as the ES sink's
    injectable transport.  ``connect`` is a zero-arg callable returning a
    DB-API connection; it runs ON THE EXECUTORS, one connection per
    partition, executemany per ``batchsize`` rows.  export_jdbc remains
    the driver-jar passthrough for real JDBC endpoints."""
    cols = df.columns
    # DB-API paramstyle is driver-specific: sqlite3 is 'qmark' (?),
    # psycopg2/MySQLdb are 'pyformat'/'format' (%s)
    marks = {"qmark": "?", "format": "%s", "pyformat": "%s", "numeric": None}
    if paramstyle not in marks or marks[paramstyle] is None:
        raise ValueError(f"export_dbapi: unsupported paramstyle {paramstyle!r}")
    placeholders = ", ".join([marks[paramstyle]] * len(cols))
    insert_sql = f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders})"
    if create:
        ddl = f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(c + ' TEXT' for c in cols)})"
    else:
        ddl = None

    def sink(rows) -> None:
        conn = connect()
        try:
            cur = conn.cursor()
            if ddl:
                cur.execute(ddl)
            batch = []
            for r in rows:
                batch.append(tuple(r))
                if len(batch) >= batchsize:
                    cur.executemany(insert_sql, batch)
                    batch = []
            if batch:
                cur.executemany(insert_sql, batch)
            conn.commit()
        finally:
            conn.close()

    df.foreachPartition(sink)


def export_null(df: DataFrame) -> int:
    """Dry-run sink: drain and count (HalyardExport NullWriter analog)."""
    return df.count()
