"""Bulk update/delete, export sinks, JSON->RDF mapping."""

from __future__ import annotations

import glob
import gzip

from pyspark.sql import functions as F

from halyard_spark.pipeline.update import bulk_delete, bulk_update
from halyard_spark.sources import export, rio

TRIPLES = [
    ("<urn:a>", "<urn:p:t>", '"1"', "<urn:g:x>"),
    ("<urn:a>", "<urn:p:u>", '"2"', None),
    ("<urn:b>", "<urn:p:t>", '"3"', "<urn:g:x>"),
    ("<urn:c>", "<urn:p:t>", '"4"', "<urn:g:y>"),
]
SCHEMA = "subj string, pred string, obj string, ctx string"


def test_bulk_delete_pattern(spark):
    t = spark.createDataFrame(TRIPLES, SCHEMA)
    left = bulk_delete(t, p="<urn:p:t>", c="<urn:g:x>")
    rows = {(r.subj, r.pred) for r in left.collect()}
    assert rows == {("<urn:a>", "<urn:p:u>"), ("<urn:c>", "<urn:p:t>")}


def test_bulk_update_stage_isolation(spark):
    """Stage 2 must see stage 1's effects; within a stage, inserts must not
    be visible to that stage's own deletes (pre-stage snapshot)."""
    t = spark.createDataFrame(TRIPLES, SCHEMA)

    def stage1(snap):
        # delete everything in graph x, insert one marker (also in graph x)
        deletes = snap.where(F.col("ctx") == "<urn:g:x>")
        inserts = spark.createDataFrame(
            [("<urn:m>", "<urn:p:mark>", '"s1"', "<urn:g:x>")], SCHEMA
        )
        return deletes, inserts

    def stage2(snap):
        # sees the marker from stage 1 -> rewrites it
        found = snap.where(F.col("pred") == "<urn:p:mark>")
        inserts = found.select(
            F.col("subj"), F.col("pred"), F.lit('"s2"').alias("obj"), F.col("ctx")
        )
        return found, inserts

    out = bulk_update(t, [stage1, stage2])
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("<urn:m>", "<urn:p:mark>", '"s2"') in rows
    assert ("<urn:m>", "<urn:p:mark>", '"s1"') not in rows
    assert ("<urn:a>", "<urn:p:t>", '"1"') not in rows  # deleted in stage 1
    assert ("<urn:a>", "<urn:p:u>", '"2"') in rows  # default graph untouched


def test_bulk_update_null_ctx_delete(spark):
    t = spark.createDataFrame(TRIPLES, SCHEMA)
    deletes = spark.createDataFrame([("<urn:a>", "<urn:p:u>", '"2"', None)], SCHEMA)
    out = bulk_update(t, [lambda snap: (deletes, None)])
    assert out.count() == 3  # the NULL-ctx row matched null-safely


def test_export_ntriples_roundtrip(spark, tmp_path):
    t = spark.createDataFrame(TRIPLES, SCHEMA)
    path = str(tmp_path / "nt")
    export.export_ntriples(t, path, compression="gzip")
    lines = []
    for f in glob.glob(f"{path}/*.txt.gz"):
        with gzip.open(f, "rt") as fh:
            lines += [ln.strip() for ln in fh if ln.strip()]
    assert len(lines) == 4
    assert '<urn:a> <urn:p:t> "1" <urn:g:x> .' in lines
    assert '<urn:a> <urn:p:u> "2" .' in lines  # default graph: triple form


def test_export_dir_reads_back_with_read_rdf(spark, tmp_path):
    """read_rdf over a directory the engine's own export sink wrote:
    Spark's part-*.txt data files are this engine's N-Triples output and
    must round-trip, while _SUCCESS / .crc sink bookkeeping is skipped
    silently (the hiddenFileFilter every Hadoop input format applies) —
    regression for the unknown-extension skip (ADVICE round 4) being
    over-broad.  Terms cover the hard cases: bnode graph label, \\uXXXX
    escape (decoded on read, so both sides hold the SAME term), escaped
    quote/newline/tab in literals."""
    src = tmp_path / "in.nq"
    src.write_text(
        '<urn:s> <urn:p> "line1\\nline2" _:g1 .\n'
        '<urn:s\\u0041> <urn:p> <urn:o> .\n'
        '<urn:s> <urn:p> "quote\\"inside" <urn:g> .\n'
        '<urn:s> <urn:p> "tab\\there" .\n'
    )
    df = rio.read_rdf(spark, str(src))
    out = str(tmp_path / "export")
    export.export_ntriples(df, out)
    back = rio.read_rdf(spark, out)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, back.collect()))
    assert back.count() == 4


def test_export_csv_and_null(spark, tmp_path):
    t = spark.createDataFrame([(1, 'has,"comma"'), (2, "line\nbreak")], "id int, s string")
    path = str(tmp_path / "csv")
    export.export_csv(t, path)
    back = spark.read.option("header", True).option("escape", '"').option("multiLine", True).csv(path)
    assert {r.s for r in back.collect()} == {'has,"comma"', "line\nbreak"}
    assert export.export_null(t) == 2


def test_json_to_triples(spark):
    df = spark.createDataFrame(
        [("n1", '{"name": "x", "meta": {"size": 3}, "tags": ["a", "b"]}')],
        "node string, raw string",
    )
    schema = "name string, meta struct<size: long>, tags array<string>"
    parsed = df.select("node", F.from_json("raw", schema).alias("j"))
    triples = rio.json_to_triples(parsed, "node", "j")
    rows = {(r.subj, r.pred, r.obj) for r in triples.collect()}
    assert ("<n1>", "<urn:json:name>", '"x"') in rows
    assert ("<n1>", "<urn:json:meta.size>", '"3"^^<http://www.w3.org/2001/XMLSchema#integer>') in rows
    assert ("<n1>", "<urn:json:tags:0>", '"a"') in rows
    assert ("<n1>", "<urn:json:tags:1>", '"b"') in rows

def test_json_to_triples_deep_recursion(spark):
    """Arrays of structs recurse to ARBITRARY depth (JSONParser.java:64-116
    recurses; golden shape rio/src/test/resources/.../nestedArrays.json):
    each element becomes a child node `parent.path:idx` with an edge and
    an :index marker, fields recursed under the dotted path."""
    raw = '{"a": ["b", "c", "d"], "e": [{"f": "g"}, {"h": "i"}], ' \
          '"deep": [{"inner": [{"leaf": 7}]}]}'
    schema = (
        "a array<string>, e array<struct<f: string, h: string>>, "
        "deep array<struct<inner: array<struct<leaf: long>>>>"
    )
    df = spark.createDataFrame([("n1", raw)], "node string, raw string")
    parsed = df.select("node", F.from_json("raw", schema).alias("j"))
    rows = {(r.subj, r.pred, r.obj) for r in rio.json_to_triples(parsed, "node", "j").collect()}
    X = "<http://www.w3.org/2001/XMLSchema#integer>"
    # level-1 scalar array (unchanged shape)
    assert ("<n1>", "<urn:json:a:0>", '"b"') in rows
    # level-1 array-of-structs: edge + index + field under dotted path
    assert ("<n1>", "<urn:json:e>", "<n1.e:0>") in rows
    assert ("<n1.e:0>", "<urn:json:e:index>", f'"0"^^{X}') in rows
    assert ("<n1.e:0>", "<urn:json:e.f>", '"g"') in rows
    assert ("<n1.e:1>", "<urn:json:e.h>", '"i"') in rows
    # level-3: array-of-structs inside array-of-structs
    assert ("<n1>", "<urn:json:deep>", "<n1.deep:0>") in rows
    assert ("<n1.deep:0>", "<urn:json:deep.inner>", "<n1.deep:0.deep.inner:0>") in rows
    assert ("<n1.deep:0.deep.inner:0>", "<urn:json:deep.inner.leaf>", f'"7"^^{X}') in rows


def test_export_dbapi_sqlite(spark, tmp_path):
    """Relational export through the injectable DB-API path (the JDBC
    sink's testable core): executor-side batched executemany into
    sqlite, then read back."""
    import sqlite3

    from halyard_spark.sources.export import export_dbapi

    db = str(tmp_path / "out.db")
    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(25)], "id long, name string"
    ).coalesce(1)  # one partition: sqlite's writer lock is per-file

    def connect():
        return sqlite3.connect(db, timeout=30)

    export_dbapi(df, connect, "people", batchsize=10)
    con = sqlite3.connect(db)
    rows = con.execute("SELECT id, name FROM people ORDER BY CAST(id AS INT)").fetchall()
    con.close()
    assert len(rows) == 25 and rows[0][1] == "name0" and rows[-1][1] == "name24"


def test_timestamped_update_mvcc(spark):
    """Reference cell-timestamp semantics (HalyardTableUtils.java:271-276,
    TimeAwareHBaseSail.java:81-106): max effective version wins; insert
    beats delete at the SAME timestamp; out-of-order op arrival resolves
    identically."""
    from halyard_spark.pipeline.update import timestamped_update

    base = spark.createDataFrame(
        [("<s1>", "<p>", '"kept"', None), ("<s2>", "<p>", '"doomed"', None)],
        "subj string, pred string, obj string, ctx string",
    )
    ops = spark.createDataFrame(
        [
            # delete arrives FIRST in the log but with the LATER ts -> wins
            ("<s2>", "<p>", '"doomed"', None, 20, "delete"),
            ("<s2>", "<p>", '"doomed"', None, 10, "insert"),
            # equal-ts pair: insert beats delete (the <<1|1 tie-break)
            ("<s3>", "<p>", '"tied"', None, 30, "delete"),
            ("<s3>", "<p>", '"tied"', None, 30, "insert"),
            # delete then a LATER re-insert -> present
            ("<s4>", "<p>", '"reborn"', None, 5, "delete"),
            ("<s4>", "<p>", '"reborn"', None, 6, "insert"),
            # stale delete below base_ts cannot remove a base row
            ("<s1>", "<p>", '"kept"', None, -1, "delete"),
        ],
        "subj string, pred string, obj string, ctx string, ts long, op string",
    )
    out = timestamped_update(base, ops, base_ts=0)
    got = {(r["subj"], r["obj"]) for r in out.collect()}
    assert got == {
        ("<s1>", '"kept"'),
        ("<s3>", '"tied"'),
        ("<s4>", '"reborn"'),
    }
    # op order in the log is irrelevant: shuffled input, same result
    out2 = timestamped_update(base, ops.orderBy(F.rand(seed=7)), base_ts=0)
    assert {(r["subj"], r["obj"]) for r in out2.collect()} == got


def test_timestamped_update_single_shuffle_plan(spark):
    """Scale gate: resolution is ONE hash aggregation on the quad key —
    no window/sort in the plan."""
    from halyard_spark.pipeline.update import timestamped_update

    base = spark.createDataFrame(
        [("<s>", "<p>", '"o"', None)], "subj string, pred string, obj string, ctx string"
    )
    ops = spark.createDataFrame(
        [("<s>", "<p>", '"o"', None, 1, "delete")],
        "subj string, pred string, obj string, ctx string, ts long, op string",
    )
    plan = timestamped_update(base, ops)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan
    assert plan.count("Exchange") <= 1  # one shuffle: the groupBy


def test_export_ntriples_null_term_fails_closed(spark, tmp_path):
    """A null required term must fail the export, not silently emit a
    short/shifted line (code-review regression)."""
    import pytest

    from halyard_spark.sources import export

    bad = spark.createDataFrame(
        [("<s>", None, '"o"', None)], "subj string, pred string, obj string, ctx string"
    )
    with pytest.raises(Exception, match="null subj/pred/obj"):
        export.export_ntriples(bad, str(tmp_path / "out"))


def test_export_dbapi_paramstyle_format(spark, tmp_path):
    """paramstyle='format' emits %s placeholders (psycopg2/MySQLdb);
    unsupported styles raise."""
    import pytest

    from halyard_spark.sources.export import export_dbapi

    cap = str(tmp_path / "sql.txt")

    def connect():
        class Cur:
            def execute(self, sql):
                pass

            def executemany(self, sql, rows):
                with open(cap, "a") as f:
                    f.write(sql + "\n")

        class Conn:
            def cursor(self):
                return Cur()

            def commit(self):
                pass

            def close(self):
                pass

        return Conn()

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(1)
    export_dbapi(df, connect, "t", paramstyle="format")
    assert "VALUES (%s, %s)" in open(cap).read()
    with pytest.raises(ValueError, match="paramstyle"):
        export_dbapi(df, connect, "t", paramstyle="numeric")
