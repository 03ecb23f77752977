"""Elasticsearch literal-index sink — HalyardElasticIndexer analog.

The reference scans the OSP index, dedups literals per object hash, and
bulk-POSTs ``{_id: hex(hash), l: label}`` documents to an ES index that
the full-text scan later queries by ``_id``
(tools/.../HalyardElasticIndexer.java:94-158, shard calc :222-228;
query side sail/.../HBaseSail.java:612-683).

Spark-native shape:
- the document set is a DataFrame job (distinct literal objects, sha1
  doc ids — the same content-derived id the reference derives from its
  key hash), so it scales like any other scan;
- delivery is ``foreachPartition`` over an injectable ``transport``
  callable that receives ND-JSON ``_bulk`` bodies.  The default transport
  POSTs to an ES ``/_bulk`` URL with stdlib urllib (no ES client package
  in this sandbox); tests inject a file-writing transport.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from halyard_spark import nt


def build_index_docs(triples: DataFrame) -> DataFrame:
    """Distinct literal objects -> (_id, l) index documents.

    _id = sha1 of the full lexical term (content-derived: identical at any
    partitioning, and identical docs collapse before the sink — the
    reference's per-object dedup, HalyardElasticIndexer.java:124-140)."""
    lits = triples.select("obj").where(nt.nt_is_literal("obj")).distinct()
    return lits.select(
        F.sha1(F.col("obj").cast("binary")).alias("_id"),
        nt.nt_str(F.col("obj")).alias("l"),
    )


def http_transport(bulk_url: str) -> Callable[[str], None]:
    """Default transport: POST ND-JSON to an ES /_bulk endpoint."""

    def send(body: str) -> None:
        import json as _json
        import urllib.request

        req = urllib.request.Request(
            bulk_url,
            data=body.encode(),
            headers={"Content-Type": "application/x-ndjson"},
        )
        resp = urllib.request.urlopen(req, timeout=60).read()
        # ES answers HTTP 200 with "errors": true for PER-ITEM failures
        # (mapping conflicts, queue rejections) — fail the task so Spark
        # retries instead of silently dropping documents from the index
        try:
            payload = _json.loads(resp)
        except ValueError:
            return  # non-JSON body: transport succeeded, nothing to check
        if payload.get("errors"):
            failed = [
                item
                for item in payload.get("items", [])
                for op in item.values()
                if op.get("error")
            ][:3]
            raise RuntimeError(f"ES bulk indexing reported item errors: {failed!r}")

    return send


def bulk_index(
    triples: DataFrame,
    transport: Callable[[str], None],
    batch_docs: int = 1000,
) -> None:
    """Index every distinct literal via per-partition bulk bodies.

    Speculative execution must stay off for this stage (side-effecting
    sink) — the same reason the reference disables it
    (HalyardBulkLoad.java:554-555)."""
    docs = build_index_docs(triples)

    def send_partition(rows: Iterator[Row]) -> None:
        buf: list[str] = []
        n = 0
        for r in rows:
            buf.append(json.dumps({"index": {"_id": r["_id"]}}))
            buf.append(json.dumps({"l": r["l"]}))
            n += 1
            if n >= batch_docs:
                transport("\n".join(buf) + "\n")
                buf, n = [], 0
        if buf:
            transport("\n".join(buf) + "\n")

    docs.foreachPartition(send_partition)
