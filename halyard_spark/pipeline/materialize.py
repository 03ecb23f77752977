"""Stage 5 — materialize the triple store: canonical table + sorted mirrors.

Halyard writes every statement into 3 (triples) or 6 (quads) sorted HBase
row-key permutations — SPO/POS/OSP + CSPO/CPOS/COSP
(common/.../HalyardTableUtils.java:279-287) — so any statement pattern has
an index whose prefix covers its bound terms.  The Spark-native analog:

- ONE canonical parquet table `triples` (full values in columns — no
  hash-collision defense needed, unlike HBaseSail.java:756-761), plus
- SPO/POS/OSP **sorted mirrors**: ``repartitionByRange(sort_keys)`` +
  ``sortWithinPartitions(sort_keys)`` parquet writes.  Range partitioning
  samples boundaries exactly like HalyardPreSplit samples region splits
  (tools/.../HalyardPreSplit.java:73-132); the per-file parquet min/max
  column statistics then prune scans the way HBase start/stop rows do.
- the context column subsumes the C* permutations (ctx is a leading
  *partition column* on the canonical table = partition pruning per graph).

On Iceberg-enabled clusters these become Iceberg tables with
``write.sort-order``; parquet keeps identical semantics in this sandbox
(import-gated, no Iceberg jar here).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEXES = {
    "spo": ["subj", "pred", "obj"],
    "pos": ["pred", "obj", "subj"],
    "osp": ["obj", "subj", "pred"],
}


def write_store(triples: DataFrame, out_dir: str, mirror_partitions: int | None = None) -> dict:
    """Write canonical table + 3 sorted mirrors; returns a snapshot manifest."""
    spark = triples.sparkSession
    n = mirror_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = time.time()

    canonical = triples.withColumn("g", F.coalesce(F.col("ctx"), F.lit("<default>")))
    canonical.write.mode("overwrite").partitionBy("g").parquet(f"{out_dir}/triples")

    stored = spark.read.parquet(f"{out_dir}/triples")
    for name, keys in INDEXES.items():
        (
            stored.repartitionByRange(n, *[F.col(k) for k in keys])
            .sortWithinPartitions(*keys)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{name}")
        )

    count = stored.count()
    manifest = {
        "snapshot_ts": int(t0),
        "triple_count": count,
        "indexes": list(INDEXES),
        "mirror_partitions": n,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def read_index(spark: SparkSession, store_dir: str, index: str = "spo") -> DataFrame:
    df = spark.read.parquet(f"{store_dir}/{index}")
    if "g" in df.columns and "ctx" not in df.columns:
        df = df.withColumn("ctx", F.when(F.col("g") == "<default>", F.lit(None)).otherwise(F.col("g")))
    return df


def pick_index(s_bound: bool, p_bound: bool, o_bound: bool) -> str:
    """Index selection for a statement pattern — the 16-way dispatch of
    HalyardTableUtils.java:300-373 reduced to 3 sort orders (ctx handled by
    partition pruning on the canonical table)."""
    if s_bound:
        return "spo"
    if p_bound:
        return "pos"
    if o_bound:
        return "osp"
    return "spo"
