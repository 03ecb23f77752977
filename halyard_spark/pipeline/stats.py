"""Stage 6 — VOID-style dataset statistics + log2 summary.

Mirrors HalyardStats (tools/.../HalyardStats.java:96-441): per-graph
triple count, distinctSubjects / properties / distinctObjects, plus
per-subject/property/object partition counts above a threshold (default
1000, HalyardStats.java:119).  The reference exploits the 6 sorted
indexes to count distincts by key-change detection in one MR pass; on
Spark a groupBy with (approx_)count_distinct is both simpler and
map-side-combined, so the sort-order trick is unnecessary.

Also HalyardSummary (tools/.../HalyardSummary.java:88-266): decimated
predicate summary with log2 cardinality bucketing (toCardinality,
HalyardSummary.java:103-105).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARTITION_THRESHOLD = 1000  # HalyardStats.java:119
SUMMARY_DECIMATION = 100  # HalyardSummary.java:101


def void_stats(triples: DataFrame, exact: bool = True) -> DataFrame:
    """Per-graph VOID statistics (graph = ctx, NULL -> default graph)."""
    dc = F.countDistinct if exact else F.approx_count_distinct
    return (
        triples.withColumn("graph", F.coalesce(F.col("ctx"), F.lit("<default>")))
        .groupBy("graph")
        .agg(
            F.count(F.lit(1)).alias("triples"),
            dc("subj").alias("distinct_subjects"),
            dc("pred").alias("properties"),
            dc("obj").alias("distinct_objects"),
        )
    )


def void_partitions(triples: DataFrame, threshold: int = PARTITION_THRESHOLD) -> DataFrame:
    """Per-term partitions >= threshold (HalyardStats.java subset stats)."""
    parts = []
    for role in ("subj", "pred", "obj"):
        parts.append(
            triples.groupBy(F.col(role).alias("term"))
            .agg(F.count(F.lit(1)).alias("triples"))
            .where(F.col("triples") >= threshold)
            .withColumn("role", F.lit(role))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("role", "term", "triples")


def predicate_summary(triples: DataFrame, decimation: int = SUMMARY_DECIMATION) -> DataFrame:
    """Decimated per-predicate summary with log2 cardinality bucket.

    Decimation uses a deterministic hash filter (not sample(), whose output
    depends on partitioning) so results are stable across cluster sizes.
    """
    dec = triples.where(F.pmod(F.xxhash64("subj", "pred", "obj"), F.lit(decimation)) == 0)
    return (
        dec.groupBy("pred")
        .agg(F.count(F.lit(1)).alias("sampled"))
        .select(
            "pred",
            (F.col("sampled") * decimation).alias("est_triples"),
            F.floor(F.log2(F.col("sampled") * decimation)).cast("long").alias("log2_bucket"),
        )
    )
