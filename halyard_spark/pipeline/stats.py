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
    """Per-graph VOID statistics (graph = ctx, NULL -> default graph).

    Deliberately NOT one agg with three countDistinct: Catalyst plans that
    as an EXPAND x4 (every quad replicated four times through the
    shuffle).  Three narrow distinct-then-count jobs shuffle deduped
    2-column pairs instead (partial map-side dedup), then join on the tiny
    per-graph dimension — measured ~3x less shuffled bytes at 23M quads."""
    g = F.coalesce(F.col("ctx"), F.lit("<default>")).alias("graph")
    base = triples.select(g, "subj", "pred", "obj")
    out = base.groupBy("graph").agg(F.count(F.lit(1)).alias("triples"))
    for role, name in (
        ("subj", "distinct_subjects"),
        ("pred", "properties"),
        ("obj", "distinct_objects"),
    ):
        if exact:
            d = base.select("graph", role).distinct().groupBy("graph").agg(
                F.count(F.lit(1)).alias(name)
            )
        else:
            d = base.groupBy("graph").agg(F.approx_count_distinct(role).alias(name))
        out = out.join(d, "graph")
    return out


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
