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

from halyard_spark import nt

PARTITION_THRESHOLD = 1000  # HalyardStats.java:119
SUMMARY_DECIMATION = 100  # HalyardSummary.java:101

VOID = "http://rdfs.org/ns/void#"
RDF_TYPE = f"<{nt.RDF}type>"
STATS_GRAPH = nt.iri(nt.NS + "statsContext")  # HalyardStats.java statsContext
DEFAULT_GRAPH_IRI = nt.iri(nt.NS + "default")


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


def stats_rdf(triples: DataFrame) -> DataFrame:
    """VOID statistics emitted AS RDF quads into the stats named graph —
    the output side of HalyardStats (tools/.../HalyardStats.java:96-441
    writes void:triples / void:distinctSubjects / void:properties /
    void:distinctObjects into halyard:statsContext).  The result has the
    store's own (subj, pred, obj, ctx) shape, so it can be unioned into
    the store and queried like any other graph.

    ``vs`` is materialized before the four per-property projections:
    each union arm otherwise re-runs the whole void_stats join tree
    (4x the three distinct-aggregations).  Scale-safe unconditionally —
    the frame is one row per NAMED GRAPH, never data-sized."""
    vs = void_stats(triples).localCheckpoint(eager=False)
    graph_iri = F.when(F.col("graph") == "<default>", F.lit(DEFAULT_GRAPH_IRI)).otherwise(
        F.col("graph")
    )
    parts = []
    for col, prop in (
        ("triples", "triples"),
        ("distinct_subjects", "distinctSubjects"),
        ("properties", "properties"),
        ("distinct_objects", "distinctObjects"),
    ):
        parts.append(
            vs.select(
                graph_iri.alias("subj"),
                F.lit(f"<{VOID}{prop}>").alias("pred"),
                nt.nt_lit(F.col(col).cast("string"), dtype=nt.XSD + "integer").alias("obj"),
                F.lit(STATS_GRAPH).alias("ctx"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def summary(triples: DataFrame, decimation: int = 1) -> DataFrame:
    """Class / predicate / domain / range / domain+range summaries with
    log2 cardinality bucketing (HalyardSummary.java:163-174,210; bucketing
    toCardinality :103-105).  Subject/object classes come from rdf:type
    triples in the (decimated) sample, exactly like the reference's
    single SPO pass.

    Output: (stat_kind, pred, domain, range, est_count, log2_bucket) where
    unused dimensions are NULL.  decimation=1 = exact (no sampling);
    larger values use the deterministic hash filter of predicate_summary.
    """
    t = triples.select("subj", "pred", "obj")
    # decimate ONLY the data side: the domain/range joins pair a data
    # triple with its node's rdf:type triple, and sampling BOTH sides
    # would make join survival ~1/decimation^2 while est_count scales by
    # decimation once — underestimating by another full factor.  The
    # (much smaller) type set stays exact, so one scale factor is right
    # for every sampled statistic and class counts are exact.
    types = t.where(F.col("pred") == RDF_TYPE).select(
        F.col("subj").alias("node"), F.col("obj").alias("cls")
    )
    data = t.where(F.col("pred") != RDF_TYPE)
    if decimation > 1:
        data = data.where(
            F.pmod(F.xxhash64("subj", "pred", "obj"), F.lit(decimation)) == 0
        )

    def bucketed(grouped: DataFrame, kind: str, pred, domain, rng, scale: int = decimation) -> DataFrame:
        n = F.col("n") * scale
        return grouped.select(
            F.lit(kind).alias("stat_kind"),
            pred.alias("pred"),
            domain.alias("domain"),
            rng.alias("range"),
            n.alias("est_count"),
            F.floor(F.log2(n)).cast("long").alias("log2_bucket"),
        )

    null_s = F.lit(None).cast("string")
    classes = bucketed(
        types.groupBy("cls").agg(F.count(F.lit(1)).alias("n")),
        "class", null_s, F.col("cls"), null_s, scale=1,  # types are exact
    )
    preds = bucketed(
        data.groupBy("pred").agg(F.count(F.lit(1)).alias("n")),
        "predicate", F.col("pred"), null_s, null_s,
    )
    with_dom = data.join(types.withColumnRenamed("node", "subj"), "subj").select(
        "pred", F.col("cls").alias("dom_cls"), "obj"
    )
    domains = bucketed(
        with_dom.groupBy("pred", "dom_cls").agg(F.count(F.lit(1)).alias("n")),
        "domain", F.col("pred"), F.col("dom_cls"), null_s,
    )
    with_rng = data.join(types.withColumnRenamed("node", "obj"), "obj").select(
        "pred", F.col("cls").alias("rng_cls"), "subj"
    )
    ranges = bucketed(
        with_rng.groupBy("pred", "rng_cls").agg(F.count(F.lit(1)).alias("n")),
        "range", F.col("pred"), null_s, F.col("rng_cls"),
    )
    with_both = (
        data.join(types.withColumnRenamed("node", "subj"), "subj")
        .withColumnRenamed("cls", "dom_cls")
        .join(types.withColumnRenamed("node", "obj"), "obj")
        .withColumnRenamed("cls", "rng_cls")
    )
    both = bucketed(
        with_both.groupBy("pred", "dom_cls", "rng_cls").agg(F.count(F.lit(1)).alias("n")),
        "domain_range", F.col("pred"), F.col("dom_cls"), F.col("rng_cls"),
    )
    out = classes
    for p in (preds, domains, ranges, both):
        out = out.unionByName(p)
    return out


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
