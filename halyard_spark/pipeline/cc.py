"""Stage 3 — connected-components canonicalization.

Halyard has no CC operator (its closest relative is the iterative
ArbitraryLengthPath evaluation, strategy/.../HalyardTupleExprEvaluation.java:1073-1098);
the north rule requires entity canonicalization via iterative hash-join
label propagation on a DataFrame edge list.

We implement the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
— O(log^2 n) rounds, each round a pair of shuffle joins, no driver-side
graph state.  Node ids are strings; the component id is the
lexicographic minimum member, so the labeling is deterministic and
independent of partitioning / cluster size (required for the N vs 4N
scaling-equivalence criterion).

Each round ends with ``localCheckpoint`` to truncate the lineage — an
unbounded iterative plan otherwise blows up Catalyst analysis time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirect(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _with_min(df: DataFrame) -> DataFrame:
    """Attach m = min(dst in src's group, src itself) as ONE window pass.

    The groupBy+self-join formulation this replaces cost two shuffled
    sides plus their sorts per star op; a min() window over
    partitionBy(src) is the identical value with a single exchange
    (guide §2.4 — share/remove exchanges before anything else).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("src")
    return df.withColumn("m", F.least(F.min("dst").over(w), F.col("src")))


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect strictly-larger neighbors of each node to its min neighbor.

    No trailing distinct: the round's small-star output is deduped, and an
    extra shuffle per round costs more than carrying a few duplicate rows
    into the next round (each round is latency-bound, not volume-bound).
    """
    return (
        _with_min(_undirect(edges))
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect smaller-or-equal neighbors of each node to its min neighbor.

    The second union arm emits (src, m) per ROW rather than per group —
    the same value set (m is functionally dependent on src), and the
    trailing distinct collapses it identically, without the extra
    exchange a per-group dedup of that arm would cost.
    """
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    withm = _with_min(oriented)
    out = withm.select(F.col("dst").alias("src"), F.col("m").alias("dst")).union(
        withm.select(F.col("src"), F.col("m").alias("dst"))
    )
    return out.distinct()


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """edges(src: string, dst: string) -> (node, component).

    component = lexicographic min of the node's component.  Includes every
    node that appears in any edge; callers union in isolated nodes.
    """
    cur = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    cur = cur.localCheckpoint(eager=True)
    prev_sig: tuple | None = None
    for _ in range(max_iter):
        # lazy checkpoint + signature agg = ONE job per round (the agg
        # action materializes the checkpoint); an eager checkpoint plus a
        # separate agg would double the per-round scheduling latency
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        sig_row = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged edge set is a forest of stars (node -> component root)
    members = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    return members.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def canonical_map(entity_edges: DataFrame, all_entities: DataFrame) -> DataFrame:
    """(entity, canonical) for every entity; singletons map to themselves.

    Deterministic min-ID labeling (SURVEY.md §7.3 risk 3): output is stable
    across cluster sizes because min() is order-independent.
    """
    cc = connected_components(entity_edges)
    return (
        all_entities.select(F.col("entity"))
        .distinct()
        .join(cc, F.col("entity") == F.col("node"), "left")
        .select(
            "entity",
            F.coalesce(F.col("component"), F.col("entity")).alias("canonical"),
        )
    )
