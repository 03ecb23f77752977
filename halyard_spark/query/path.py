"""Property-path operators: transitive closure via iterative frontier joins.

Halyard evaluates ``p+`` / ``p*`` with RDF4J's pull PathIteration
re-entering the strategy per step
(strategy/.../HalyardTupleExprEvaluation.java:1073-1098) — a row-at-a-time
nested loop.  Distributed form: BFS frontier expansion with hash joins,
dedup against the seen set, and ``localCheckpoint`` per round to keep the
plan bounded.  Same shape as the connected-components stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    min_length: int = 1,
    max_iter: int = 64,
) -> DataFrame:
    """edges(src, dst) -> all (src, dst) pairs connected by a directed
    path of length >= min_length (min_length=0 adds the identity pairs,
    i.e. ZeroLengthPath semantics, HTEE:1046-1065).
    """
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    closure = edges
    for _ in range(max_iter):
        # path DOUBLING: join the closure with itself, so reachable path
        # length doubles per round — log2(diameter) rounds instead of the
        # reference's row-at-a-time PathIteration (or a 1-hop BFS that
        # needs diameter rounds: a 50-node chain = 49 sequential shuffles)
        stepped = (
            closure.withColumnRenamed("dst", "mid")
            .join(closure.withColumnRenamed("src", "mid"), "mid")
            .select("src", "dst")
            .distinct()
        )
        new = stepped.join(closure, ["src", "dst"], "left_anti").localCheckpoint(eager=False)
        if new.count() == 0:  # the count action materializes the checkpoint
            break
        closure = closure.union(new).localCheckpoint(eager=True)
    if min_length == 0:
        nodes = edges.select(F.col("src").alias("n")).union(edges.select(F.col("dst").alias("n"))).distinct()
        identity = nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        closure = closure.union(identity).distinct()
    return closure


def zero_or_one_path(edges: DataFrame) -> DataFrame:
    """``p?`` — identity union one hop (HTEE ZeroLengthPath :1046-1065)."""
    nodes = edges.select(F.col("src").alias("n")).union(edges.select(F.col("dst").alias("n"))).distinct()
    identity = nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
    return identity.union(edges.select("src", "dst")).distinct()
