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
    nodes: DataFrame | None = None,
) -> DataFrame:
    """edges(src, dst) -> all (src, dst) pairs connected by a directed
    path of length >= min_length (min_length=0 adds the identity pairs,
    i.e. ZeroLengthPath semantics, HTEE:1046-1065).

    ``nodes`` (one column ``n``): the identity-pair domain for
    min_length=0.  W3C ZeroLengthPath matches every term IN THE GRAPH,
    not just nodes adjacent to this path's predicate — pass the store's
    term set for spec semantics; default (None) falls back to the edge
    endpoints.

    Only min_length in {0, 1} is supported here (the SPARQL 1.1 ``p*`` /
    ``p+`` forms); for a bound-source query or min_length >= 2, use
    :func:`reachable_from`, which seeds from the bound side instead of
    materializing the whole-graph closure.
    """
    if min_length not in (0, 1):
        raise ValueError(
            f"transitive_closure supports min_length in {{0, 1}}; got {min_length} "
            "(use reachable_from for longer minimum paths)"
        )
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    closure = edges
    prev_n = closure.count()
    for _ in range(max_iter):
        # path DOUBLING: join the closure with itself, so reachable path
        # length doubles per round — log2(diameter) rounds instead of the
        # reference's row-at-a-time PathIteration (or a 1-hop BFS that
        # needs diameter rounds: a 50-node chain = 49 sequential shuffles).
        # Convergence by count: union+distinct+count is ONE job per round
        # (the count materializes the lazy checkpoint); a separate
        # anti-join "new edges" test costs an extra shuffle + action.
        stepped = (
            closure.withColumnRenamed("dst", "mid")
            .join(closure.withColumnRenamed("src", "mid"), "mid")
            .select("src", "dst")
        )
        nxt = closure.union(stepped).distinct().localCheckpoint(eager=False)
        n = nxt.count()
        closure = nxt
        if n == prev_n:
            break
        prev_n = n
    if min_length == 0:
        if nodes is None:
            nodes = edges.select(F.col("src").alias("n")).union(
                edges.select(F.col("dst").alias("n"))
            )
        identity = nodes.select(F.col("n").alias("src"), F.col("n").alias("dst")).distinct()
        closure = closure.union(identity).distinct()
    return closure


def reachable_from(
    edges: DataFrame,
    sources: DataFrame,
    min_length: int = 1,
    max_iter: int = 10_000,
    hops_per_round: int = 4,
) -> DataFrame:
    """Bound-source property path: all (src, dst) with a directed path of
    length >= min_length from each src in ``sources`` (a one-column
    DataFrame named ``src``).

    This is the ``<s> p+ ?o`` shape.  The reference evaluates it
    per-binding so the scan narrows (RDF4J PathIteration re-entering the
    strategy, strategy/.../HalyardTupleExprEvaluation.java:1073-1098);
    computing the whole-graph closure first — quadratic in component
    diameter — would be a scale-killer.  Distributed form: frontier BFS
    seeded from the bound side, carrying (root, node) pairs; each round is
    one equi-join on the frontier (small) against edges, so work is
    proportional to the reachable subgraph, not the whole graph.

    min_length >= 2 advances the seeds exactly (min_length - 1) steps
    before collecting — {o : path(s, o) >= k} = {o : s ->^(k-1) m and
    m ->+ o} — so e.g. ``p{2,}`` is exact, not approximated by the >= 1
    closure.  min_length = 0 adds the identity pair for every source
    (ZeroLengthPath binds o = s regardless of graph membership).

    ``hops_per_round`` batches that many 1-hop joins into ONE Spark job
    before the convergence action: each round is still frontier-sized
    work (never a whole-graph closure), but a diameter-D traversal costs
    ceil(D / hops_per_round) driver actions instead of D — on
    latency-bound deep chains this is a ~hops_per_round× wall-clock win.
    Intra-round frontiers dedup per hop; revisits across the round are
    dropped at the round-end anti-join, so cyclic graphs stay bounded.
    """
    if min_length < 0:
        raise ValueError(f"min_length must be >= 0; got {min_length}")
    if hops_per_round < 1:
        raise ValueError(f"hops_per_round must be >= 1; got {hops_per_round}")
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    seeds = sources.select(F.col("src").alias("root"), F.col("src").alias("node")).distinct()
    for _ in range(max(min_length - 1, 0)):
        seeds = (
            seeds.join(edges, seeds.node == edges.src)
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    result = None
    frontier = seeds
    hops_left = max_iter
    while hops_left > 0:
        this_round = min(hops_per_round, hops_left)
        hops_left -= this_round
        stepped = frontier
        parts = []
        for h in range(this_round):
            stepped = (
                stepped.join(edges, stepped.node == edges.src)
                .select("root", F.col("dst").alias("node"))
                .distinct()
            )
            parts.append(stepped.withColumn("__h", F.lit(h + 1)))
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.union(p)
        # dedup keeping the FIRST-reached hop depth: rows at __h ==
        # this_round are exactly the boundary frontier the next round
        # must expand (everything shallower was expanded within this
        # round); one aggregation, one anti-join, ONE action per round
        acc = acc.groupBy("root", "node").agg(F.min("__h").alias("__h"))
        if result is not None:
            acc = acc.join(result, ["root", "node"], "left_anti")
        fresh = acc.localCheckpoint(eager=False)
        if fresh.count() == 0:  # the count materializes the checkpoint
            break
        frontier = fresh.where(F.col("__h") == this_round).drop("__h")
        new_pairs = fresh.drop("__h")
        # accumulate WITHOUT re-checkpointing: every union arm is already
        # a materialized checkpoint (`fresh`), so lineage depth stays
        # O(rounds) while an eager checkpoint here would rewrite the
        # ENTIRE accumulated result each round (quadratic total work)
        result = new_pairs if result is None else result.union(new_pairs)
    out_schema = seeds.select(F.col("root").alias("src"), F.col("node").alias("dst")).limit(0)
    pairs = (
        out_schema
        if result is None
        else result.select(F.col("root").alias("src"), F.col("node").alias("dst"))
    )
    if min_length == 0:
        identity = sources.select(F.col("src"), F.col("src").alias("dst")).distinct()
        pairs = pairs.union(identity).distinct()
    return pairs


def zero_or_one_path(edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """``p?`` — identity union one hop (HTEE ZeroLengthPath :1046-1065).
    ``nodes`` (one column ``n``) is the identity domain; pass the store's
    full term set for W3C semantics (zero-length matches every graph
    term), default falls back to this path's edge endpoints."""
    if nodes is None:
        nodes = edges.select(F.col("src").alias("n")).union(edges.select(F.col("dst").alias("n")))
    identity = nodes.select(F.col("n").alias("src"), F.col("n").alias("dst")).distinct()
    return identity.union(edges.select("src", "dst")).distinct()
