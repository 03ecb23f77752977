"""Property-path operators: transitive closure via iterative frontier joins.

Halyard evaluates ``p+`` / ``p*`` with RDF4J's pull PathIteration
re-entering the strategy per step
(strategy/.../HalyardTupleExprEvaluation.java:1073-1098) — a row-at-a-time
nested loop.  Distributed form: BFS frontier expansion with hash joins,
dedup against the seen set, and ``localCheckpoint`` per round to keep the
plan bounded.  Same shape as the connected-components stage.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round_sql_array(fv: str, ev: str, hops: int, broadcast: bool) -> str:
    """One dedup-free BFS round as a single SQL statement: a flat chain of
    ``hops`` LEFT JOINs whose per-row node sequence is collected with
    ``array(...)`` + ``filter(not null)`` — once a path ends its join key
    is NULL and every later hop stays NULL, so the filtered array is
    exactly the hop-by-hop history the old iterative builder appended.
    posexplode + min(position) then keeps each (root, node)'s FIRST-reached
    depth, identical to the union-of-arms semantics.

    Built as ONE statement because classic DataFrame methods analyze
    eagerly: the old per-hop ``join(...).select(...)`` loop re-analyzed a
    deepening plan 32 times per round — measured ~1 s of driver time per
    round at sf0.1, more than the round's own execution.  One SQL string
    is parsed and analyzed once (~60-100 ms)."""
    hint = (
        "/*+ BROADCAST(" + ", ".join(f"e{i}" for i in range(1, hops + 1)) + ") */ "
        if broadcast
        else ""
    )
    joins = [f"LEFT JOIN {ev} e1 ON s.node = e1.src"]
    joins += [
        f"LEFT JOIN {ev} e{i} ON e{i - 1}.dst = e{i}.src" for i in range(2, hops + 1)
    ]
    arr = ", ".join(f"e{i}.dst" for i in range(1, hops + 1))
    return (
        f"WITH chain AS (\n"
        f"  SELECT {hint}s.root,\n"
        f"         filter(array({arr}), x -> x IS NOT NULL) AS hist\n"
        f"  FROM {fv} s\n  " + "\n  ".join(joins) + "\n)\n"
        "SELECT root, __n AS node, min(__p) + 1 AS __h\n"
        "FROM chain LATERAL VIEW posexplode(hist) t AS __p, __n\n"
        "GROUP BY root, __n"
    )


def _round_sql_distinct(fv: str, ev: str, hops: int, broadcast: bool) -> str:
    """One high-fanout BFS round: per-hop DISTINCT CTEs (bounding row
    growth mid-round, which the array form cannot) unioned with their hop
    depth, then min(__h) per pair — the same plan the old per-hop
    DataFrame loop built, constructed in one analyzed statement."""
    hint = "/*+ BROADCAST(e) */ " if broadcast else ""
    ctes = [
        f"h1 AS (SELECT {hint}DISTINCT s.root, e.dst AS node "
        f"FROM {fv} s JOIN {ev} e ON s.node = e.src)"
    ]
    ctes += [
        f"h{i} AS (SELECT {hint}DISTINCT p.root, e.dst AS node "
        f"FROM h{i - 1} p JOIN {ev} e ON p.node = e.src)"
        for i in range(2, hops + 1)
    ]
    arms = "\n  UNION ALL ".join(
        f"SELECT root, node, {i} AS __h FROM h{i}" for i in range(1, hops + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT root, node, min(__h) AS __h FROM (\n  " + arms + "\n) GROUP BY root, node"
    )


def transitive_closure(
    edges: DataFrame,
    min_length: int = 1,
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

    Algorithm: frontier BFS seeded from EVERY source node (the same
    batched-hop engine as :func:`reachable_from`), NOT closure-squaring
    path doubling.  Doubling looks attractive (log2(diameter) rounds)
    but its self-join emits every pair once per midpoint — on the sf1.0
    rehearsal's 50-chains that was ~50M duplicate rows per late round
    (O(n·d²) intermediate volume), measured 63x the sf0.1 wall for 10x
    the input, dominated by shuffle-write + GC of rows the distinct
    then discarded.  BFS discovers each closure pair exactly ONCE
    (anti-join against the accumulated result), so total join volume is
    O(|closure|); ceil(diameter / hops_per_round) driver actions buy
    that linearity — the right trade at any scale where the closure
    itself is materializable.
    """
    if min_length not in (0, 1):
        raise ValueError(
            f"transitive_closure supports min_length in {{0, 1}}; got {min_length} "
            "(use reachable_from for longer minimum paths)"
        )
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    # NOT distinct'd here: reachable_from's seed construction dedups the
    # source column anyway, and a distinct on top of that became a second
    # redundant aggregation exchange in every closure's first round
    sources = edges.select("src")
    # _normalized: this function just deduped + checkpointed the edge set;
    # letting reachable_from re-distinct + re-checkpoint it would
    # materialize the edge table twice per closure call (code-review fix)
    closure = reachable_from(
        edges, sources, min_length=1, _normalized=True, _sources_from_edges=True
    )
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
    max_length: int | None = None,
    hops_per_round: int | None = None,
    _normalized: bool = False,
    _sources_from_edges: bool = False,
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

    ``max_length`` is an intentional path-length CAP (``p?`` passes 1),
    counted in hops after the min_length seed advance; ``None`` (the
    default) runs the BFS to convergence — termination is guaranteed
    because every round's anti-join only admits never-seen (root, node)
    pairs from a finite space.

    ``hops_per_round`` batches that many 1-hop joins into ONE Spark job
    before the convergence action (``None`` = auto: 32 on degree-1
    broadcast-joined graphs, up to 16 on low-fanout (degree <= 4) ones,
    4 otherwise): each round is
    still frontier-sized
    work (never a whole-graph closure), but a diameter-D traversal costs
    ceil(D / hops_per_round) driver actions instead of D — on
    latency-bound deep chains this is a ~hops_per_round× wall-clock win.
    Revisits across the round are dropped at the round-end anti-join, so
    cyclic graphs stay bounded.

    Join strategy: a checkpointed edge RDD carries NO size statistics,
    so Catalyst defaults every hop to a sort-merge join — two exchanges
    + two sorts per hop, ~10 scheduled shuffles per round, which
    dominates wall clock on deep graphs (measured: fixed ~0.6 s per
    shuffle stage regardless of data size).  The edge count is known
    (the eager checkpoint just materialized it), so hops BROADCAST the
    edge table whenever its estimated size fits the session's
    autoBroadcastJoinThreshold: every hop becomes a narrow broadcast-
    hash join, the whole multi-hop chain fuses into ONE codegen stage,
    and — when the graph's max out-degree keeps worst-case duplicate
    carriage bounded — per-hop dedup is deferred to the round-end
    aggregation (the broadcast hops are so cheap that bounded duplicate
    carriage is cheaper than a shuffle per hop).  High-fanout or
    above-threshold edge sets keep the per-hop distinct — at that scale
    data volume, not scheduling latency, is the budget.
    """
    if min_length < 0:
        raise ValueError(f"min_length must be >= 0; got {min_length}")
    if hops_per_round is not None and hops_per_round < 1:
        raise ValueError(f"hops_per_round must be >= 1; got {hops_per_round}")
    if not _normalized:
        edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    n_edges = edges.count()  # free: the checkpoint is materialized
    spark = edges.sparkSession
    try:
        bcast_limit = int(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    except Exception:
        bcast_limit = 64 * 1024 * 1024
    # ~128 B/row covers a pair of typical IRI terms; err toward NOT
    # broadcasting (a too-big broadcast OOMs, a missed one just shuffles)
    broadcast_edges = 0 <= n_edges * 128 <= bcast_limit
    hop_edges = F.broadcast(edges) if broadcast_edges else edges
    # Dedup-free carriage is gated on FANOUT, not just edge-table size:
    # within a round a (root, node) pair is carried once per distinct
    # path, bounded by max_out_degree^hops_per_round.  Chains/trees
    # (degree <= 4) stay within a 256x worst-case and win by fusing the
    # whole round into one codegen stage; a dense broadcast-sized graph
    # (e.g. 1k near-complete nodes = 500k edges, fanout ~500) would carry
    # 500^4 duplicate rows per frontier row — for those, keep the per-hop
    # distinct (still broadcast-joined: the distinct costs one exchange
    # vs sort-merge's two-exchanges-plus-sorts per hop).
    if broadcast_edges and n_edges > 0:
        max_deg = (
            edges.groupBy("src").count().agg(F.max("count")).first()[0] or 0
        )
    else:
        max_deg = None
    if hops_per_round is None:
        # Auto depth: dedup-free broadcast hops are near-free (one fused
        # codegen stage regardless of depth), so fuse as many per driver
        # round as the carriage bound allows — a diameter-49 chain then
        # converges in few rounds.  Depth limits are PLAN-COST bounds,
        # measured at sf0.1: with union-of-arms rounds Catalyst analysis
        # grows superlinearly past 16 hops (8: 15.1 s, 16: 12.4 s, 24:
        # 14.8 s, 32: 44.8 s end-to-end), so fanout 2-4 graphs cap at
        # 16; the degree-1 array-history round keeps the plan ~25 nodes
        # at any depth, so it goes to 32.  Shuffle-joined or high-fanout
        # graphs stay at 4: there each hop is a real shuffle, and deeper
        # rounds just defer the convergence check.
        if max_deg is not None and max_deg == 1:
            # degree-1 graphs (chains/rings) carry no duplicates at any
            # depth, and the array-history round (below) keeps the plan
            # ~25 nodes regardless of depth — 32 fused hops measured
            # fastest at sf0.1 (7.1 s vs 8.7 s at 16, vs 44.8 s for the
            # old 32-deep union-of-arms plan)
            hops_per_round = 32
        elif max_deg is not None and 1 <= max_deg <= 4:
            h = 16
            while max_deg**h > 256:
                h -= 1
            hops_per_round = max(4, h)
        else:
            hops_per_round = 4
    dedup_free = max_deg is not None and max_deg**hops_per_round <= 256
    seeds = sources.select(F.col("src").alias("root"), F.col("src").alias("node"))
    if not (_sources_from_edges and max_deg == 1):
        # seed dedup costs an exchange in round 1's critical path; skip it
        # only when uniqueness is PROVEN: the sources are the deduped edge
        # set's own src column (transitive_closure) and max out-degree is
        # 1, so each src appears exactly once
        seeds = seeds.distinct()
    for _ in range(max(min_length - 1, 0)):
        seeds = (
            seeds.join(hop_edges, seeds.node == edges.src)
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    result = None
    result_rows = 0  # known exactly: sum of each round's fresh.count()
    frontier = seeds
    # BFS terminates on its own: each round's anti-join keeps only pairs
    # never seen before, and the (root, node) space is finite — so the
    # default is run-to-convergence, matching the removed path-doubling's
    # effective 2^64-hop coverage (code-review fix: a finite default hop
    # budget silently truncated deep closures).  max_length is an
    # INTENTIONAL path-length cap — `p?` passes 1 — counted in hops
    # after the min_length seed advance, not a convergence budget.
    hops_left = max_length if max_length is not None else -1
    # The round body is generated as ONE SQL statement over temp views of
    # the frontier + edge set (_round_sql_array / _round_sql_distinct):
    # the old per-hop DataFrame loop re-analyzed its deepening plan after
    # every join — ~1 s of driver time per 32-hop round, more than the
    # round's execution.  View names are invocation-unique (the session's
    # temp namespace is shared across concurrent driver threads).
    spark_s = edges.sparkSession
    tag = uuid.uuid4().hex[:12]
    ev, fv = f"path_edges_{tag}", f"path_frontier_{tag}"
    edges.createOrReplaceTempView(ev)
    round_sql_cache: dict[int, str] = {}
    try:
      while hops_left != 0:
        this_round = (
            hops_per_round if hops_left < 0 else min(hops_per_round, hops_left)
        )
        if hops_left > 0:
            hops_left -= this_round
        sql = round_sql_cache.get(this_round)
        if sql is None:
            build = _round_sql_array if dedup_free else _round_sql_distinct
            sql = build(fv, ev, this_round, broadcast_edges)
            round_sql_cache[this_round] = sql
        frontier.createOrReplaceTempView(fv)
        acc = spark_s.sql(sql)
        if result is not None:
            # the accumulated result's exact row count is known (summed
            # fresh counts), so the seen-set side of the anti-join is
            # BROADCAST whenever it fits — a checkpointed RDD carries no
            # stats, and Catalyst would otherwise sort-merge every round
            # (two exchanges + sorts on the latency-critical loop path);
            # oversized closures fall back to the shuffled anti-join
            seen = (
                F.broadcast(result)
                if 0 <= result_rows * 128 <= bcast_limit
                else result
            )
            acc = acc.join(seen, ["root", "node"], "left_anti")
        fresh = acc.localCheckpoint(eager=False)
        # ONE action per round: count + max depth together (the agg
        # materializes the lazy checkpoint exactly like a count would)
        stats = fresh.agg(
            F.count(F.lit(1)).alias("n"), F.max("__h").alias("maxh")
        ).first()
        n_fresh = stats["n"]
        if n_fresh == 0:
            break
        result_rows += n_fresh
        frontier = fresh.where(F.col("__h") == this_round).drop("__h")
        new_pairs = fresh.drop("__h")
        # accumulate WITHOUT re-checkpointing: every union arm is already
        # a materialized checkpoint (`fresh`), so lineage depth stays
        # O(rounds) while an eager checkpoint here would rewrite the
        # ENTIRE accumulated result each round (quadratic total work)
        result = new_pairs if result is None else result.union(new_pairs)
        if stats["maxh"] < this_round:
            # no fresh pair sits at this round's boundary depth, so the
            # next frontier is PROVABLY empty — skip the verify round
            # (a whole plan+schedule cycle) the count==0 exit would cost
            break
    finally:
        for v in (fv, ev):
            try:
                spark_s.catalog.dropTempView(v)
            except Exception:
                pass
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
