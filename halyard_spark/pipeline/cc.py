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

Round construction is ONE ``spark.sql`` statement over a temp view of the
previous round, not a chain of DataFrame transformations: every classic
DataFrame method analyzes its growing plan EAGERLY, and the incremental
re-analysis of each round's ~15-op chain measured 450-700 ms per round on
the driver — 4-6x the round's actual execution at sf0.1.  The single SQL
statement analyzes once (~60 ms).  Both star ops use a min() window over
partitionBy(src) — one exchange each — instead of the groupBy+self-join
formulation (two shuffled sides + sorts per star op, guide §2.4).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One alternation round: small_star(large_star(cur)).
#
# - ``undirected``/``large_min``: large-star's m = min over EVERY
#   neighbor of src plus src itself (larger neighbors never affect the
#   min, so one undirected window serves); each strictly-larger neighbor
#   is connected to that min.  No trailing dedup on the large arm: the
#   round's final DISTINCT bounds growth, and an extra shuffle per round
#   costs more than carrying a few duplicate rows forward.
# - ``oriented``/``small_min``: small-star over large-star's output;
#   the second union arm emits (src, m) per ROW rather than per group —
#   the same value set (m is functionally dependent on src), collapsed
#   identically by the final DISTINCT without a per-group dedup exchange.
_ROUND_SQL = """\
WITH undirected AS (
  SELECT src, dst FROM {v} UNION ALL SELECT dst AS src, src AS dst FROM {v}
), large_min AS (
  SELECT src, dst, least(min(dst) OVER (PARTITION BY src), src) AS m FROM undirected
), large AS (
  SELECT dst AS src, m AS dst FROM large_min WHERE dst > src
), oriented AS (
  SELECT greatest(src, dst) AS src, least(src, dst) AS dst FROM large
), small_min AS (
  SELECT src, dst, least(min(dst) OVER (PARTITION BY src), src) AS m FROM oriented
)
SELECT DISTINCT src, dst FROM (
  SELECT dst AS src, m AS dst FROM small_min
  UNION ALL
  SELECT src, m AS dst FROM small_min
)"""


_LATENCY_MODE_MAX_BYTES = 64 * 1024 * 1024


def _latency_clone(cur: DataFrame):
    """(loop_df, loop_session) for the star-round fixed point.

    The rounds iterate TINY shuffles (the edge set shrinks toward one row
    per node), so with AQE each round's 3 exchanges materialize as
    separate jobs and the loop pays ~4 scheduling floors per round —
    measured 3.5-4.2 s at sf0.1 where the same rounds with AQE OFF and a
    size-derived static width run 2.0-2.5 s (one job per round).  AQE off
    is wrong for everything else on the session (and a session conf flip
    would leak into concurrently-running pipeline jobs), so the loop runs
    on a ``newSession()`` clone holding the latency conf, over the
    already-materialized edge RDD.  Gate: only when the measured edge set
    is small (< 64 MB); at real scale data volume, not scheduling, is the
    budget, and the caller's AQE session (skew splitting, coalescing)
    keeps the loop.  Width tracks the measured bytes, never a constant:
    ~1 partition per MB, floored at 4 — sf0.1's 1.5 MB edge set gets 4,
    a 50 MB one gets 32+."""
    stats = cur.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.length("src") + F.length("dst")).alias("b"),
    ).first()
    n_edges = stats["n"] or 0
    est_bytes = int(n_edges * ((stats["b"] or 0.0) + 16))
    if not (0 < est_bytes <= _LATENCY_MODE_MAX_BYTES):
        return cur, None
    try:
        from halyard_spark.session import rebind_to_session

        clone = cur.sparkSession.newSession()
        clone.conf.set("spark.sql.adaptive.enabled", "false")
        width = max(4, min(64, est_bytes // (1024 * 1024) + 1))
        clone.conf.set("spark.sql.shuffle.partitions", str(width))
        return rebind_to_session(cur, clone), clone
    except Exception:
        return cur, None  # clone API unavailable: keep the caller's AQE path


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """edges(src: string, dst: string) -> (node, component).

    component = lexicographic min of the node's component.  Includes every
    node that appears in any edge; callers union in isolated nodes.
    """
    caller = edges.sparkSession
    cur = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    # LAZY checkpoint: _latency_clone's sizing aggregation is the next
    # action and materializes it — fusing the two saves a whole scheduled
    # job on the query's critical path (an eager checkpoint here ran the
    # distinct, then the agg re-scanned the checkpoint)
    cur = cur.localCheckpoint(eager=False)
    cur, clone = _latency_clone(cur)
    loop_spark = clone if clone is not None else caller
    # unique per invocation: concurrent pipeline threads share the caller
    # session's temp-view namespace when no clone engages
    view = f"cc_round_{uuid.uuid4().hex[:12]}"
    prev_sig: tuple | None = None
    try:
        for _ in range(max_iter):
            cur.createOrReplaceTempView(view)
            # lazy checkpoint + signature agg = ONE job per round (the agg
            # action materializes the checkpoint); an eager checkpoint plus
            # a separate agg would double the per-round scheduling latency
            cur = loop_spark.sql(_ROUND_SQL.format(v=view)).localCheckpoint(eager=False)
            sig_row = cur.agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
            ).collect()[0]
            sig = (sig_row["n"], sig_row["h"])
            if sig == prev_sig:
                break
            prev_sig = sig
    finally:
        try:
            loop_spark.catalog.dropTempView(view)
        except Exception:
            pass
    if clone is not None:
        # the loop's last round is materialized (the signature agg ran on
        # it); re-home it so the assembly below — and everything callers
        # compose with it — plans on the caller's AQE session
        from halyard_spark.session import rebind_to_session

        cur = rebind_to_session(cur, caller)
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
