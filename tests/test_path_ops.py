"""Direct unit coverage for the frontier-BFS path engine
(halyard_spark/query/path.py) — previously exercised only through the
SPARQL property-path front-end.

Covers both intra-round carriage strategies: the dedup-free fused-hop
path (low max out-degree, broadcast-sized edges) and the per-hop
distinct path (high fanout), plus cycles, min_length exactness, and a
brute-force closure equivalence on a seeded random digraph.

Reference semantics: RDF4J ArbitraryLengthPath / PathIteration
(strategy/.../HalyardTupleExprEvaluation.java:1073-1098)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from halyard_spark.query.path import (
    reachable_from,
    transitive_closure,
    zero_or_one_path,
)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def brute_closure(pairs, min_length=1):
    """Floyd-Warshall-ish reference closure on python sets."""
    nodes = {a for a, _ in pairs} | {b for _, b in pairs}
    reach = {n: set() for n in nodes}
    for a, b in pairs:
        reach[a].add(b)
    changed = True
    while changed:
        changed = False
        for n in nodes:
            new = set()
            for m in reach[n]:
                new |= reach[m]
            if not new <= reach[n]:
                reach[n] |= new
                changed = True
    out = {(str(a), str(b)) for a in nodes for b in reach[a]}
    if min_length == 0:
        out |= {(str(n), str(n)) for n in nodes}
    return sorted(out)


def test_chain_closure_dedup_free_path(spark):
    # out-degree 1 everywhere -> fused dedup-free hops
    pairs = [(i, i + 1) for i in range(12)]
    got = rows(transitive_closure(edges_df(spark, pairs)))
    assert got == brute_closure(pairs)


def test_dense_graph_takes_per_hop_distinct_and_is_correct(spark):
    # K12 minus self-loops: max out-degree 11 -> 11**4 > 256, so the
    # fanout gate must fall back to per-hop distinct; the closure is
    # every ordered pair.
    n = 12
    pairs = [(a, b) for a in range(n) for b in range(n) if a != b]
    got = rows(transitive_closure(edges_df(spark, pairs)))
    assert got == sorted((str(a), str(b)) for a in range(n) for b in range(n))


def test_cycle_terminates_and_closes(spark):
    pairs = [(0, 1), (1, 2), (2, 0)]
    got = rows(transitive_closure(edges_df(spark, pairs)))
    assert got == sorted((str(a), str(b)) for a in range(3) for b in range(3))


def test_reachable_from_min_length_exact(spark):
    # chain 0->1->2->3->4; min_length=2 from 0 reaches {2,3,4} only
    pairs = [(i, i + 1) for i in range(4)]
    src = spark.createDataFrame([("0",)], "src string")
    got = rows(reachable_from(edges_df(spark, pairs), src, min_length=2))
    assert got == [("0", "2"), ("0", "3"), ("0", "4")]
    # min_length=0 adds the identity pair for the source itself
    got0 = rows(reachable_from(edges_df(spark, pairs), src, min_length=0))
    assert ("0", "0") in got0 and ("0", "4") in got0 and len(got0) == 5


def test_random_digraph_matches_brute_force(spark):
    rng = random.Random(20260817)
    n = 30
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(70)})
    pairs = [(a, b) for a, b in pairs if a != b]
    df = edges_df(spark, pairs)
    want = brute_closure(pairs)
    assert rows(transitive_closure(df, min_length=1)) == want
    # hops_per_round=1 must agree with the default batching
    srcs = df.select("src").distinct()
    got1 = rows(
        reachable_from(df, srcs, min_length=1, hops_per_round=1)
    )
    assert got1 == want


def test_zero_or_one_path_identity_domain(spark):
    pairs = [(0, 1)]
    nodes = spark.createDataFrame([("0",), ("1",), ("9",)], "n string")
    got = rows(zero_or_one_path(edges_df(spark, pairs), nodes=nodes))
    assert got == [("0", "0"), ("0", "1"), ("1", "1"), ("9", "9")]


def test_empty_edges(spark):
    df = edges_df(spark, []).where(F.lit(False))
    assert rows(transitive_closure(df)) == []
