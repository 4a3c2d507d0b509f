"""Fixed-point PageRank: the distributed loop must equal a pure-Python
mirror of the integer recurrence EXACTLY (no tolerance — the operator's
whole contract is that integer arithmetic makes the result independent
of partitioning and shuffle order), and basic rank-mass sanity holds.

Reference behavior target: the reference engine has no graph op; this
is the M5 iterative-graph workload (importance ranking over a derived
entity graph) built on the same Pregel-style join+agg rounds as
operators/graph.connected_components.
"""

from __future__ import annotations

import random

import pytest

from kafka_avro_order_processing_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank,
)


def _py_pagerank(edges: list[tuple[int, int]], iterations: int) -> dict[int, int]:
    base = (3 * PAGERANK_SCALE) // 20
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {n: PAGERANK_SCALE for n in deg}
    for _ in range(iterations):
        sums: dict[int, int] = {}
        for s, d in edges:
            sums[d] = sums.get(d, 0) + ranks[s] // deg[s]
        ranks = {n: base + (17 * sums.get(n, 0)) // 20 for n in deg}
    return ranks


def _sym(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    und = {(a, b) for a, b in pairs if a != b}
    return sorted(und | {(b, a) for a, b in und})


TOPOLOGIES = {
    "triangle": lambda: _sym([(1, 2), (2, 3), (3, 1)]),
    "chain": lambda: _sym([(i, i + 1) for i in range(12)]),
    "star_hub": lambda: _sym([(0, i) for i in range(1, 25)]),
    "random_sparse": lambda: _sym(
        [
            (r.randrange(60), r.randrange(60))
            for r in [random.Random(11)]
            for _ in range(120)
        ]
    ),
}


@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
def test_matches_python_mirror_exactly(spark, name):
    edges = TOPOLOGIES[name]()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iterations=3).collect()}
    assert got == _py_pagerank(edges, 3)


def test_symmetric_regular_graph_is_uniform(spark):
    # On a d-regular symmetric graph every node is equivalent, so all
    # ranks must be identical (and mass is conserved up to floor loss).
    edges = _sym([(i, (i + 1) % 8) for i in range(8)])  # 2-regular ring
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank(df, iterations=4).collect()
    ranks = {r["rank_scaled"] for r in rows}
    assert len(ranks) == 1
    (rank,) = ranks
    # floor-division loses < 2 units per node per round
    assert PAGERANK_SCALE - 16 <= rank <= PAGERANK_SCALE


def test_hub_outranks_leaves(spark):
    edges = _sym([(0, i) for i in range(1, 30)])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iterations=3).collect()}
    hub = got.pop(0)
    assert all(hub > leaf for leaf in got.values())
    assert len(set(got.values())) == 1  # leaves are symmetric
