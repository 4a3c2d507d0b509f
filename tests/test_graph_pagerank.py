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
    PAGERANK_W_SCALE,
    pagerank,
    pagerank_weighted,
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


# ---------------------------------------------------------------------------
# Weighted variant: mass flows in proportion to integer edge weights at
# the coarser 2^20 fixed point (rank*w must stay < 2^53).  Same exact
# contract: the distributed loop equals a pure-Python mirror of the
# integer recurrence EXACTLY.
# ---------------------------------------------------------------------------


def _py_pagerank_weighted(
    edges: list[tuple[int, int, int]], iterations: int
) -> dict[int, int]:
    base = (3 * PAGERANK_W_SCALE) // 20
    wsum: dict[int, int] = {}
    for s, _, w in edges:
        wsum[s] = wsum.get(s, 0) + w
    ranks = {n: PAGERANK_W_SCALE for n in wsum}
    for _ in range(iterations):
        sums: dict[int, int] = {}
        for s, d, w in edges:
            sums[d] = sums.get(d, 0) + (ranks[s] * w) // wsum[s]
        ranks = {n: base + (17 * sums.get(n, 0)) // 20 for n in wsum}
    return ranks


def _sym_w(pairs: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    und = {(a, b): w for a, b, w in pairs if a != b}
    out = {}
    for (a, b), w in und.items():
        out[(a, b)] = w
        out[(b, a)] = w
    return sorted((a, b, w) for (a, b), w in out.items())


W_TOPOLOGIES = {
    "triangle_skewed": lambda: _sym_w([(1, 2, 1), (2, 3, 10), (3, 1, 100)]),
    "chain_ramp": lambda: _sym_w([(i, i + 1, i + 1) for i in range(12)]),
    "random_weighted": lambda: _sym_w(
        [
            (r.randrange(40), r.randrange(40), r.randrange(1, 50))
            for r in [random.Random(23)]
            for _ in range(90)
        ]
    ),
}


@pytest.mark.parametrize("name", sorted(W_TOPOLOGIES))
def test_weighted_matches_python_mirror_exactly(spark, name):
    edges = W_TOPOLOGIES[name]()
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_weighted(df, iterations=3).collect()
    }
    assert got == _py_pagerank_weighted(edges, 3)


def test_weight_one_reduces_to_unweighted_recurrence(spark):
    # With all weights 1, W(u) = deg(u) and floor(rank*1/W) =
    # floor(rank/deg): the weighted recurrence IS the unweighted one
    # (at the weighted scale).  Checked end-to-end: the distributed
    # weighted loop equals the unweighted Python mirror run at
    # PAGERANK_W_SCALE.
    edges = _sym([(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    base = (3 * PAGERANK_W_SCALE) // 20
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {n: PAGERANK_W_SCALE for n in deg}
    for _ in range(3):
        sums: dict[int, int] = {}
        for s, d in edges:
            sums[d] = sums.get(d, 0) + ranks[s] // deg[s]
        ranks = {n: base + (17 * sums.get(n, 0)) // 20 for n in deg}
    df = spark.createDataFrame(
        [(a, b, 1) for a, b in edges], "src long, dst long, weight long"
    )
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_weighted(df, iterations=3).collect()
    }
    assert got == ranks


def test_heavier_edge_attracts_more_rank(spark):
    # Star where the hub's edge to node 4 carries 97x the weight of its
    # edges to nodes 1-3: node 4 must outrank the light leaves.
    edges = _sym_w([(0, 1, 1), (0, 2, 1), (0, 3, 1), (0, 4, 97)])
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_weighted(df, iterations=3).collect()
    }
    assert got[4] > got[1] == got[2] == got[3]


def test_weighted_reports_total_weight(spark):
    edges = _sym_w([(0, 1, 5), (1, 2, 7)])
    rows = pagerank_weighted(
        spark.createDataFrame(edges, "src long, dst long, weight long")
    ).collect()
    tw = {r["node"]: r["total_weight"] for r in rows}
    assert tw == {0: 5, 1: 12, 2: 7}
