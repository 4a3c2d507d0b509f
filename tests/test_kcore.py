"""k-core peeling (operators/graph.k_core): the distributed loop must
equal a pure-Python mirror of the synchronous fixed-round peeling
EXACTLY, classic closed-form cases must hold, and the fixed round
count must actually reach the peeling fixpoint on the test topologies
(the contract is state-after-N-rounds; these pin that N=5 suffices
for graphs of the shapes the queries feed it).
"""

from __future__ import annotations

import random

import pytest

from kafka_avro_order_processing_spark.operators.graph import k_core


def _py_kcore(
    edges: list[tuple[int, int]], k: int, rounds: int
) -> dict[int, bool]:
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {n for e in und for n in e}
    cur = set(und)
    keep = set(nodes)
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    return {n: n in keep for n in nodes}


def _run(spark, edges, k=3, rounds=5):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["in_core"] for r in k_core(df, k=k, rounds=rounds).collect()}


def test_clique_survives_chain_dies(spark):
    # K4 + a pendant chain: the clique is the whole 3-core; the chain
    # (degree <= 2 throughout) peels away completely.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 10), (10, 11), (11, 12)]
    got = _run(spark, k4 + chain)
    assert got == {0: True, 1: True, 2: True, 3: True,
                   10: False, 11: False, 12: False}
    assert got == _py_kcore(k4 + chain, 3, 5)


def test_ring_is_its_own_2core_but_no_3core(spark):
    ring = [(i, (i + 1) % 8) for i in range(8)]
    assert all(_run(spark, ring, k=2).values())
    assert not any(_run(spark, ring, k=3).values())


@pytest.mark.parametrize("seed", [5, 19, 37])
def test_matches_python_mirror_exactly(spark, seed):
    r = random.Random(seed)
    edges = list(
        {
            (a, b)
            for _ in range(120)
            for a, b in [sorted((r.randrange(40), r.randrange(40)))]
            if a != b
        }
    )
    got = _run(spark, edges)
    ref = _py_kcore(edges, 3, 5)
    assert got == ref
    # Fixed-round contract check: 5 rounds reached the true fixpoint
    # on this topology (one more round changes nothing).
    assert ref == _py_kcore(edges, 3, 6)


def test_converged_variant_peels_chains_fixed_rounds_miss(spark):
    """A length-10 chain hanging off a 4-clique peels ONE link per
    round at k=2: the fixed-5-round contract intentionally under-peels
    it, while k_core_converged reaches the true core (the clique) and
    reports the rounds it took."""
    from kafka_avro_order_processing_spark.operators.graph import (
        k_core,
        k_core_converged,
    )

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    # chain ATTACHED at clique node 3 (3-4-5-...-13): only the far end
    # ever has degree 1, so peeling removes exactly one link per round
    chain = [(3 + i, 4 + i) for i in range(10)]
    edges = spark.createDataFrame(clique + chain, "src long, dst long")

    fixed = {
        r["node"]: r["in_core"]
        for r in k_core(edges, k=2, rounds=5).collect()
    }
    labels, rounds_used = k_core_converged(edges, k=2)
    conv = {r["node"]: r["in_core"] for r in labels.collect()}

    # converged: exactly the clique survives
    assert {n for n, v in conv.items() if v} == {0, 1, 2, 3}
    # fixed-5 under-peels the chain (documented contract difference)
    assert sum(fixed.values()) > 4
    # one link per round + confirmation round
    assert 10 <= rounds_used <= 12


def test_converged_matches_fixed_rounds_when_already_converged(spark):
    from kafka_avro_order_processing_spark.operators.graph import (
        k_core,
        k_core_converged,
    )

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    fixed = {
        (r["node"], r["in_core"]) for r in k_core(tri, k=2, rounds=5).collect()
    }
    labels, rounds_used = k_core_converged(tri, k=2)
    assert {(r["node"], r["in_core"]) for r in labels.collect()} == fixed
    assert rounds_used <= 3
