"""Deterministic label propagation: equality with a pure-Python mirror
of the synchronous min-tie-break recurrence on adversarial topologies,
and the semantic sanity case (two cliques joined by one bridge resolve
to exactly two communities).
"""

from __future__ import annotations

import collections
import random

import pytest

from kafka_avro_order_processing_spark.operators.graph import label_propagation


def _py_lpa(edges, iters=3):
    sym = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            sym[a].add(b)
            sym[b].add(a)
    labels = {n: n for n in sym}
    for _ in range(iters):
        labels = {
            n: min(
                (cnt := collections.Counter(labels[m] for m in nbrs)),
                key=lambda l: (-cnt[l], l),
            )
            for n, nbrs in sym.items()
        }
    return labels


TOPOLOGIES = {
    "two_cliques_bridge": lambda: (
        [(i, j) for i in range(6) for j in range(i + 1, 6)]
        + [(i, j) for i in range(10, 16) for j in range(i + 1, 16)]
        + [(5, 10)]
    ),
    "chain": lambda: [(i, i + 1) for i in range(20)],
    "star_hub": lambda: [(0, i) for i in range(1, 30)],
    "random_sparse": lambda: [
        (r.randrange(80), r.randrange(80))
        for r in [random.Random(17)]
        for _ in range(160)
    ],
}


@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
def test_matches_python_mirror(spark, name):
    edges = TOPOLOGIES[name]()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["community"] for r in label_propagation(df, 3).collect()}
    assert got == _py_lpa(edges, 3)


def test_two_cliques_resolve_to_two_communities(spark):
    edges = TOPOLOGIES["two_cliques_bridge"]()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["community"] for r in label_propagation(df, 4).collect()}
    comms = collections.Counter(got.values())
    assert len(comms) == 2
    # each clique coheres around one label
    assert {got[i] for i in range(6)} != {got[i] for i in range(10, 16)}
    assert len({got[i] for i in range(6)}) == 1
    assert len({got[i] for i in range(10, 16)}) == 1
