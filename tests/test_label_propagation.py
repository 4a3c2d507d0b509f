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


def test_auto_round_selection_matches_fixed_rounds(spark):
    # Two 4-cliques joined by a single bridge: Q improves as the
    # cliques collapse to one label each, then plateaus.
    from kafka_avro_order_processing_spark.operators.graph import (
        label_propagation,
        label_propagation_auto,
        modularity,
    )
    from pyspark.sql import functions as F

    clique_a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    clique_b = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = spark.createDataFrame(
        clique_a + clique_b + [(3, 10)], "src long, dst long"
    )
    labels, best_round, history = label_propagation_auto(
        edges, max_iterations=8, patience=2
    )
    # Selection picks the argmax of the integer Q numerator.
    assert history[best_round - 1] == max(history)
    # The chosen labels are EXACTLY label_propagation at that round —
    # auto mode changes when to stop, never the round semantics.
    fixed = {
        (r["node"], r["community"])
        for r in label_propagation(edges, iterations=best_round).collect()
    }
    got = {(r["node"], r["community"]) for r in labels.collect()}
    assert got == fixed
    # The internal Q numerator agrees with the public modularity()
    # decomposition of the same partition.
    s = (
        modularity(edges, labels)
        .agg(F.sum("contrib_num").cast("long").alias("s"))
        .collect()[0]["s"]
    )
    assert s == history[best_round - 1]
    # And the partition itself is the two cliques.
    comms = {}
    for n, c in got:
        comms.setdefault(c, set()).add(n)
    assert sorted(map(sorted, comms.values())) == [
        [0, 1, 2, 3], [10, 11, 12, 13]
    ]


def test_auto_stops_early_on_plateau(spark):
    from kafka_avro_order_processing_spark.operators.graph import (
        label_propagation_auto,
    )

    # A triangle converges in one round; with patience=1 the loop must
    # stop well before max_iterations.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    _, best_round, history = label_propagation_auto(
        edges, max_iterations=10, patience=1
    )
    assert len(history) < 10
    assert best_round <= len(history)
