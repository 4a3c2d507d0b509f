"""Newman modularity (operators/graph.modularity): the all-integer
per-community decomposition must equal a pure-Python reference EXACTLY
(the operator's contract is that integer arithmetic makes the score
shuffle-order independent), classic closed-form cases must come out
bit-exact, and the Q <= 1 bound must hold on random partitions.

Reference behavior target: the reference engine has no graph op; this
is the quality gate for the M5 community-detection workload
(label_propagation) — "is the partition better than a random cut?".
"""

from __future__ import annotations

import random

import pytest

from kafka_avro_order_processing_spark.operators.graph import (
    label_propagation,
    modularity,
)


def _py_modularity(
    edges: list[tuple[int, int]], labels: dict[int, int]
) -> dict[int, tuple[int, int, int, int, int]]:
    """(community -> (n_members, intra_edges, degree_sum, contrib_num,
    denom)), the exact integer reference."""
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    m = len(und)
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out: dict[int, list[int]] = {}
    for n, c in labels.items():
        st = out.setdefault(c, [0, 0, 0])
        st[0] += 1
        st[2] += deg.get(n, 0)
    for a, b in und:
        if labels[a] == labels[b]:
            out[labels[a]][1] += 1
    return {
        c: (nm, li, ds, 4 * m * li - ds * ds, 4 * m * m)
        for c, (nm, li, ds) in out.items()
    }


def _run(spark, edges, labels):
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame(list(labels.items()), "node long, community long")
    return {
        r["community"]: (
            r["n_members"],
            r["intra_edges"],
            r["degree_sum"],
            r["contrib_num"],
            r["denom"],
        )
        for r in modularity(e, lab).collect()
    }


def test_two_cliques_perfect_partition_is_half(spark):
    # Two disjoint K4s with the component partition: the textbook case,
    # Q = 2 * (4m*6 - 12^2) / (4m^2) = 0.5 with m = 12.
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    labels = {n: 0 for n in range(4)} | {n + 10: 1 for n in range(4)}
    got = _run(spark, k4a + k4b, labels)
    assert got == _py_modularity(k4a + k4b, labels)
    total = sum(v[3] for v in got.values())
    denom = next(iter(got.values()))[4]
    assert total * 2 == denom  # Q = 0.5 exactly


def test_single_community_q_is_zero(spark):
    # Everything in one community: L_c = m and d_c = 2m, so
    # contrib_num = 4m^2 - (2m)^2 = 0 — Q = 0 by construction.
    edges = [(i, (i + 1) % 6) for i in range(6)]
    labels = {n: 7 for n in range(6)}
    got = _run(spark, edges, labels)
    assert got == {7: (6, 6, 12, 0, 4 * 36)}


@pytest.mark.parametrize("seed", [3, 17, 41])
def test_matches_python_reference_on_random_partitions(spark, seed):
    r = random.Random(seed)
    edges = list(
        {
            (a, b)
            for _ in range(120)
            for a, b in [sorted((r.randrange(30), r.randrange(30)))]
            if a != b
        }
    )
    nodes = sorted({n for e in edges for n in e})
    labels = {n: r.randrange(4) for n in nodes}
    got = _run(spark, edges, labels)
    ref = _py_modularity(edges, labels)
    assert got == ref
    # Newman bound: Q <= 1, i.e. sum of numerators <= the denominator.
    denom = next(iter(got.values()))[4]
    assert sum(v[3] for v in got.values()) <= denom


def test_scores_label_propagation_partition(spark):
    # End-to-end with the producer it gates: two dense blocks joined by
    # one bridge edge; LPA finds the blocks and modularity must (a)
    # cover every node, (b) beat the single-community score (Q > 0).
    blk1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    blk2 = [(a + 20, b + 20) for a, b in blk1]
    edges = blk1 + blk2 + [(4, 20)]
    e = spark.createDataFrame(edges, "src long, dst long")
    labels = label_propagation(e, iterations=3)
    rows = modularity(e, labels).collect()
    assert sum(r["n_members"] for r in rows) == 10
    assert sum(r["degree_sum"] for r in rows) == 2 * len(edges)
    assert sum(r["contrib_num"] for r in rows) > 0


def test_labels_wider_than_edge_list_count_isolated_members(spark):
    # A label table covering nodes absent from the edge list (isolated
    # nodes) must still count them in n_members with zero degree — the
    # Python reference's deg.get(n, 0) semantics.  Before the left-join
    # fix the operator inner-joined labels with the degree table and
    # silently dropped them.
    edges = [(1, 2), (2, 3), (1, 3)]
    labels = {1: 1, 2: 1, 3: 1, 99: 1, 100: 7}
    got = _run(spark, edges, labels)
    assert got == _py_modularity(edges, labels)
    assert got[1][0] == 4          # 99 counted as a member
    assert got[7] == (1, 0, 0, 0, 4 * 3 * 3)  # all-isolated community
