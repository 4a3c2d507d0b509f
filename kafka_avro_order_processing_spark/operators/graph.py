"""Connected components — clustering pairwise near-duplicates into
canonical groups (the dedup endgame: pairs -> clusters -> one canonical
doc per cluster).

Iterative min-label propagation (the standard Pregel-style formulation):
every node repeatedly adopts the smallest label among itself and its
neighbors; at fixed point each component carries its minimum node id.
This is one of the few genuinely iterative operators — the driver loop
re-plans a bounded number of join+aggregate rounds and checks
convergence with a count (an explicitly sanctioned driver action for
iterative algorithms; each round is fully distributed).

Scale notes: rounds needed = graph diameter (near-dup components are
shallow — usually 2-4 rounds).  Each round is one shuffle join on the
edge list + one min-aggregate.  For web-scale graphs swap in the
large-star/small-star algorithm (Kiveris et al.) — same primitive ops,
fewer rounds on skewed degree distributions; persist labels per round
(done below) so lineage doesn't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rounds (Kiveris et al., 'Connected Components in MapReduce and
    Beyond') — the web-scale upgrade over plain min-label propagation:
    convergence is O(log n) rounds on ANY topology (a length-n chain
    needs n min-label rounds but ~log n star rounds), and each round is
    the same shuffle primitives (groupBy min + join on node).

    large-star(u): connect every strictly-larger neighbor of u to the
    minimum of u's closed neighborhood.  small-star(u): connect u and
    its smaller neighbors to that group's minimum.  At the fixed point
    the edge set IS the star (component-min -> member); same
    (node, component) contract as connected_components.
    """
    def _canon(e: DataFrame) -> DataFrame:
        # Undirected edge set in canonical (hi > lo) orientation.
        return (
            e.filter(F.col("x") != F.col("y"))
            .select(
                F.greatest("x", "y").alias("hi"),
                F.least("x", "y").alias("lo"),
            )
            .distinct()
        )

    def _fingerprint(e: DataFrame) -> tuple[int, int]:
        # Cheap set identity for the convergence test: count + an
        # order-independent hash sum (one aggregate per round, no
        # set-difference join).
        row = e.agg(
            F.count("*").alias("n"),
            # decimal sum: exact + order-independent + cannot overflow
            # (a long sum trips ANSI overflow on large hash values)
            F.coalesce(
                F.sum(F.xxhash64("hi", "lo").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return row["n"], int(row["h"])

    cur = _canon(
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
    ).localCheckpoint(eager=True)
    fp = _fingerprint(cur)
    stable_rounds = 0
    for i in range(max_iterations):
        if i % 2 == 0:
            # large-star: needs the SYMMETRIC adjacency; for each node u
            # with closed-neighborhood min m, attach every strictly
            # larger neighbor v directly to m.
            sym = cur.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
                cur.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
            )
            m = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
            out = (
                sym.filter(F.col("v") > F.col("u"))
                .join(m, "u")
                .select(F.col("v").alias("x"), F.col("m").alias("y"))
            )
        else:
            # small-star: needs the CANONICAL orientation; for each node
            # hi with smaller-neighbor min m, attach hi and all its
            # smaller neighbors to m.
            m = cur.groupBy("hi").agg(F.min("lo").alias("m"))
            out = (
                cur.join(m, "hi")
                .select(F.col("lo").alias("x"), F.col("m").alias("y"))
                .unionByName(
                    m.select(F.col("hi").alias("x"), F.col("m").alias("y"))
                )
            )
        nxt = _canon(out).localCheckpoint(eager=True)
        nfp = _fingerprint(nxt)
        if nfp == fp:
            # Stable under one phase can still change under the other
            # (a star is large-star-stable mid-convergence); require a
            # full large+small cycle with no change.
            stable_rounds += 1
            if stable_rounds >= 2:
                cur = nxt
                break
        else:
            stable_rounds = 0
        cur, fp = nxt, nfp

    # Fixed point: every edge is (member, component-min).  Union with
    # self-labels for EVERY input node (roots, and nodes whose only
    # edges were self-loops — the canonical form drops those edges but
    # the node must still be labeled, matching connected_components).
    members = cur.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    return members.unionByName(nodes).groupBy("node").agg(
        F.min("component").alias("component")
    )


# Fixed-point PageRank scale: ranks are carried as integer multiples of
# 2^-30 (SCALE = 2^30).  Integer arithmetic is associative and exact, so
# the iteration is independent of partial-aggregation order AND
# reproducible bit-for-bit by an ANSI SQL oracle — a plain double
# PageRank is neither (float sums over in-neighbors depend on shuffle
# order).  Envelope: with n nodes, any in-neighbor contribution sum is
# <= n * SCALE, and the 17x damping product must stay exactly
# representable in the portable floor-division below (< 2^53): safe to
# n ~ 2^19 nodes at SCALE 2^30.  Production graphs beyond that swap the
# BIGINT sums for DECIMAL(38,0) — same algebra, wider envelope.
PAGERANK_SCALE = 1 << 30


def _idiv(a, b):
    """Exact floor division of non-negative integers, portable across
    engines: a % b is exact, the difference is an exact multiple of b,
    and the double division of two exact integers <= 2^53 is exact."""
    return F.expr(f"CAST(({a} - ({a} % {b})) / {b} AS BIGINT)")


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-point PageRank: `iterations` power rounds with damping
    0.85 over a directed edge list, every quantity an exact integer.

    rank_0(v) = SCALE;  rank_{i+1}(v) = floor(0.15 * SCALE)
        + floor(17 * sum_{u->v} floor(rank_i(u) / deg(u)) / 20).

    Every node must have at least one out-edge (feed a symmetrised
    relationship graph, or pre-drop dangling nodes); deg is out-degree.
    Returns (node, degree, rank_scaled) for every source node.

    Scale shape: each round is one shuffle join of the edge list with
    the rank table on src (at production scale: pre-partition BOTH on
    src once — co-partitioned, the join is shuffle-free every round)
    plus one keyed sum with map-side partials; lineage is cut per round
    (localCheckpoint, the iterative-operator rule).  Rounds are O(1)
    state per node — no unbounded buffers, no driver-side graph.
    """
    base = (3 * PAGERANK_SCALE) // 20
    deg = (
        edges.groupBy(F.col(src).alias("node"))
        .agg(F.count("*").alias("degree"))
        .localCheckpoint(eager=True)
    )
    ranks = deg.select(
        "node", F.lit(PAGERANK_SCALE).cast("long").alias("rank_scaled")
    )
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.e_src == ranks.node)
            .join(deg.select(F.col("node").alias("d_node"), "degree"),
                  F.col("e_src") == F.col("d_node"))
            .select(
                F.col("e_dst").alias("node"),
                _idiv("rank_scaled", "degree").alias("contrib"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("contrib").alias("s"))
        ranks = (
            deg.select("node")
            .join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + _idiv(f"(17 * {'coalesce(s, 0L)'})", "20")
                ).alias("rank_scaled"),
            )
            .localCheckpoint(eager=True)
        )
    return deg.join(ranks, "node").select("node", "degree", "rank_scaled")


# Weighted PageRank scale: rank * edge-weight must stay exactly
# representable in the portable floor division (< 2^53), so the
# weighted variant runs at a coarser 2^20 fixed point.  Envelope:
# total mass n * 2^20, times max edge weight w — safe while
# n * w < 2^29 (e.g. 2^17 nodes with weights < 2^12); beyond that,
# DECIMAL(38,0) (same algebra).
PAGERANK_W_SCALE = 1 << 20


def pagerank_weighted(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Weighted fixed-point PageRank: mass flows along each out-edge in
    proportion to its integer weight —
    rank_{i+1}(v) = floor(0.15*S) + floor(17 * sum_{u->v}
        floor(rank_i(u) * w(u,v) / W(u)) / 20),
    W(u) the sum of u's outgoing weights.  Same exact-integer contract
    as ``pagerank`` (shuffle-order independent, oracle-reproducible);
    weights must be positive integers.  Returns
    (node, total_weight, rank_scaled)."""
    base = (3 * PAGERANK_W_SCALE) // 20
    wsum = (
        edges.groupBy(F.col(src).alias("node"))
        .agg(F.sum(F.col(weight)).cast("long").alias("total_weight"))
        .localCheckpoint(eager=True)
    )
    ranks = wsum.select(
        "node", F.lit(PAGERANK_W_SCALE).cast("long").alias("rank_scaled")
    )
    e = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
        F.col(weight).cast("long").alias("w"),
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.e_src == ranks.node)
            .join(
                wsum.select(F.col("node").alias("d_node"), "total_weight"),
                F.col("e_src") == F.col("d_node"),
            )
            .select(
                F.col("e_dst").alias("node"),
                _idiv("(rank_scaled * w)", "total_weight").alias("contrib"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("contrib").alias("s"))
        ranks = (
            wsum.select("node")
            .join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + _idiv("(17 * coalesce(s, 0L))", "20")
                ).alias("rank_scaled"),
            )
            .localCheckpoint(eager=True)
        )
    return wsum.join(ranks, "node").select("node", "total_weight", "rank_scaled")


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. '07): every node starts as its own label; each round every
    node adopts the most frequent label among its neighbors, ties
    broken by the smallest label — a TOTAL order, which makes the
    rounds deterministic (classic LPA breaks ties randomly and is
    famously irreproducible; the deterministic variant is what a
    verifiable pipeline wants).  Fixed round count: LPA's fixed point
    can oscillate under synchronous update, so the contract is "the
    label state after N rounds", which the oracle reproduces exactly.

    Scale shape per round: one shuffle join of the (static, symmetric)
    edge list with the label table on the neighbor key + one keyed
    count + one per-node window on the vote table (rows = distinct
    labels per node, bounded by degree); lineage cut per round.  The
    edge table is reused every round — at production scale persist it
    partitioned on the join key once.

    Returns (node, community) for every node in the input.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    from pyspark.sql import Window

    for _ in range(iterations):
        votes = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a"), F.col("label"))
            .agg(F.count("*").alias("cnt"))
        )
        w = Window.partitionBy("a").orderBy(F.desc("cnt"), F.asc("label"))
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("a").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))


def k_core(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core membership by synchronous peeling (Seidman '83): each
    round recomputes degrees over the surviving induced subgraph and
    drops every node with degree < k — the standard graph-cohesion
    filter (a node in the 3-core has 3 neighbors that THEMSELVES are
    well-connected, which a raw degree threshold cannot express).

    Like the deterministic LPA, the contract is the state after
    ``rounds`` FIXED peel rounds (full peeling runs until no node
    drops; a fixed count makes the result oracle-reproducible and
    bounds the job — shallow graphs converge in a handful of rounds,
    and the suite pins convergence on its test topologies).  Returns
    (node, in_core) for EVERY node with at least one non-self edge.

    Scale shape per round: one degree aggregate over the symmetric
    view + two semi-joins inducing the surviving edge set — all keyed
    shuffles on node ids, lineage cut per round; no per-node state
    beyond the current edge list.
    """
    und = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = und.select(F.col("lo").alias("node")).unionByName(
        und.select(F.col("hi").alias("node"))
    ).distinct()
    cur = und
    keep = nodes.select(F.col("node").alias("n"))
    for _ in range(rounds):
        sym = cur.select(F.col("lo").alias("n")).unionByName(
            cur.select(F.col("hi").alias("n"))
        )
        deg = sym.groupBy("n").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= k).select("n").localCheckpoint(eager=True)
        cur = (
            cur.join(keep.select(F.col("n").alias("lo")), "lo", "leftsemi")
            .join(keep.select(F.col("n").alias("hi")), "hi", "leftsemi")
            .localCheckpoint(eager=True)
        )
    return nodes.join(
        keep.select(F.col("n").alias("node"), F.lit(True).alias("in_core")),
        "node",
        "left",
    ).select("node", F.coalesce(F.col("in_core"), F.lit(False)).alias("in_core"))


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    community: str = "community",
) -> DataFrame:
    """Per-community Newman modularity decomposition of a partition —
    the standard "is this community structure real?" score for the
    output of :func:`label_propagation`.

    Q = sum_c [ L_c / m  -  (d_c / 2m)^2 ]   (Newman & Girvan 2004),
    with m undirected edges, L_c intra-community edges and d_c the sum
    of member degrees.  Every output column is an exact integer so the
    score is shuffle-order independent and oracle-reproducible:
    ``contrib_num = 4*m*L_c - d_c^2`` and ``denom = 4*m^2``, giving
    Q = sum(contrib_num) / denom exactly (same rationale as the
    fixed-point PageRank — float modularity depends on summation
    order).  Envelope: d_c <= 2m, so d_c^2 <= 4m^2 must fit a BIGINT —
    safe to m ~ 2^30 edges; beyond that swap the products for
    DECIMAL(38,0) (same algebra).

    `labels` must cover every node appearing in `edges` (the
    :func:`label_propagation` contract); edges are undirected,
    self-loops dropped.  The single driver-side scalar is m (one
    count — the sanctioned literal-for-iterative-algebra pattern, like
    the k-means centroid literals); everything else is two shuffle
    joins of the edge list with the (node, community) table plus keyed
    integer aggregates — no per-community state beyond one row.
    """
    und = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m = und.count()  # driver scalar: the exact-integer algebra needs m as a literal
    sym = und.select(F.col("lo").alias("n")).unionByName(
        und.select(F.col("hi").alias("n"))
    )
    deg = sym.groupBy("n").agg(F.count("*").alias("d"))
    memb = labels.select(F.col(node).alias("n"), F.col(community).alias("c"))
    intra = (
        und.join(
            memb.select(F.col("n").alias("lo"), F.col("c").alias("c_lo")), "lo"
        )
        .join(memb.select(F.col("n").alias("hi"), F.col("c").alias("c_hi")), "hi")
        .filter(F.col("c_lo") == F.col("c_hi"))
        .groupBy(F.col("c_lo").alias("community"))
        .agg(F.count("*").alias("intra_edges"))
    )
    # Left join: a label table wider than the edge list (isolated nodes)
    # still counts those members, with zero degree — keeping n_members
    # the per-community member count, not the per-community
    # edge-touching-member count.
    degsum = (
        memb.join(deg, "n", "left")
        .groupBy(F.col("c").alias("community"))
        .agg(
            F.count("*").alias("n_members"),
            F.sum(F.coalesce(F.col("d"), F.lit(0))).cast("long").alias("degree_sum"),
        )
    )
    return degsum.join(intra, "community", "left").select(
        "community",
        "n_members",
        F.coalesce(F.col("intra_edges"), F.lit(0)).cast("long").alias("intra_edges"),
        "degree_sum",
        (
            F.lit(4 * m).cast("long")
            * F.coalesce(F.col("intra_edges"), F.lit(0)).cast("long")
            - F.col("degree_sum") * F.col("degree_sum")
        ).alias("contrib_num"),
        F.lit(4 * m * m).cast("long").alias("denom"),
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts via degree-ordered orientation (the
    MapReduce-clique pattern of Suri & Vassilvitskii, WWW'11): orient
    every undirected edge from its (degree, id)-smaller endpoint to the
    larger, enumerate wedges u->v, u->w only from each node's oriented
    out-list, and close them against the oriented edge set — each
    triangle is produced exactly once, at its smallest-degree vertex.

    Why this is the at-scale shape: a naive wedge join explodes on hub
    nodes (a degree-10^6 node yields 10^12 wedges); orientation bounds
    every out-degree by O(sqrt(m)), so total wedge volume is O(m^1.5)
    worst case — the optimal bound — and both the wedge self-join and
    the closing join are plain shuffle joins on node keys (AQE handles
    residual skew).  All counts are integers: exact, associative,
    hash-oracle-able.

    Returns (node, n_triangles) for EVERY node in the input, zeros
    included.
    """
    und = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = und.select(F.col("lo").alias("n"), F.col("hi").alias("m")).unionByName(
        und.select(F.col("hi").alias("n"), F.col("lo").alias("m"))
    )
    deg = sym.groupBy("n").agg(F.count("*").alias("d"))
    # Orient: (d, node) lexicographic — a total order, so exactly one
    # direction per edge.
    oriented = (
        und.join(deg.select(F.col("n").alias("lo"), F.col("d").alias("dlo")), "lo")
        .join(deg.select(F.col("n").alias("hi"), F.col("d").alias("dhi")), "hi")
        .select(
            F.when(
                (F.col("dlo") < F.col("dhi"))
                | ((F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))),
                F.struct(F.col("lo").alias("a"), F.col("hi").alias("b")),
            )
            .otherwise(F.struct(F.col("hi").alias("a"), F.col("lo").alias("b")))
            .alias("e")
        )
        .select("e.a", "e.b")
        .localCheckpoint(eager=True)
    )
    e1 = oriented.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = oriented.select(F.col("a").alias("u"), F.col("b").alias("w"))
    # v < w by node id dedups the two wedge permutations; the closing
    # edge is re-canonicalized to the same id order so the close is a
    # plain EQUI-join (an OR of flipped equality pairs would force a
    # nested-loop plan).
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    closing = oriented.select(
        F.least("a", "b").alias("v"), F.greatest("a", "b").alias("w")
    )
    tris = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    per_node = (
        tris.select(F.col("u").alias("node"))
        .unionByName(tris.select(F.col("v").alias("node")))
        .unionByName(tris.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = sym.select(F.col("n").alias("node")).distinct()
    return nodes.join(per_node, "node", "left").select(
        "node",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Component assignment for every node appearing in `edges`.

    Returns (node, component) where component = min node id reachable.
    Edges are treated as undirected.
    """
    # localCheckpoint (not persist) per round: persist caches partitions
    # but KEEPS the lineage, so after r rounds the logical plan nests r
    # join trees and Catalyst re-optimizes an exponentially growing tree
    # every iteration — measured driver OOM near round 20 on a
    # long-chain graph.  Checkpointing truncates the plan to the
    # materialized result each round; the checkpointed partitions are
    # released when Python drops the reference.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


# All-pairs cap per co-activity bucket; hot buckets emit a star instead.
# Sized above the densest bucket observed at the test SFs (42 users at
# sf0.1) so small-scale semantics are unchanged, while a production
# bucket with 10^5 co-active users emits O(n) star edges, never O(n^2).
MAX_COACTIVITY_BUCKET = 128


def co_activity_edges(
    occupancy: DataFrame,
    bucket_cols: tuple[str, ...] | list[str],
    id_col: str = "user_id",
    max_bucket_size: int = MAX_COACTIVITY_BUCKET,
) -> DataFrame:
    """Undirected co-activity edge list (src < dst): two ids become an
    edge when they share a bucket (e.g. the same 10-minute window, or
    the same 2-minute window AND event type).

    `occupancy` must be DISTINCT on (*bucket_cols, id_col) — the
    bucket membership relation, not raw events.

    Hot-bucket cap (the same guard lsh_candidate_pairs applies to LSH
    buckets, operators/dedup.py): the naive per-bucket self-join is
    quadratic in bucket occupancy, so a single bucket with 10^5
    co-active users would emit ~5*10^9 pairs.  Buckets larger than
    `max_bucket_size` instead emit a STAR — every member paired with
    the bucket's minimum id — O(bucket) edges that keep the bucket's
    members transitively connected (diameter 2, so connected
    components / label propagation still see one cohesive group);
    triangle counts and k-core degrees within capped buckets become a
    documented under-count, the standard price of candidate capping.
    The rule is deterministic (count + min), so the DuckDB oracles
    mirror it exactly.

    Shape: one partial-aggregated groupBy for bucket stats, a
    join-back reusing the bucket-key partitioning (AQE broadcasts the
    stats side when small), then the bounded self-join on small
    buckets plus the linear star branch.
    """
    keys = list(bucket_cols)
    stats = occupancy.groupBy(*keys).agg(
        F.count("*").alias("bucket_n"), F.min(id_col).alias("min_id")
    )
    sized = occupancy.join(stats, keys)
    small = sized.filter(F.col("bucket_n") <= max_bucket_size)
    all_pairs = (
        small.select(*keys, F.col(id_col).alias("src"))
        .join(small.select(*keys, F.col(id_col).alias("dst")), keys)
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    starred = (
        sized.filter(
            (F.col("bucket_n") > max_bucket_size)
            & (F.col(id_col) != F.col("min_id"))
        )
        .select(F.col("min_id").alias("src"), F.col(id_col).alias("dst"))
    )
    return all_pairs.unionByName(starred).distinct()


def label_propagation_auto(
    edges: DataFrame,
    max_iterations: int = 10,
    patience: int = 1,
    src: str = "src",
    dst: str = "dst",
):
    """Label propagation with modularity-guided round selection: run
    synchronous deterministic LPA rounds (same vote/tie rules as
    :func:`label_propagation`) and stop when Newman modularity Q of
    the partition stops improving for `patience` consecutive rounds,
    returning the best round's labels.

    Q is compared EXACTLY: with m fixed across rounds, Q ranks as the
    integer S = sum_c(4*m*L_c - d_c^2) over the constant denominator
    4*m^2 — so "stopped improving" is integer comparison, never a
    float-epsilon judgement call (the same rationale as the all-integer
    :func:`modularity` contract).  One driver scalar per round (S),
    the sanctioned pattern connected_components uses for its
    convergence count.

    The static per-graph tables (symmetric edges, canonical edges,
    degrees, m) are computed ONCE and checkpointed; each round adds
    only the LPA vote join plus two label⋈edge joins for S.

    Returns (labels, best_round, history): labels is the best round's
    (node, community) DataFrame, best_round its 1-based round index,
    history the list of S values per round.
    """
    from pyspark.sql import Window

    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    und = (
        sym.filter(F.col("a") < F.col("b"))
        .select(F.col("a").alias("lo"), F.col("b").alias("hi"))
        .localCheckpoint(eager=True)
    )
    m = und.count()
    deg = (
        sym.groupBy(F.col("a").alias("n"))
        .agg(F.count("*").alias("d"))
        .localCheckpoint(eager=True)
    )

    def _q_numerator(lab: DataFrame) -> int:
        memb = lab.select(F.col("node").alias("n"), F.col("label").alias("c"))
        intra = (
            und.join(
                memb.select(F.col("n").alias("lo"), F.col("c").alias("c_lo")),
                "lo",
            )
            .join(
                memb.select(F.col("n").alias("hi"), F.col("c").alias("c_hi")),
                "hi",
            )
            .filter(F.col("c_lo") == F.col("c_hi"))
            .groupBy(F.col("c_lo").alias("c"))
            .agg(F.count("*").alias("lc"))
        )
        degsum = (
            memb.join(deg, "n", "left")
            .groupBy("c")
            .agg(
                F.sum(F.coalesce(F.col("d"), F.lit(0)))
                .cast("long")
                .alias("dc")
            )
        )
        row = (
            degsum.join(intra, "c", "left")
            .select(
                (
                    F.lit(4 * m).cast("long")
                    * F.coalesce(F.col("lc"), F.lit(0)).cast("long")
                    - F.col("dc") * F.col("dc")
                ).alias("num")
            )
            .agg(F.sum("num").cast("long").alias("s"))
            .collect()[0]
        )
        return int(row["s"] or 0)

    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    best_labels, best_s, best_round = None, None, 0
    history: list[int] = []
    stale = 0
    for i in range(1, max_iterations + 1):
        votes = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a"), F.col("label"))
            .agg(F.count("*").alias("cnt"))
        )
        w = Window.partitionBy("a").orderBy(F.desc("cnt"), F.asc("label"))
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("a").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
        s = _q_numerator(labels)
        history.append(s)
        if best_s is None or s > best_s:
            best_labels, best_s, best_round = labels, s, i
            stale = 0
        else:
            stale += 1
            if stale >= patience:
                break
    return (
        best_labels.select("node", F.col("label").alias("community")),
        best_round,
        history,
    )


def k_core_converged(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 50,
    src: str = "src",
    dst: str = "dst",
):
    """k-core by peeling to the FIXED POINT: rounds continue until the
    surviving edge set stops changing (full Seidman peeling), bounded
    by `max_rounds`.  The registered query keeps :func:`k_core`'s
    fixed-round contract (oracle-reproducible); this variant is for
    callers who need the true core — e.g. a chain of length L hanging
    off a clique peels one link per round, so any fixed count
    under-peels some topology.

    Convergence is detected with the connected_components_star
    fingerprint (count + order-independent hash sum — one aggregate
    per round, no set-difference join), one driver scalar per round.

    Returns (labels, rounds_used): labels is (node, in_core) for every
    node with a non-self edge; rounds_used counts executed peel rounds
    including the final no-change confirmation round.
    """
    und = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = und.select(F.col("lo").alias("node")).unionByName(
        und.select(F.col("hi").alias("node"))
    ).distinct()

    def _fp(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("hi", "lo").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return row["n"], int(row["h"])

    cur = und
    keep = nodes.select(F.col("node").alias("n"))
    fp = _fp(cur)
    rounds_used = 0
    for _ in range(max_rounds):
        rounds_used += 1
        sym = cur.select(F.col("lo").alias("n")).unionByName(
            cur.select(F.col("hi").alias("n"))
        )
        deg = sym.groupBy("n").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= k).select("n").localCheckpoint(eager=True)
        cur = (
            cur.join(keep.select(F.col("n").alias("lo")), "lo", "leftsemi")
            .join(keep.select(F.col("n").alias("hi")), "hi", "leftsemi")
            .localCheckpoint(eager=True)
        )
        nfp = _fp(cur)
        if nfp == fp:
            break
        fp = nfp
    labels = nodes.join(
        keep.select(F.col("n").alias("node"), F.lit(True).alias("in_core")),
        "node",
        "left",
    ).select("node", F.coalesce(F.col("in_core"), F.lit(False)).alias("in_core"))
    return labels, rounds_used
