"""Embedding similarity search over array<float> columns.

Brute-force cosine top-k as the verifiable baseline, with the scale
path (IVF-style partition pruning) layered on the same kernel.

Determinism: the dot product is a sequential left fold in float64
(F.aggregate), which bit-matches DuckDB's list_sum over an explicitly
double-cast list_transform — verified empirically — so cosine scores
hash-match the oracle with no tolerance.

Scale notes (100 TB of vectors):
- queries are broadcast (small side), candidates stream — no shuffle of
  the big side at all for brute force; compute is one codegen'd
  expression over the scan.
- ranking is per-query top-k via window row_number (shuffle on
  query_id only, k rows survive per query).
- the IVF variant assigns each vector to its nearest of c centroids at
  write time (partition column), so a query probes only its cell's
  partitions — classic partition pruning.

Zero-norm contract: cosine is undefined for all-zero vectors (0/0 is
an ANSI division error under Spark's default ansi mode).
`embedding_lsh_near_dup` excludes them up front (they also pollute one
LSH bucket per band); the other entry points assume non-degenerate
input — pre-filter degenerate corpora with
``with_norm(df).filter(F.col("norm") > 0)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _spread

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"


def _dot(a: str, b: str) -> Column:
    return F.expr(DOT.format(a=a, b=b))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the L2 norm once per vector (reused across queries)."""
    return df.withColumn("norm", F.sqrt(_dot(vec_col, vec_col)))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for every query vector, the k nearest
    candidates by cosine similarity (excluding self), deterministic
    tie-break on candidate id."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("norm").alias("q_norm"),
    )
    # Candidate side: scale-adaptive spread (r14), same policy as the
    # dedup corpus pass.  At scale the scan's splits already provide
    # the parallelism and _spread skips — the scan streams straight
    # into the broadcast join, zero exchanges on the big side (the r13
    # shape, kept).  Only when the scan is NARROWER than the cluster
    # (the single-row-group bench parquet; any small input slice) does
    # the repartition engage the idle cores — r13 removed it outright
    # and the driver's bench read the all-overhead floor instead
    # (0.38 -> 0.55 s): the at-scale plan was right but local[32]
    # lost its parallelism with no data volume to hide the loss.
    c = with_norm(_spread(vectors, id_col), vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("norm").alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """IVF cell assignment: each vector -> nearest centroid by cosine
    (deterministic tie-break on centroid id).  At scale this is the
    write-time partitioning step; reads then prune to probed cells."""
    c = with_norm(centroids, vec_col).select(
        F.col(centroid_id),
        F.col(vec_col).alias("cent_vec"),
        F.col("norm").alias("cent_norm"),
    )
    v = with_norm(vectors, vec_col)
    scored = v.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        F.col(centroid_id),
        (_dot(vec_col, "cent_vec") / (F.col("norm") * F.col("cent_norm"))).alias("sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc(centroid_id))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, centroid_id)
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (Charikar '02 sign-random-projection) — the
# tokenless near-dup scale path: no blocking label needed, no all-pairs.
# ---------------------------------------------------------------------------

HYPERPLANE_BITS = 32
HYPERPLANE_BAND_ROWS = 8


def hyperplane_matrix(bits: int, dim: int) -> list:
    """Deterministic +-1 hyperplanes: sign j,i = parity of the first
    hex digit of md5("j:i").  A fixed sign matrix (Achlioptas-style
    +-1 entries) preserves the cosine-LSH guarantee, and determinism
    lets an ANSI oracle reproduce the exact buckets."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        for j in range(bits)
    ]


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    bits: int = HYPERPLANE_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector bit signature: bit j = sign of the projection onto
    hyperplane j, emitted as '1'/'0' string columns mh0..mh{bits-1} —
    the same signature shape dedup.lsh_candidate_pairs bands over, so
    the banding/hot-bucket machinery is shared with minhash.

    The hyperplanes are literal arrays baked into the plan (no
    dimension table, no join, nothing broadcast at runtime); each
    projection is a sequential float64 fold, bit-matching the oracle's
    list_sum.  At real scale the 10^2 folds/vector would move to one
    Arrow-batched pandas_udf matrix multiply — kept as expressions here
    because bit-for-bit oracle parity is worth more than the constant
    factor at test scale.
    """
    R = hyperplane_matrix(bits, dim)
    cols = []
    for j in range(bits):
        lits = ", ".join(f"{v}D" for v in R[j])
        proj = F.expr(
            f"aggregate(zip_with({vec_col}, array({lits}), "
            "(x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"
        )
        cols.append(
            F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")).alias(f"mh{j}")
        )
    return df.select(F.col(id_col), *cols)


def embedding_lsh_near_dup(
    df: DataFrame,
    dim: int = 64,
    bits: int = HYPERPLANE_BITS,
    band_rows: int = HYPERPLANE_BAND_ROWS,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup via hyperplane LSH: sign-bit signature ->
    banded buckets (4 bands x 8 bits: a random pair collides with
    p ~ 4/256, a cosine-0.8 pair with p ~ 0.6) -> candidate pairs
    (hot-bucket star cap shared with minhash) -> exact cosine verify.

    Unlike embedding_near_dup's label blocking, this needs NO metadata
    — the buckets come from the geometry, so it is the variant that
    runs on an unlabeled 100 TB corpus.  Candidates are a vanishing
    fraction of all pairs; only they pay the exact-cosine join.

    Zero-norm vectors are excluded up front: cosine is undefined for
    them (0/0 — ANSI division error), and their projections are all
    exactly 0, so their identical sign bits would collide them with
    each other AND pollute one bucket per band.
    """
    from .dedup import lsh_candidate_pairs

    df = with_norm(df, vec_col).filter(F.col("norm") > 0).drop("norm")
    sigs = hyperplane_signatures(df, dim, bits, id_col, vec_col).persist()
    caches: list = []
    pairs = lsh_candidate_pairs(
        sigs, id_col=id_col, k=bits, band_rows=band_rows, cache_into=caches
    )
    # Materialize the (tiny) candidate-pair table eagerly — mirrors
    # near_dup_pairs: the banding table's three consumers would
    # otherwise race to recompute the signature projection (and the
    # scan under it) inside the final job before the lazy caches fill.
    pairs = pairs.localCheckpoint(eager=True)
    emb = with_norm(df, vec_col)
    a = emb.select(
        F.col(id_col).alias("doc_a"),
        F.col(vec_col).alias("ea"),
        F.col("norm").alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("doc_b"),
        F.col(vec_col).alias("eb"),
        F.col("norm").alias("nb"),
    )
    cos = _dot("ea", "eb") / (F.col("na") * F.col("nb"))
    result = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.col("doc_a").alias("vec_a"),
            F.col("doc_b").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    out = result.localCheckpoint(eager=True)
    sigs.unpersist()
    for c in caches:
        c.unpersist()
    return out


# 2^52: scaling a float32-derived double by 2^52 is an exponent shift
# (exact) whose result is integral for any float32 magnitude >= 2^-29,
# making the double->DECIMAL(38,0) cast rounding-free in every engine.
MEAN_SCALE = 4503599627370496


def cell_means(assigned: DataFrame, elems: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Per-(cell, dim) member mean as an order-free exact aggregation:
    2^52-scaled DECIMAL(38,0) partial sums (associative — safe under
    any partial-aggregation order and any skew) divided once in
    float64.  O(1) aggregation state per group: a skewed cell with
    10^8 members costs the same buffer as one with 10."""
    return (
        assigned.join(elems, id_col)
        .groupBy("centroid_id", "dim")
        .agg(
            F.sum(
                F.expr(f"CAST(CAST(val AS DOUBLE) * {MEAN_SCALE}D AS DECIMAL(38,0))")
            ).alias("ssum"),
            F.count("*").alias("n"),
        )
        .select(
            "centroid_id",
            "dim",
            (
                F.col("ssum").cast("double")
                / (F.col("n").cast("double") * F.lit(float(MEAN_SCALE)))
            ).alias("mean"),
            F.col("n"),
        )
    )


def kmeans_refine(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means refinement of the IVF centroids: `iters`
    Lloyd rounds (cosine argmax assignment -> per-cell mean), seeded
    with the same vec_id<k convention the static IVF queries use.
    Returns one row per surviving cell: member count plus norm/sum
    digests of the refined centroid (scalar digests keep the oracle
    comparison away from cross-engine array-repr differences while
    still covering every component's bits).

    Determinism contract (what makes this hash-oracle-able):
    - assignment ties break on centroid id (shared with ivf_assign);
    - the per-(cell, dim) mean is an ORDER-FREE exact sum: each float32
      member value x is scaled by 2^52 — an exponent shift, exact in
      float64, and integral for any float32 with |x| >= 2^-29 (or 0) —
      then summed as DECIMAL(38,0).  Integer sums are associative, so
      partial aggregation order cannot change the result, and the
      integral-double -> decimal cast is rounding-free in both engines
      (a plain DECIMAL(38,18) cast is NOT — DuckDB's double->decimal
      conversion is itself float-rounded, measured mismatching Spark's
      in the low digits).  The mean is then one double divide by
      (n * 2^52), exact in both engines.
    - float addition is not associative, so a plain double SUM here
      would be partial-aggregation-order dependent; the previous
      design folded a collect_list(struct(id, x)) in vec_id order,
      which is order-stable but materializes an entire cell's values
      in ONE aggregation buffer — a skewed cell with 10^8 members is
      a ~GB buffer and an executor OOM.  The decimal partial sum keeps
      bit-exactness with O(1) state per (cell, dim) group.

    Input contract (the bounds under which the 2^52 trick is exact):
    vector components must be float32-representable with |x| >= 2^-29
    or exactly 0, and cell-wise sums of |x| * 2^52 must stay inside
    DECIMAL(38,0) (|x| <= ~10^22 even for 10^8-member cells — any
    real embedding satisfies this by orders of magnitude).  Outside
    the contract the engines' cast behaviors differ (Spark rounds /
    nulls on overflow, DuckDB rounds-half-even / errors) and results
    may silently diverge from an external oracle; normalize or clamp
    such inputs upstream.  A clamp is deliberately NOT applied here —
    it would have to be mirrored in every consumer's oracle to keep
    hash parity, for inputs no embedding model produces.

    Scale shape: each round is one broadcast-assign (k rows broadcast,
    argmax inline) + one explode + two keyed aggregations with
    map-side partials — no all-pairs anything, no unbounded buffers;
    lineage is cut per round (localCheckpoint, the iterative-operator
    rule) so plans stay O(1) deep.
    """
    elems = vectors.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("dim", "val")
    ).persist()
    cents = vectors.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias(vec_col)
    )
    for _ in range(iters):
        assigned = ivf_assign(vectors, cents, id_col=id_col, vec_col=vec_col)
        per = cell_means(assigned, elems, id_col)
        cents = (
            per.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mean"))),
                    lambda s: s["mean"],
                ).alias(vec_col),
                F.max("n").alias("n_members"),
            )
            .localCheckpoint(eager=True)
        )
    elems.unpersist()
    return cents.select(
        F.col("centroid_id").alias("cell_id"),
        F.col("n_members"),
        F.sqrt(_dot(vec_col, vec_col)).alias("centroid_norm"),
        F.expr(f"aggregate({vec_col}, 0D, (acc, v) -> acc + v)").alias("centroid_sum"),
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011) — the memory-scale ANN path: vectors
# compress to m code bytes (here 4 sub-spaces x 8 codes = 4 small ints
# per 64-dim vector, a 64x compression), and search runs against the
# codes via an Asymmetric Distance Computation lookup table, never
# touching the raw corpus vectors.
# ---------------------------------------------------------------------------

PQ_SUBSPACES = 4
PQ_CODES = 8
# Query-set size shared by every PQ/brute-force ANN query and oracle:
# the "first N vectors are the queries" convention.  Registry plans and
# their SQL oracles derive the vec_id predicate from THIS constant, so
# shortlist and exact-rescore query sets cannot silently diverge.
PQ_N_QUERIES = 5


def pq_subvectors(
    vectors: DataFrame,
    dim: int,
    m: int = PQ_SUBSPACES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Split each vector into ``m`` contiguous sub-vectors (float64):
    one row per (vector, sub-space).  dim must divide evenly by m."""
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    sd = dim // m
    subs = F.expr(
        f"transform(sequence(0, {m - 1}),"
        f" s -> transform(slice({vec_col}, s * {sd} + 1, {sd}),"
        " x -> cast(x as double)))"
    )
    return vectors.select(
        F.col(id_col), F.posexplode(subs).alias("sub", "svec")
    )


_SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " 0D, (acc, v) -> acc + v)"
)


def _pq_assign(sub: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest code per (vector, sub-space) by L2 distance; the fold is
    sequential in dim order (bit-matches the oracle's list_sum), ties
    break on code id."""
    scored = sub.join(F.broadcast(cents), "sub").select(
        F.col(id_col),
        "sub",
        "code",
        F.expr(_SQDIST.format(a="svec", b="cent")).alias("dist"),
    )
    w = Window.partitionBy(id_col, "sub").orderBy(F.asc("dist"), F.asc("code"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "sub", "code")
    )


def pq_codebooks(
    sub: DataFrame,
    k: int = PQ_CODES,
    id_col: str = "vec_id",
    seed_lo: int = 0,
) -> DataFrame:
    """Per-sub-space codebooks: k seed centroids (the sub-vectors with
    seed_lo <= id < seed_lo + k — same seeding convention as the IVF
    queries, with `seed_lo` for callers whose low ids are degenerate:
    residual encoding's ids < n_cells ARE the IVF centroids, so their
    residuals are identically zero and would collapse the codebook to
    one code) and ONE Lloyd refinement round.  Returns
    (sub, code, cent: array<double>).

    The per-(sub, code, dim) member mean uses the 2^52-scaled
    DECIMAL(38,0) partial-sum trick (see kmeans_refine's determinism
    contract): order-free, O(1) aggregation state, and bit-identical
    across engines."""
    seeds = sub.filter(
        (F.col(id_col) >= seed_lo) & (F.col(id_col) < seed_lo + k)
    ).select(
        "sub", (F.col(id_col) - seed_lo).alias("code"), F.col("svec").alias("cent")
    )
    assigned = _pq_assign(sub, seeds, id_col)
    elems = sub.select(
        F.col(id_col), "sub", F.posexplode("svec").alias("dim", "val")
    )
    means = (
        assigned.join(elems, [id_col, "sub"])
        .groupBy("sub", "code", "dim")
        .agg(
            F.sum(
                F.expr(f"CAST(val * {MEAN_SCALE}D AS DECIMAL(38,0))")
            ).alias("ssum"),
            F.count("*").alias("n"),
        )
        .select(
            "sub",
            "code",
            "dim",
            (
                F.col("ssum").cast("double")
                / (F.col("n").cast("double") * F.lit(float(MEAN_SCALE)))
            ).alias("mean"),
        )
    )
    return means.groupBy("sub", "code").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean"))),
            lambda s: s["mean"],
        ).alias("cent")
    )


def pq_topk(
    vectors: DataFrame,
    dim: int,
    m: int = PQ_SUBSPACES,
    k: int = PQ_CODES,
    n_queries: int = PQ_N_QUERIES,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-compressed top-k search: train codebooks, encode the corpus
    to (vec, sub) -> code, then answer the first ``n_queries`` vectors
    by ADC — each query builds an m x k lookup table of exact
    sub-distances to the codebook, and a candidate's distance is the
    SUM of its codes' table entries (pivoted to fixed sub-space order
    so the float adds are order-deterministic).

    Scale shape: the corpus is touched exactly twice (train assign +
    encode), both broadcast joins against m*k codebook rows with
    map-side-partial aggregation; search itself never reads a corpus
    vector — it joins the (tiny) per-query LUT against the code table,
    shuffling only query_id for the final top-k window.  At 100 TB the
    code table is ~1/64 the corpus size and the LUT is literally m*k
    rows per query; this is why PQ is the in-memory ANN standard.
    """
    sub = pq_subvectors(vectors, dim, m, id_col, vec_col).persist()
    cents = F.broadcast(pq_codebooks(sub, k, id_col).localCheckpoint(eager=True))
    codes = _pq_assign(sub, cents, id_col)
    q = sub.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), "sub", F.col("svec").alias("qvec")
    )
    lut = q.join(cents, "sub").select(
        "query_id",
        "sub",
        "code",
        F.expr(_SQDIST.format(a="qvec", b="cent")).alias("dist"),
    )
    per_sub = codes.join(
        F.broadcast(lut.localCheckpoint(eager=True)), ["sub", "code"]
    ).select(F.col(id_col).alias("neighbor_id"), "query_id", "sub", "dist")
    # Pivot sub-space distances to columns and add in FIXED order:
    # float addition is not associative, so a groupBy SUM would be
    # partial-order-dependent; d0 + d1 + ... + d{m-1} is one
    # deterministic expression in both engines.
    pivoted = per_sub.groupBy("query_id", "neighbor_id").agg(
        *[
            F.max(F.when(F.col("sub") == s, F.col("dist"))).alias(f"d{s}")
            for s in range(m)
        ]
    )
    adc = pivoted.select(
        "query_id",
        "neighbor_id",
        sum([F.col(f"d{s}") for s in range(1, m)], F.col("d0")).alias("adc_dist"),
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    out = (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            "adc_dist",
            F.col("rank").cast("int").alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    sub.unpersist()
    return out


def semantic_dedup(
    vectors: DataFrame,
    k: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-then-prune semantic deduplication (the SemDeDup shape,
    Abbas et al. '23): vectors assign to their nearest of ``k``
    centroids (cosine, deterministic tie-break — the same assignment
    the IVF queries use, seeded ``vec_id < k``), and near-duplicate
    pruning runs ONLY within each cell — pairwise cosine against
    cluster peers, never the whole corpus.  A vector drops when some
    LOWER-id cell peer sits within ``threshold`` cosine of it (the
    monotone higher-id-drops rule every dedup operator here shares,
    which makes the dropped set independent of evaluation order).

    Returns one row per cell: member count, dropped count, and the
    dropped-id sum — an integer digest that pins exact dropped-set
    membership for the oracle without emitting any floats.

    Scale shape (why this is the 100 TB semantic-dedup path): the
    all-pairs comparison that brute-force semantic dedup needs is
    quadratic in corpus size; clustering first makes it quadratic in
    CELL size (k grows with the corpus, cells stay bounded).  The
    plan is one broadcast-assign (k centroid rows), one shuffle on
    cell id for the self-join (AQE skew-splits hot cells), partial+
    final aggregation for the summary.  No corpus-wide window, no
    driver-side state; at real scale the refined centroids come from
    ``kmeans_refine`` and cells land as write-time partitions.
    """
    m = with_norm(vectors, vec_col).join(
        ivf_assign(
            vectors,
            vectors.filter(F.col(id_col) < k).select(
                F.col(id_col).alias("centroid_id"), F.col(vec_col).alias(vec_col)
            ),
            id_col=id_col,
            vec_col=vec_col,
        ),
        id_col,
    ).select(
        F.col(id_col),
        F.col("centroid_id").alias("cell_id"),
        F.col(vec_col),
        F.col("norm"),
    )
    n_par = vectors.sparkSession.sparkContext.defaultParallelism
    a = m.repartition(n_par, F.col("cell_id")).select(
        F.col(id_col).alias("ia"), F.col("cell_id"),
        F.col(vec_col).alias("ea"), F.col("norm").alias("na"),
    )
    b = m.select(
        F.col(id_col).alias("ib"), F.col("cell_id"),
        F.col(vec_col).alias("eb"), F.col("norm").alias("nb"),
    )
    dropped = (
        a.join(b, ["cell_id"])
        .filter(F.col("ia") < F.col("ib"))
        .filter(
            (_dot("ea", "eb") / (F.col("na") * F.col("nb"))) >= F.lit(threshold)
        )
        .select("cell_id", "ib")
        .distinct()
    )
    members = m.groupBy("cell_id").agg(F.count("*").alias("n_members"))
    drops = dropped.groupBy("cell_id").agg(
        F.count("*").alias("n_dropped"), F.sum("ib").alias("dropped_id_sum")
    )
    return (
        members.join(drops, "cell_id", "left")
        .select(
            "cell_id",
            "n_members",
            F.coalesce(F.col("n_dropped"), F.lit(0)).cast("long").alias("n_dropped"),
            F.coalesce(F.col("dropped_id_sum"), F.lit(0)).cast("long").alias("dropped_id_sum"),
        )
    )


def _cosine_verify(
    df: DataFrame,
    pairs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine verification of a candidate pair table — the
    shared tail of the LSH near-dup variants: only candidates pay the
    full-vector join."""
    emb = with_norm(df, vec_col)
    a = emb.select(
        F.col(id_col).alias("doc_a"),
        F.col(vec_col).alias("ea"),
        F.col("norm").alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("doc_b"),
        F.col(vec_col).alias("eb"),
        F.col("norm").alias("nb"),
    )
    cos = _dot("ea", "eb") / (F.col("na") * F.col("nb"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.col("doc_a").alias("vec_a"),
            F.col("doc_b").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def hyperplane_probe_rows(
    df: DataFrame,
    dim: int,
    bits: int = HYPERPLANE_BITS,
    band_rows: int = HYPERPLANE_BAND_ROWS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe band rows (Lv et al., "Multi-Probe LSH", VLDB'07):
    per band, the exact bucket PLUS one probe bucket with the band's
    minimum-|projection| bit flipped — the bit most likely to be on
    the wrong side of its hyperplane for a true near neighbor.  Probes
    multiply each vector's bucket LOOKUPS (not the index size: probes
    carry kind='p' and only ever join against exact rows), which is
    the technique's point — recall of extra hash tables at the memory
    cost of none.

    Returns (id, band_id, band_val, kind) with kind 'e' (exact) or
    'p' (probe); ties in the margin argmin break on the lowest bit
    index (deterministic).
    """
    R = hyperplane_matrix(bits, dim)
    projs = []
    for j in range(bits):
        lits = ", ".join(f"{v}D" for v in R[j])
        projs.append(
            F.expr(
                f"aggregate(zip_with({vec_col}, array({lits}), "
                "(x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"
            ).alias(f"p{j}")
        )
    base = df.select(F.col(id_col), *projs)
    n_bands = bits // band_rows
    entries = []
    for b in range(n_bands):
        js = list(range(b * band_rows, (b + 1) * band_rows))
        bit = {
            j: F.when(F.col(f"p{j}") >= 0, F.lit("1")).otherwise(F.lit("0"))
            for j in js
        }
        margins = F.array(*[
            F.struct(F.abs(F.col(f"p{j}")).alias("m"), F.lit(i).alias("i"))
            for i, j in enumerate(js)
        ])
        jmin = F.array_min(margins)["i"]
        exact = F.concat(*[bit[j] for j in js])
        flipped = [
            F.when(
                F.lit(i) == jmin,
                F.when(bit[j] == "1", F.lit("0")).otherwise(F.lit("1")),
            ).otherwise(bit[j])
            for i, j in enumerate(js)
        ]
        probe = F.concat(*flipped)
        entries.append(
            F.struct(F.lit(b).alias("band_id"), exact.alias("band_val"), F.lit("e").alias("kind"))
        )
        entries.append(
            F.struct(F.lit(b).alias("band_id"), probe.alias("band_val"), F.lit("p").alias("kind"))
        )
    return base.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("r")
    ).select(id_col, "r.band_id", "r.band_val", "r.kind")


def embedding_lsh_near_dup_multiprobe(
    df: DataFrame,
    dim: int = 64,
    bits: int = HYPERPLANE_BITS,
    band_rows: int = HYPERPLANE_BAND_ROWS,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 64,
) -> DataFrame:
    """Multi-probe variant of :func:`embedding_lsh_near_dup`: the
    candidate set additionally includes pairs where one vector's PROBE
    bucket (nearest-margin bit flipped) meets the other's exact
    bucket.  Since verification is the same exact cosine join, the
    result is a SUPERSET of the single-probe variant's at identical
    index size — recall improves for free minus the extra probe
    lookups (suite-pinned: superset always, strictly more true pairs
    on the driver embeddings).

    Hot-bucket discipline matches lsh_candidate_pairs: bucket stats
    count EXACT members only, sane buckets take the (exact+probe) x
    exact join, oversized buckets emit the linear min-id star.
    """
    df = with_norm(df, vec_col).filter(F.col("norm") > 0).drop("norm")
    rows = hyperplane_probe_rows(
        df, dim, bits, band_rows, id_col, vec_col
    ).persist()
    ex = rows.filter(F.col("kind") == "e").drop("kind")
    stats = ex.groupBy("band_id", "band_val").agg(
        F.count("*").alias("bucket_n"), F.min(id_col).alias("min_id")
    )
    ok = stats.filter(F.col("bucket_n") <= max_bucket_size).select(
        "band_id", "band_val"
    )
    probe_side = rows.drop("kind").join(ok, ["band_id", "band_val"])
    exact_side = ex.join(ok, ["band_id", "band_val"])
    a, b = probe_side.alias("a"), exact_side.alias("b")
    all_pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_b"),
        )
    )
    starred = (
        ex.join(stats.filter(F.col("bucket_n") > max_bucket_size), ["band_id", "band_val"])
        .filter(F.col(id_col) != F.col("min_id"))
        .select(F.col("min_id").alias("doc_a"), F.col(id_col).alias("doc_b"))
    )
    pairs = all_pairs.unionByName(starred).distinct().localCheckpoint(eager=True)
    out = _cosine_verify(df, pairs, threshold, id_col, vec_col).localCheckpoint(
        eager=True
    )
    rows.unpersist()
    return out


def ivfpq_topk(
    vectors: DataFrame,
    dim: int,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = PQ_SUBSPACES,
    k: int = PQ_CODES,
    n_queries: int = PQ_N_QUERIES,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ composite ANN (the FAISS ``IVFx,PQy`` index shape, Jégou
    et al. TPAMI'11 §V): the corpus is partitioned into ``n_cells`` IVF
    cells at write time, PQ-encoded once, and a query scans the ADC
    code table ONLY inside its ``n_probe`` nearest cells — composing
    the two pruning axes this module already has separately
    (``ivf_probe_search``'s partition pruning, ``pq_topk``'s
    memory-scale code compression).

    Scale shape: at 100 TB the code table is written partitioned by
    ``centroid_id``, so the per-query scan is partition-pruned to
    n_probe/n_cells of a table that is itself ~1/64 the corpus size —
    the raw vectors are never read at search time.  Training and
    encoding touch the corpus exactly twice (both broadcast joins, as
    in ``pq_topk``); the probe ranking is a broadcast cross of
    n_queries x n_cells rows.  ``residual=False`` trains GLOBAL
    codebooks on raw vectors; ``residual=True`` is the paper's actual
    IVFADC: codebooks are trained on v - centroid(cell(v)), so codes
    spend their bits on within-cell detail instead of re-describing
    which cell a vector sits in, and the query builds one LUT per
    PROBED CELL from its own residual q - centroid — same scan shape,
    LUT rows multiply by n_probe only (still m*k per (query, cell)).

    Determinism contract shared with ``pq_topk``: codebook means are
    2^52-scaled DECIMAL partial sums (order-free), ADC per-candidate
    distance is a FIXED-ORDER pivot sum d0 + ... + d{m-1}, every rank
    window ties on an id.  Returns
    (query_id, neighbor_id, adc_dist, rank) with rank <= topk over the
    probed candidates only.
    """
    cents = vectors.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("centroid_id"), vec_col
    )
    assign = ivf_assign(vectors, cents, id_col=id_col, vec_col=vec_col)

    cvec = cents.select("centroid_id", F.col(vec_col).alias("cent_vec"))
    diff = (
        "zip_with({v}, cent_vec,"
        " (x, y) -> cast(x as double) - cast(y as double))"
    ).format(v=vec_col)
    if residual:
        enc_input = (
            vectors.join(assign, id_col)
            .join(F.broadcast(cvec), "centroid_id")
            .select(F.col(id_col), F.expr(diff).alias(vec_col))
        )
    else:
        enc_input = vectors
    sub = pq_subvectors(enc_input, dim, m, id_col, vec_col).persist()
    # Residual seeds skip ids < n_cells: those rows ARE the centroids,
    # so their residuals are exactly zero — seeding from them would
    # collapse every codebook to a single code.
    books = F.broadcast(
        pq_codebooks(
            sub, k, id_col, seed_lo=n_cells if residual else 0
        ).localCheckpoint(eager=True)
    )
    codes = _pq_assign(sub, books, id_col).join(assign, id_col)

    cn = with_norm(cents, vec_col).select(
        "centroid_id", F.col(vec_col).alias("ce"), F.col("norm").alias("cnorm")
    )
    qn = with_norm(vectors.filter(F.col(id_col) < n_queries), vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    qscore = qn.crossJoin(F.broadcast(cn)).select(
        "query_id",
        "centroid_id",
        (_dot("qe", "ce") / (F.col("qnorm") * F.col("cnorm"))).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    qprobe = (
        qscore.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "centroid_id")
        .localCheckpoint(eager=True)
    )

    if residual:
        sd = dim // m
        qsubs = F.expr(
            f"transform(sequence(0, {m - 1}),"
            f" s -> transform(slice(rvec, s * {sd} + 1, {sd}), x -> x))"
        )
        qres = (
            vectors.filter(F.col(id_col) < n_queries)
            .select(F.col(id_col).alias("query_id"), vec_col)
            .join(qprobe, "query_id")
            .join(F.broadcast(cvec), "centroid_id")
            .select("query_id", "centroid_id", F.expr(diff).alias("rvec"))
        )
        q = qres.select(
            "query_id", "centroid_id", F.posexplode(qsubs).alias("sub", "qvec")
        )
        lut = q.join(books, "sub").select(
            "query_id",
            "centroid_id",
            "sub",
            "code",
            F.expr(_SQDIST.format(a="qvec", b="cent")).alias("dist"),
        )
        lut_keys = ["query_id", "centroid_id", "sub", "code"]
    else:
        q = sub.filter(F.col(id_col) < n_queries).select(
            F.col(id_col).alias("query_id"), "sub", F.col("svec").alias("qvec")
        )
        lut = q.join(books, "sub").select(
            "query_id",
            "sub",
            "code",
            F.expr(_SQDIST.format(a="qvec", b="cent")).alias("dist"),
        )
        lut_keys = ["query_id", "sub", "code"]
    # Prune to probed cells BEFORE any distance work: at scale this
    # broadcast join is the read-side partition filter.
    cand = codes.join(F.broadcast(qprobe), "centroid_id").filter(
        F.col(id_col) != F.col("query_id")
    )
    per_sub = cand.join(
        F.broadcast(lut.localCheckpoint(eager=True)), lut_keys
    ).select(F.col(id_col).alias("neighbor_id"), "query_id", "sub", "dist")
    pivoted = per_sub.groupBy("query_id", "neighbor_id").agg(
        *[
            F.max(F.when(F.col("sub") == s, F.col("dist"))).alias(f"d{s}")
            for s in range(m)
        ]
    )
    adc = pivoted.select(
        "query_id",
        "neighbor_id",
        sum([F.col(f"d{s}") for s in range(1, m)], F.col("d0")).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    out = (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            "adc_dist",
            F.col("rank").cast("int").alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    sub.unpersist()
    return out


def hard_negatives(
    vectors: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive hard-negative mining — the embedding-training data
    op: for every anchor in ``queries``, the ``k`` most cosine-similar
    candidates that are NOT the anchor itself and NOT among its known
    positives (``positives``: (query_id, neighbor_id) pairs — linked
    duplicates, same-document chunks, labeled matches).  "Hard"
    because they are ranked by similarity: the negatives closest to
    the decision boundary, which is what contrastive losses learn
    from (Robinson et al., ICLR'21 lineage).

    Shape is :func:`cosine_topk` with the positive set anti-joined out
    BEFORE the rank window, so the output always carries k true
    negatives (not k minus however many positives landed in the
    window).  The positives table is typically anchor-bounded small —
    broadcast; everything else inherits cosine_topk's scaling
    (brute-force baseline — swap the candidate generation for the IVF
    or PQ path at corpus scale, the verify join stays the same).
    Deterministic ties on neighbor id."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("norm").alias("q_norm"),
    )
    # Candidate side: scale-adaptive spread (r14, same policy as
    # cosine_topk) — skipped when the scan's splits already provide
    # the parallelism (the 100 TB shape: stream into the broadcast
    # join, no payload shuffle), engaged only for narrower-than-
    # cluster scans.
    c = with_norm(_spread(vectors, id_col), vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("norm").alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(
            F.broadcast(positives.select("query_id", "neighbor_id")),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
        .select(
            "query_id",
            "neighbor_id",
            (_dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization — the third compression point on the
# accuracy/size curve next to IVF (partition pruning) and PQ (code
# tables): one uint8 code per DIMENSION (4x smaller than float32,
# far more accurate than PQ's one code per subvector), encode/decode
# pure per-row arithmetic.  Integer codes make the whole path
# oracle-able — a property PQ's float k-means centroids cannot give.
# ---------------------------------------------------------------------------


def sq8_bounds(
    vectors: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (dim, lo, hi) over the corpus — exact min/max
    (order-free aggregates), one explode + one groupBy on the
    dimension key (at most `dim` groups)."""
    pos = vectors.select(
        F.posexplode(vec_col).alias("dim", "x")
    ).select("dim", F.col("x").cast("double").alias("x"))
    return pos.groupBy("dim").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )


def _collect_bounds(bounds: DataFrame) -> tuple[list, list]:
    rows = sorted(
        ((r["dim"], float(r["lo"]), float(r["hi"])) for r in bounds.collect())
    )
    los = [r[1] for r in rows]
    steps = [r[2] - r[1] for r in rows]
    return los, steps


def sq8_encode(
    vectors: DataFrame,
    bounds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, codes: array<int>) — each dimension quantized to
    0..255 as ``floor((x - lo) / (hi - lo) * 255 + 0.5)`` clamped
    (HALF-UP by construction: both engines' float ``round`` ties
    differ, ``floor(v + 0.5)`` does not).  A constant dimension
    (hi == lo) codes to 0.  The bounds table collects to the driver
    (dim-sized) and rides the plan as literals — map-side only."""
    los, steps = _collect_bounds(bounds)
    lo_arr = F.array(*[F.lit(v) for v in los])
    st_arr = F.array(*[F.lit(v) for v in steps])
    codes = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.arrays_zip(lo_arr.alias("lo"), st_arr.alias("st")),
        lambda x, b: F.when(
            x.isNull(), F.lit(None).cast("int")
        ).otherwise(
            F.when(b.getField("st") == 0, F.lit(0)).otherwise(
                F.least(
                    F.lit(255),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (x - b.getField("lo")) / b.getField("st") * 255
                            + F.lit(0.5)
                        ),
                    ),
                ).cast("int")
            )
        ),
    )
    return vectors.select(F.col(id_col), codes.alias("codes"))


def sq8_topk(
    encoded: DataFrame,
    queries: DataFrame,
    bounds: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric top-k over SQ8 codes: the query stays float and the
    decoded dot product folds to ``q·lo + sum(q_d·step_d/255 · code_d)``
    — the per-query constant and the scaled-query array are computed
    once per query row, so the scan does one multiply-add per code,
    never a decode.  Ranks by approximate DOT PRODUCT: normalize
    inputs first when cosine ranking is wanted (then dot == cosine).
    Deterministic tie-break on candidate id.  Output:
    (query_id, neighbor_id, score, rank)."""
    los, steps = _collect_bounds(bounds)
    lo_arr = F.array(*[F.lit(v) for v in los])
    sc_arr = F.array(*[F.lit(v / 255.0) for v in steps])
    qv = F.col(vec_col).cast("array<double>")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.aggregate(
            F.zip_with(qv, lo_arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("q_lo"),
        F.zip_with(qv, sc_arr, lambda a, b: a * b).alias("q_scaled"),
    )
    # Candidate side: scale-adaptive spread (r14, same policy as
    # cosine_topk) — skipped when the encoded-codes scan is already
    # cluster-wide (then it streams into the broadcast join with no
    # code-payload shuffle), engaged for narrower scans.
    c = _spread(encoded, id_col).select(F.col(id_col).alias("neighbor_id"), "codes")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("q_lo")
                + F.aggregate(
                    F.zip_with(
                        F.col("q_scaled"),
                        F.col("codes"),
                        lambda s, code: s * code.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )
