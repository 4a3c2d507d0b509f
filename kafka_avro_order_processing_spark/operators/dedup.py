"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

The standard near-duplicate stack for web-scale training corpora
(Broder '97 shingling/minhash; Charikar '02 simhash; the LSH banding
scheme from Mining of Massive Datasets ch.3), re-expressed as Spark
plans:

- exact:    one hash-groupBy on a content fingerprint.
- minhash:  shingle -> k minhashes in ONE aggregation pass (k min()
            aggregates, no k-way row blowup) -> band -> self-join on
            (band, value) -> candidate pairs -> exact-Jaccard verify.
- simhash:  token-bit voting via 32 conditional sums in one pass.

Scale notes (100 TB): every step is explode/groupBy/join — partial
aggregation bounds the shuffle to one row per (doc, distinct shingle);
the LSH band self-join shuffles on band values whose buckets are the
candidate sets (that is the point of LSH — no all-pairs).  Hot buckets
(boilerplate docs) are bounded by AQE skew handling; production would
additionally cap bucket size.  md5 is used so results are verifiable
against ANSI oracles; swap xxhash64 for ~2x hash throughput when
cross-engine verification is not needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

N_MINHASH = 8          # minhash functions
BAND_ROWS = 2          # rows per LSH band -> N_MINHASH/BAND_ROWS bands
SIMHASH_BITS = 32


def _scan_splits(df: DataFrame) -> int | None:
    """Estimated scan-split count of ``df``'s file sources, from driver
    metadata only (file list + sizes) — no job, no plan-to-RDD
    conversion (r14: the old ``df.rdd.getNumPartitions()`` probe forced
    a physical-plan + RDD conversion per query on the hot path, and for
    shuffle-containing inputs it reported the static pre-AQE partition
    count, not anything about the scan — r13 ADVICE).

    Mirrors Spark's split packing: maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, totalBytes/parallelism))
    with each file charged openCostInBytes.  Returns None when the
    input reads no files (in-memory relations) or a size is
    unavailable — callers fall back to the RDD probe there (cold paths
    only; every registry call site passes a parquet scan).
    """
    files = df.inputFiles()
    if not files:
        return None
    import os
    from urllib.parse import unquote, urlparse

    sess = df.sparkSession
    conf = sess._jsparkSession.sessionState().conf()
    max_pb = int(conf.filesMaxPartitionBytes())
    open_cost = int(conf.filesOpenCostInBytes())
    total = 0
    for f in files:
        p = unquote(urlparse(f).path)
        try:
            total += os.path.getsize(p) + open_cost
        except OSError:
            return None
    n = sess.sparkContext.defaultParallelism
    max_split = min(max_pb, max(open_cost, total // max(n, 1) or 1))
    return -(-total // max_split)  # ceil


def _needs_spread(df: DataFrame) -> bool:
    """True when ``df`` is narrower than the cluster and the CPU-bound
    hash work below it would under-parallelize without a repartition.

    HEURISTIC CONTRACT (r13 ADVICE): the decision is about the SCAN.
    For file-backed inputs it uses the estimated scan-split count from
    driver metadata; for in-memory inputs it falls back to the static
    RDD partition count, which for a shuffle-containing plan is the
    pre-AQE shuffle partition number — callers should pass (close to)
    raw scans, as every registry call site does.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    splits = _scan_splits(df)
    if splits is None:
        splits = df.rdd.getNumPartitions()
    return splits < n


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition to the session's parallelism — but ONLY when the
    scan is narrower than the cluster.

    The hash work below is CPU-bound per row; a small parquet input
    arrives as one split and would otherwise run on one core (measured
    at sf0.1: the single-task signature pass is ~3x the wall of the
    32-way one).  At real scale the scan already yields >= parallelism
    splits, and there the repartition would shuffle the ENTIRE corpus
    text just to re-key work that is already parallel — so it is
    skipped (r13 optimization round, guide §2.4: remove shuffles whose
    partitioning the data already has).  The skip is decided from
    driver-side scan metadata (`_scan_splits`), not a job.
    """
    if not _needs_spread(df):
        return df
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(key))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest id as
    canonical.  One shuffle on the 128-bit fingerprint."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_doc_id"), F.count("*").alias("n_copies"))
    )


def shingle_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    distinct: bool = True,
    spread: bool = True,
) -> DataFrame:
    """Word-n-gram shingles as (id, shingle) rows — distinct per doc by
    default (set semantics for minhash/Jaccard); ``distinct=False``
    keeps multiplicity (bag semantics, e.g. repetition scoring).

    The n-gram assembly is pure per-row expression work: zip the token
    array with its own 1..n-1 shifted slices (`arrays_zip` over
    `slice`) and explode — all codegen'd, NO window sort and no
    per-token shuffle; the only shuffle left is whatever the consumer's
    per-doc aggregation needs.  (Two tempting alternatives lose: a
    higher-order transform re-evaluates its interpreted lambda per
    element and defeats subexpression elimination — measured ~20x
    slower; and the posexplode + lead()-window form pays a full
    per-token sort-shuffle before the grams even exist.)
    """
    t = tokens(text_col)
    m = F.greatest(F.size(t) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(t, j + 1, m) for j in range(n)])
    out = (
        (_spread(df, id_col) if spread else df)
        .select(F.col(id_col), F.explode(zipped).alias("g"))
        .select(
            F.col(id_col),
            F.concat_ws(
                " ", *[F.col("g").getField(str(j)) for j in range(n)]
            ).alias("shingle"),
        )
    )
    return out.distinct() if distinct else out


def char_shingle_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    distinct: bool = True,
    spread: bool = True,
) -> DataFrame:
    """Character-n-gram shingles as (id, shingle) rows — the
    tokenization-independent alternative to word shingles (robust to
    punctuation/whitespace differences between near-duplicate docs;
    the standard choice for multilingual corpora where word splitting
    is unreliable).  Default n=8: short char grams are shared by most
    docs of a same-domain corpus (a 5-gram sweep measured LSH buckets
    of 189 members and 18% of ALL pairs emerging as candidates), so
    the char variant needs longer shingles — paired with a sharper
    banding curve (k=16, 4 rows/band) in near_dup_pairs_char.

    explode a position sequence, then substring(text, pos, n) — both
    codegen'd; the text column rides along only between the explode and
    the immediate projection.
    """
    base = (_spread(df, id_col) if spread else df).select(
        F.col(id_col), F.col(text_col)
    ).filter(F.length(text_col) >= n)
    out = base.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(
            F.sequence(F.lit(1), F.length(text_col) - (n - 1))
        ).alias("pos"),
    ).select(
        F.col(id_col),
        F.substring(F.col(text_col), F.col("pos"), F.lit(n)).alias("shingle"),
    )
    return out.distinct() if distinct else out


def shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct shingle set per doc as an array column `sh` (order
    irrelevant — consumers use intersection/size only)."""
    return (
        # collect_set dedups, so bag rows feed it directly (skips the
        # per-(doc, shingle) distinct shuffle)
        shingle_rows(df, id_col, text_col, n, distinct=False)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sh"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = N_MINHASH
) -> DataFrame:
    """k-function minhash signature per document.

    One pass over the distinct shingle rows with k min() aggregates —
    a single partial+final aggregation, not k passes.  The k hash
    functions are 8-hex-digit substrings of ceil(k/4) salted md5s
    (4 independent 32-bit hashes per digest — 4x less hashing than one
    md5 per function); fixed-width hex compares like the underlying
    integer, so min() over the substrings is a valid minhash.
    """
    # min() is duplicate-insensitive -> bag rows, no distinct shuffle
    sh = shingle_rows(df, id_col, text_col, distinct=False)
    return _signatures_from_rows(sh, id_col, k)


def _signatures_from_rows(sh: DataFrame, id_col: str, k: int) -> DataFrame:
    # SQL-string aggregates (r14): one F.expr per minhash column
    # instead of ~6 Column-API py4j round-trips each — identical
    # analyzed plan, ~5x cheaper plan construction on the driver
    # (measured with the simhash change; suite-pinned rows).
    aggs = [
        F.expr(
            f"min(substring(md5(concat('{j // 4}:', shingle)), "
            f"{(j % 4) * 8 + 1}, 8)) AS mh{j}"
        )
        for j in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


MAX_BUCKET_SIZE = 64   # all-pairs cap per LSH bucket; larger -> adjacent chain


def band_rows_of(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = N_MINHASH,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """Explode a signature table (id, mh0..mh{k-1}) into LSH band rows
    (id, band_id, band_val) — the joinable/bucketable form of the
    banding scheme, shared by the batch self-join pipeline and the
    streaming incremental index (which PERSISTS this table keyed by
    band value so each ingest epoch joins only matching buckets)."""
    n_bands = k // band_rows
    # One SQL-string explode instead of n_bands x ~6 Column-API py4j
    # round-trips (r14 plan-construction cost pass; identical plan).
    structs = ", ".join(
        "struct({b} AS band_id, concat({cols}) AS band_val)".format(
            b=b,
            cols=", ".join(f"mh{b * band_rows + r}" for r in range(band_rows)),
        )
        for b in range(n_bands)
    )
    return sigs.select(
        F.col(id_col), F.expr(f"explode(array({structs})) AS band")
    ).select(id_col, "band.band_id", "band.band_val")


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = N_MINHASH,
    band_rows: int = BAND_ROWS,
    max_bucket_size: int = MAX_BUCKET_SIZE,
    cache_into: list | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair (a < b).  Self-join on (band_id, band_value).

    Hot-bucket cap: boilerplate-heavy corpora (mirrors, templates)
    produce buckets with thousands of members, and the all-pairs
    self-join inside one bucket is quadratic.  Buckets larger than
    `max_bucket_size` instead emit a STAR — every member paired with the
    bucket's minimum doc id — O(bucket) edges that keep every member
    transitively connected (diameter 2, so downstream connected
    components converge in a round or two; a chain here would need
    diameter-many label-propagation rounds).  The direct pairwise
    Jaccard estimates are only produced for sane-sized buckets.
    """
    bands = band_rows_of(sigs, id_col, k, band_rows)
    # Three consumers read the band table (bucket stats, the in-bucket
    # pair generation, the star branch).  When the caller passes
    # `cache_into`, persist it pre-partitioned on the bucket key: the
    # rebalance hint is one AQE-sized exchange, after which the stats
    # aggregation, the stats join-back AND the small-bucket grouping
    # all reuse the (band_id, band_val) clustering — zero further
    # exchanges of band rows at any scale (r14; before, the self-join
    # form re-exchanged both join sides).  The input signature table
    # is expected to be cached and MATERIALIZED by the caller, so
    # concurrent first-computations duplicate only the cheap explode
    # above that cache, never the expensive shingle aggregation below
    # it.  (An eager count() barrier here was measured a net loss at
    # sf0.1 — one extra job's scheduling latency outweighs the
    # duplicated cheap work.)
    if cache_into is not None:
        bands = bands.hint("rebalance", "band_id", "band_val").persist()
        cache_into.append(bands)
    # Bucket sizing via partial-aggregated groupBy + join-back, NOT a
    # count()/min() window: the window form sorts every partition of
    # the band table just to annotate it, while the groupBy form
    # map-side-combines down to one row per bucket before any exchange
    # and the join-back reuses the same (band_id, band_val) hash
    # partitioning (AQE broadcasts the stats side outright when it is
    # small).  Measured at sf0.1 the two sort-windows were the single
    # largest cost in the near-dup plan.
    stats = bands.groupBy("band_id", "band_val").agg(
        F.count("*").alias("bucket_n"), F.min(id_col).alias("min_id")
    )
    sized = bands.join(stats, ["band_id", "band_val"])
    # In-bucket all-pairs WITHOUT a self-join (r14): the sane-sized
    # buckets are collected per bucket (state bounded by the
    # max_bucket_size pre-filter — the hot buckets never reach the
    # collect) and the a < b pairs are generated by one codegen'd
    # array expression.  Versus the previous sized⋈sized self-join
    # this removes both join-side exchanges of the band table at scale
    # and the join machinery for the quadratic in-bucket expansion;
    # rows are identical (suite- and oracle-pinned): sort_array makes
    # the (x, y) order ascending, so x < y exactly like the old
    # a.id < b.id join predicate.
    small_groups = (
        sized.filter(F.col("bucket_n") <= max_bucket_size)
        .groupBy("band_id", "band_val")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
    )
    all_pairs = small_groups.select(
        F.expr(
            "explode(flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids) - i - 1), "
            "y -> struct(x AS doc_a, y AS doc_b))))) AS p"
        )
    ).select("p.doc_a", "p.doc_b")
    starred = (
        sized.filter((F.col("bucket_n") > max_bucket_size) & (F.col(id_col) != F.col("min_id")))
        .select(F.col("min_id").alias("doc_a"), F.col(id_col).alias("doc_b"))
    )
    return all_pairs.unionByName(starred).distinct()


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = N_MINHASH,
    band_rows: int = BAND_ROWS,
    shingler=shingle_rows,
) -> DataFrame:
    """Full near-dup pipeline: minhash -> LSH candidates -> signature
    agreement estimate -> exact n-gram Jaccard verification.

    Only candidate pairs (LSH hits) pay the exact-Jaccard cost, and —
    crucially — only candidate DOCS pay the shingle-set
    materialization: the corpus-wide pass computes signatures alone
    (k fixed-width min() aggregates, O(k) state per doc), and the
    exact-verify shingle sets are rebuilt by re-shingling just the
    docs that appear in some candidate pair (a broadcast semi-join of
    a ~few-percent subset).  An earlier design fused
    ``collect_set(shingle)`` into the corpus-wide aggregation; that
    carried every document's full shingle set through the shuffle to
    serve a verification that only ever reads the candidate subset —
    the wrong shape at any scale.  `shingler` picks the shingle
    domain: word 3-grams (default) or `char_shingle_rows` for
    tokenization-independent character 8-grams (pair with k=16,
    band_rows=4 — see char_shingle_rows on why char grams need a
    sharper banding curve).
    """
    # Corpus-wide pass: signatures ONLY.  distinct=False — min() is
    # duplicate-insensitive, so the per-(doc, shingle) dedup shuffle
    # would be pure waste.
    rows = shingler(df, id_col, text_col, distinct=False)
    # Rebalance the signature table before caching (r13) — but ONLY
    # when the corpus pass was widened by _spread (r14): the spread
    # repartition's user-pinned width flows through the signature
    # aggregation (its exchange is reused, not re-added) and a persist
    # would pin that width onto every stage that reads the cache — the
    # whole LSH band/join pipeline ran at corpus-scan width over a
    # table of one 76-byte row per doc (measured at sf0.1: 206 tasks,
    # 4.5 s of task CPU).  One AQE-coalescible exchange of the tiny
    # signature rows (hint("rebalance", id) keeps the doc-id hash
    # partitioning the downstream feature join wants) re-sizes the
    # cache to advisory-sized partitions: 52 tasks / 1.8 s CPU,
    # identical rows.  When the scan is already cluster-wide (the
    # 100 TB case) _spread skips its repartition, the aggregation adds
    # its OWN exchange, and AQE already coalesces that one to advisory
    # size — the extra rebalance exchange of the signature table would
    # be pure waste there (guide §2.4), so it is skipped too.
    sig = _signatures_from_rows(rows, id_col, k)
    per_doc = (
        (sig.hint("rebalance", id_col) if _needs_spread(df) else sig).persist()
    )
    caches: list[DataFrame] = []
    pairs = lsh_candidate_pairs(per_doc, id_col, k, band_rows, cache_into=caches)
    # Materialize the (tiny) candidate-pair table eagerly: it is read
    # three times below (two id projections + the final join), it cuts
    # the race where the banding table's three consumers each recompute
    # the signature aggregation before the caches fill, and it is the
    # natural stage boundary at scale (pairs are what a production run
    # writes out between the LSH and verify stages).
    pairs = pairs.localCheckpoint(eager=True)

    # Re-shingle ONLY docs that appear in some candidate pair.  The id
    # set is tiny -> broadcast semi-join prunes the corpus scan without
    # shuffling it; the collect_set state now exists only for the
    # candidate subset.  One explode projection reads the checkpointed
    # pair table ONCE (r14; was a union of two projections = two
    # reads).  No distinct(): a semi join dedups its build side anyway,
    # and the distinct would cost a shuffle just to shrink an
    # already-tiny broadcast.
    cand_ids = pairs.select(
        F.explode(F.array(F.col("doc_a"), F.col("doc_b"))).alias(id_col)
    )
    cand_docs = df.join(F.broadcast(cand_ids), id_col, "semi")
    sets = (
        # spread=False: the candidate subset is tiny and the broadcast
        # semi-join left the scan un-shuffled — a repartition here would
        # add a shuffle of text payloads just to explode a few hundred
        # docs.
        shingler(cand_docs, id_col, text_col, distinct=False, spread=False)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sh"))
    )
    # Candidate-doc features: signature (cached, est-Jaccard) + shingle
    # set (exact Jaccard).  Inner join keeps candidate docs only.
    # selectExpr / SQL-string projections (r14 plan-construction cost
    # pass): identical analyzed plan, ~5x fewer py4j round-trips.
    feat = per_doc.join(sets, id_col)
    a = feat.selectExpr(
        f"{id_col} AS doc_a",
        *[f"mh{j} AS a{j}" for j in range(k)],
        "sh AS sh_a",
    )
    b = feat.selectExpr(
        f"{id_col} AS doc_b",
        *[f"mh{j} AS b{j}" for j in range(k)],
        "sh AS sh_b",
    )
    agree_sql = " + ".join(f"IF(a{j} = b{j}, 1, 0)" for j in range(k))
    result = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            f"CAST({agree_sql} AS DOUBLE) / {float(k)} AS est_jaccard",
            "CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE)"
            " / (CAST(size(sh_a) + size(sh_b) AS DOUBLE)"
            " - CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE))"
            " AS jaccard",
        )
    )
    # Materialize the (tiny) verified-pair result, then release the
    # intermediate caches — repeated calls in one session must not
    # accumulate cached partitions until someone clears the cache.
    # localCheckpoint truncates lineage too, so the returned plan no
    # longer references the unpersisted tables.
    out = result.localCheckpoint(eager=True)
    per_doc.unpersist()
    for c in caches:
        c.unpersist()
    return out


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash fingerprint: each of `bits` bits is the sign of a +-1
    vote summed over all tokens (with multiplicity); token bit j =
    parity of hex digit j of md5(token).

    The sign vector is a pure function of md5(token), so it is computed
    INLINE on the exploded token rows — `bits` codegen'd parity
    expressions over one shared md5 — and summed per document in a
    single partial+final aggregation.  No vocabulary dimension table,
    no join, no broadcast: an earlier design broadcast the distinct
    corpus vocabulary, which at web scale (10^8+ tokens) would overflow
    the driver/broadcast threshold.  One shuffle total, keyed by doc.
    Near-dup lookup is hamming distance over the fingerprint
    (bit_count(a XOR b) in Spark; block-partitioned at scale).
    """
    # The vote/fingerprint expressions are built as SQL strings (r14):
    # the Column-API form issued ~350 py4j round-trips per plan BUILD
    # (32 votes x ~7 calls + 32 fingerprint terms x ~4), which measured
    # 0.6-1.3 s of driver time per query invocation — more than the
    # query's own task CPU.  One F.expr per aggregate (and one for the
    # whole fingerprint sum) keeps the analyzed plan identical while
    # the construction drops to ~35 round-trips (suite-pinned rows).
    tok = (
        _spread(df, id_col)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .select(F.col(id_col), F.md5(F.col("token")).alias("h"))
    )
    votes = [
        F.expr(f"sum((ascii(substring(h, {j + 1}, 1)) % 2) * 2 - 1) AS s{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    fp_sql = " + ".join(f"IF(s{j} > 0, {2 ** j}, 0)" for j in range(bits))
    return agg.select(F.col(id_col), F.expr(f"CAST({fp_sql} AS BIGINT) AS simhash"))


def set_similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sim_num: int = 1,
    sim_den: int = 2,
    shingler=shingle_rows,
) -> DataFrame:
    """EXACT Jaccard similarity self-join via prefix filtering — the
    AllPairs/SSJoin family (Bayardo, Ma & Srikant, "Scaling Up All
    Pairs Similarity Search", WWW'07; Chaudhuri et al., ICDE'06) — the
    exact complement to the MinHash-LSH path: LSH trades false
    negatives for speed, prefix filtering keeps EVERY pair with
    Jaccard >= sim_num/sim_den while still never comparing all pairs.

    Principle: order each doc's shingle set by ascending global
    document frequency (rarest first, ties on the shingle string — a
    total order both engines reproduce).  If two sets overlap enough
    to pass the threshold, they MUST share a token within each other's
    first ``sz - ceil(t*sz) + 1`` tokens (the prefix), so candidate
    generation joins only on prefix tokens — rare by construction,
    which is the entire scale argument.  Candidates are then verified
    with the all-integer inequality
    ``(num+den) * |intersection| >= num * (|a|+|b|)``
    (equivalent to Jaccard >= num/den, zero floats to drift).

    Candidate generation additionally applies the SIZE filter
    (``(num+den)*min(|a|,|b|) >= num*(|a|+|b|)`` — overlap can never
    exceed the smaller set) and the POSITIONAL filter (PPJoin, Xiao et
    al. WWW'08: at the globally-first shared token, overlap <=
    1 + min(|a|-pos_a, |b|-pos_b), a valid upper bound because every
    other shared token is rarer and therefore later in both prefixes).
    Both are upper-bound prunes evaluated per candidate row before the
    distinct, so they change WORK, never RESULTS — the oracle mirrors
    only the plain prefix pipeline and the outputs are identical (the
    fuzz suite pins equality with brute force).

    Degenerate corpora (thousands of byte-identical docs) make every
    prefix token hot; run exact dedup first — the standard pipeline
    order.

    Returns (doc_a, doc_b, n_common, size_a, size_b), doc_a < doc_b.
    """
    from pyspark.sql import Window

    # Five consumers read the shingle table (freq, sizes, ordering,
    # both verify sides); without a persist each recomputes the
    # corpus-wide shingling — at 100 TB that is 5x the dominant scan
    # cost (same rationale as the LSH path's cached signature table).
    sh = shingler(df, id_col, text_col).persist()
    freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
    sized = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    ordered = (
        sh.join(freq, "shingle")
        .join(sized, id_col)
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("f", "shingle")
            ),
        )
    )
    # prefix length L = sz - ceil(t*sz) + 1, all-integer:
    # ceil(num*sz/den) via the portable exact floor-division idiom.
    x = F.col("sz") * sim_num + (sim_den - 1)
    ceil_t_sz = ((x - x % sim_den) / sim_den).cast("long")
    prefix = ordered.filter(
        F.col("pos") <= F.col("sz") - ceil_t_sz + F.lit(1)
    ).select(F.col(id_col), "shingle", "pos", "sz")
    pa = prefix.select(
        F.col(id_col).alias("doc_a"),
        "shingle",
        F.col("pos").alias("pos_a"),
        F.col("sz").alias("sz_a"),
    )
    pb = prefix.select(
        F.col(id_col).alias("doc_b"),
        F.col("shingle").alias("shingle_b"),
        F.col("pos").alias("pos_b"),
        F.col("sz").alias("sz_b"),
    )
    t_sum = F.lit(sim_num) * (F.col("sz_a") + F.col("sz_b"))
    ubound_pos = F.lit(1) + F.least(
        F.col("sz_a") - F.col("pos_a"), F.col("sz_b") - F.col("pos_b")
    )
    cand = (
        pa.join(pb, pa.shingle == pb.shingle_b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        # size filter: overlap <= min(|a|,|b|)
        .filter(
            F.lit(sim_num + sim_den) * F.least(F.col("sz_a"), F.col("sz_b"))
            >= t_sum
        )
        # positional filter: valid at the globally-first shared token;
        # a pair survives if ANY of its shared prefix-token rows passes
        .filter(F.lit(sim_num + sim_den) * ubound_pos >= t_sum)
        .select("doc_a", "doc_b")
        .distinct()
    )
    ta = sh.select(F.col(id_col).alias("doc_a"), F.col("shingle").alias("s_a"))
    tb = sh.select(F.col(id_col).alias("db"), F.col("shingle").alias("s_b"))
    inter = (
        cand.join(ta, "doc_a")
        .join(
            tb,
            (F.col("doc_b") == F.col("db")) & (F.col("s_a") == F.col("s_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sized.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("size_a"))
    sb = sized.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.lit(sim_num + sim_den) * F.col("n_common")
            >= F.lit(sim_num) * (F.col("size_a") + F.col("size_b"))
        )
        .select(
            "doc_a", "doc_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
        )
    )
