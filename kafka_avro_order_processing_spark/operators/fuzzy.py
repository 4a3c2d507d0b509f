"""Record linkage / fuzzy matching: edit-distance joins with blocking.

The classic data-cleaning operator the reference's order pipeline has no
analogue for but any large-scale catalog/dedup workload needs: find,
for every record, its nearest other record by Levenshtein distance —
WITHOUT the corpus-quadratic all-pairs comparison.  Blocking is the
standard record-linkage answer (Fellegi & Sunter '69 lineage; see also
the survey literature on blocking/indexing, e.g. Christen's "A Survey
of Indexing Techniques for Scalable Record Linkage"): only records
sharing a cheap deterministic key (here: a category token + brand) are
compared, so the comparison count is sum over blocks of n_b^2 instead
of N^2.  The blocking key's granularity is the scale knob — at 100 TB
you pick keys that keep every block in the low thousands.

Engine notes: Spark's `levenshtein` and DuckDB's agree exactly on
ASCII strings (verified by the fuzz suite) but diverge on non-ASCII
(Spark counts codepoints, DuckDB bytes) — the contract here is
byte/codepoint-agnostic ASCII input, which the fuzz generator and the
catalog data both satisfy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Blocks larger than this are skipped outright (deterministic, mirrored
# by the SQL oracles): a degenerate blocking key that funnels 10^6
# records into one block would otherwise go quadratic.  Unlike the
# co-activity star fallback there is no useful "connectivity" to
# preserve for fuzzy matching — an oversized block means the blocking
# key is wrong for the data, and silently comparing a sample would
# report false non-matches; skipping is the honest bound.
MAX_FUZZY_BLOCK = 1000


def fuzzy_best_match(
    df: DataFrame,
    block: Column,
    id_col: str = "id",
    text_col: str = "text",
    max_distance: int = 4,
    max_block_size: int = MAX_FUZZY_BLOCK,
) -> DataFrame:
    """For every record, the nearest OTHER record in its block by
    Levenshtein distance on `text_col`, keeping only matches within
    `max_distance`.  Ties break on the smallest candidate id (total
    order — deterministic and oracle-reproducible).

    Returns (id, match_id, match_text, distance) with exactly one row
    per record that has a qualifying match; records in oversized
    blocks (> max_block_size members) or with no candidate within the
    threshold produce no row.

    Shape: one partial-aggregated groupBy for block sizes, a join-back
    on the block key, the blocked self-join (bounded by
    max_block_size^2 per block), a JVM-side levenshtein filter — no
    Python in the hot path — and one per-record rank window whose
    partition is bounded by the block size.
    """
    b = df.select(
        F.col(id_col).alias("rid"),
        F.col(text_col).alias("rtext"),
        block.alias("blk"),
    )
    sizes = b.groupBy("blk").agg(F.count("*").alias("block_n"))
    ok = b.join(
        sizes.filter(F.col("block_n") <= max_block_size), "blk"
    ).drop("block_n")
    cand = (
        ok.select("blk", F.col("rid").alias("cid"), F.col("rtext").alias("ctext"))
    )
    scored = (
        ok.join(cand, "blk")
        .filter(F.col("rid") != F.col("cid"))
        .withColumn("distance", F.levenshtein("rtext", "ctext"))
        .filter(F.col("distance") <= max_distance)
    )
    w = Window.partitionBy("rid").orderBy(F.asc("distance"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("rid").alias(id_col),
            F.col("cid").alias("match_id"),
            F.col("ctext").alias("match_text"),
            F.col("distance").cast("int").alias("distance"),
        )
    )


def fuzzy_join_between(
    left: DataFrame,
    right: DataFrame,
    left_block: Column,
    right_block: Column,
    left_id: str = "id",
    right_id: str = "id",
    left_text: str = "text",
    right_text: str = "text",
    max_distance: int = 4,
    max_block_size: int = MAX_FUZZY_BLOCK,
) -> DataFrame:
    """Two-table record linkage: for every LEFT record, the nearest
    RIGHT record (Levenshtein on the text columns) within its block —
    the textbook linkage shape (new records vs a master table, two
    catalogs to reconcile), as opposed to :func:`fuzzy_best_match`'s
    self-linkage.

    The cap bounds the per-block comparison count by the RIGHT side's
    block occupancy (the side that multiplies): blocks whose right
    membership exceeds `max_block_size` emit nothing, deterministically.
    Ties break on the smallest right id.  Returns
    (left_id, match_id, match_text, distance), one row per left record
    with a qualifying match.
    """
    l = left.select(
        F.col(left_id).alias("rid"),
        F.col(left_text).alias("rtext"),
        left_block.alias("blk"),
    )
    r = right.select(
        F.col(right_id).alias("cid"),
        F.col(right_text).alias("ctext"),
        right_block.alias("blk"),
    )
    sizes = r.groupBy("blk").agg(F.count("*").alias("block_n"))
    ok = sizes.filter(F.col("block_n") <= max_block_size).select("blk")
    scored = (
        l.join(ok, "blk", "leftsemi")
        .join(r, "blk")
        .withColumn("distance", F.levenshtein("rtext", "ctext"))
        .filter(F.col("distance") <= max_distance)
    )
    w = Window.partitionBy("rid").orderBy(F.asc("distance"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("rid").alias(left_id),
            F.col("cid").alias("match_id"),
            F.col("ctext").alias("match_text"),
            F.col("distance").cast("int").alias("distance"),
        )
    )


# ---------------------------------------------------------------------------
# Jaro-Winkler linkage — the name/title-matching metric (Winkler '90,
# building on Jaro '89).  Spark has no builtin, so this is an honest
# Arrow-batched Pandas UDF: a documented slow path, kept OUT of the
# registered batch plans (the plan-invariant suite forbids
# BatchEvalPython there) and exercised suite-side against DuckDB's
# builtin `jaro_winkler_similarity` (which this matches exactly on the
# operator's ASCII contract, boost threshold 0.7, prefix cap 4,
# p = 0.1).
# ---------------------------------------------------------------------------

JW_PREFIX_SCALE = 0.1
JW_BOOST_THRESHOLD = 0.7
JW_PREFIX_CAP = 4


def _jaro_winkler_py(a: str, b: str) -> float:
    """Pure-Python Jaro-Winkler similarity in [0, 1] — standard
    definition: match window floor(max/2)-1, transpositions = half the
    out-of-order matches, Winkler prefix boost only when jaro exceeds
    the 0.7 threshold (DuckDB's convention, verified by the fuzz)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0  # DuckDB convention: '' vs '' is 0, not 1
    if a == b:
        return 1.0
    window = max(max(la, lb) // 2 - 1, 0)
    match_a = [False] * la
    match_b = [False] * lb
    matched = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = True
                match_b[j] = True
                matched += 1
                break
    if matched == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    jaro = (
        matched / la + matched / lb + (matched - t) / matched
    ) / 3.0
    if jaro < JW_BOOST_THRESHOLD:
        return jaro
    prefix = 0
    for ca, cb in zip(a[:JW_PREFIX_CAP], b[:JW_PREFIX_CAP]):
        if ca != cb:
            break
        prefix += 1
    return jaro + prefix * JW_PREFIX_SCALE * (1.0 - jaro)


def jaro_winkler_udf():
    """Arrow-batched (string, string) -> double Pandas UDF computing
    Jaro-Winkler similarity; NULL if either side is NULL.  Built lazily
    so importing this module never binds a UDF without a session."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if x is None or y is None else _jaro_winkler_py(x, y)
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    return jw


def fuzzy_best_match_jw(
    df: DataFrame,
    block: Column,
    id_col: str = "id",
    text_col: str = "text",
    min_similarity: float = 0.85,
    max_block_size: int = MAX_FUZZY_BLOCK,
) -> DataFrame:
    """Jaro-Winkler twin of :func:`fuzzy_best_match`: for every record,
    the most similar OTHER record in its block, keeping matches with
    similarity >= `min_similarity`; ties break on the smallest
    candidate id.  Same blocked shape and oversize-skip bound — the
    only structural difference is that the scoring expression is the
    Pandas UDF, which runs AFTER the block join has bounded the
    candidate count (the UDF sees at most block_n rows per record, so
    the Python-path cost inherits the same n_b^2-per-block envelope as
    the Levenshtein variant, times the Arrow batch constant).

    Returns (id, match_id, match_text, similarity: double).

    A JVM-side length-ratio prune runs BEFORE the UDF: with
    s = min(|a|, |b|), g = max(|a|, |b|), at most s characters can
    match, so jaro <= (s/|a| + s/|b| + 1) / 3 <= (2 + s/g) / 3, and
    the Winkler boost is bounded by JW <= 0.6 * jaro + 0.4 — hence
    JW >= t requires s/g >= 3 * (t - 0.4) / 0.6 - 2 (e.g. >= 0.5 at
    t = 0.9).  The filter is a necessary condition (fuzz-pinned), so
    it never drops a qualifying pair; it exists because each surviving
    pair costs a Python JW evaluation (~1e5 pairs/s/8 cores measured
    at sf0.1 — see SCALE.md), making cheap pruning worth more here
    than in the all-JVM Levenshtein variant.
    """
    jw = jaro_winkler_udf()
    b = df.select(
        F.col(id_col).alias("rid"),
        F.col(text_col).alias("rtext"),
        block.alias("blk"),
    )
    sizes = b.groupBy("blk").agg(F.count("*").alias("block_n"))
    ok = b.join(
        sizes.filter(F.col("block_n") <= max_block_size), "blk"
    ).drop("block_n")
    cand = ok.select(
        "blk", F.col("rid").alias("cid"), F.col("rtext").alias("ctext")
    )
    min_ratio = 3.0 * (min_similarity - 0.4) / 0.6 - 2.0
    ll, cl = F.length("rtext"), F.length("ctext")
    scored = (
        ok.join(cand, "blk")
        .filter(F.col("rid") != F.col("cid"))
        .filter(
            F.least(ll, cl).cast("double")
            >= F.lit(min_ratio) * F.greatest(ll, cl).cast("double")
        )
        .withColumn("similarity", jw(F.col("rtext"), F.col("ctext")))
        .filter(F.col("similarity") >= min_similarity)
    )
    w = Window.partitionBy("rid").orderBy(F.desc("similarity"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("rid").alias(id_col),
            F.col("cid").alias("match_id"),
            F.col("ctext").alias("match_text"),
            F.col("similarity"),
        )
    )
