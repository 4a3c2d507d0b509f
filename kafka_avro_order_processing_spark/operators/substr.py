"""Sub-document (span-level) deduplication — the ExactSubstr idea of
Lee et al., ACL'22 "Deduplicating Training Data Makes Language Models
Better": training corpora repeat long passages (licenses, boilerplate,
quoted text) inside otherwise-unique documents, and document-level
dedup cannot see them.  The paper removes every 50-token span that
occurs twice anywhere in the corpus, using a suffix array — an
inherently sequential structure.

The Spark-shaped equivalent here works at n-gram granularity:

  1. every document explodes to its token n-grams WITH POSITIONS —
     one map-side pass;
  2. one groupBy computes each n-gram's corpus-wide occurrence count
     (the only corpus-scale shuffle — key is the n-gram);
  3. positions whose n-gram occurs >= min_occurrences times are
     "duplicated"; CONSECUTIVE duplicated positions within a document
     merge into maximal spans by the gap-and-island idiom (pos -
     row_number() is constant inside a run) — a per-document window,
     partitioned by doc_id, never global.

A maximal span of consecutive duplicated n-grams of length L covers
L + n - 1 tokens, and any repeated passage of >= n tokens is found in
full (every n-window inside it repeats); passages shorter than n are
invisible — n is the sensitivity knob, exactly the paper's 50-token
threshold.  Same-document repetition counts toward the occurrence
threshold, matching "occurs twice anywhere in the corpus".

No pair explosion anywhere: documents are never joined against each
other — the n-gram count table mediates, so a boilerplate block shared
by 10^6 documents costs one hot aggregation key (AQE skew handling),
not 10^12 pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _positioned_ngrams(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, gram) — whitespace-token n-grams by 0-based start
    position, empty tokens dropped.  Map-side only."""
    toks = F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t != '')")
    grams = F.expr(
        "CASE WHEN size(toks) < {n} THEN"
        " cast(array() as array<struct<pos: int, gram: string>>)"
        " ELSE transform(sequence(1, size(toks) - {n} + 1),"
        " i -> struct(cast(i - 1 as int) as pos,"
        "             array_join(slice(toks, i, {n}), ' ') as gram)) END".format(
            n=n
        )
    )
    return (
        docs.select(F.col(id_col), toks.alias("toks"))
        .select(F.col(id_col), F.explode(grams).alias("g"))
        .select(F.col(id_col), "g.pos", "g.gram")
    )


def duplicated_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    min_occurrences: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated spans per document: (id_col, span_start,
    span_end, n_grams) where [span_start, span_end] are INCLUSIVE
    0-based token indexes and every n-window inside the span occurs at
    least ``min_occurrences`` times corpus-wide (same-document repeats
    count).  Deterministic: output is a pure function of the corpus,
    no sampling, no hashing."""
    grams = _positioned_ngrams(docs, n, id_col, text_col)
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("occ"))
    dup_pos = grams.join(
        counts.filter(F.col("occ") >= min_occurrences).select("gram"),
        "gram",
        "leftsemi",
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = dup_pos.withColumn(
        "island", F.col("pos") - F.row_number().over(w)
    )
    return (
        runs.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            id_col,
            F.col("span_start").cast("int"),
            F.col("span_end").cast("int").alias("span_end"),
            F.col("n_grams").cast("int"),
        )
    )


def mask_duplicated_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rewrite each document with its duplicated spans' tokens removed
    (the paper's remediation).  Returns (id_col, text, n_tokens_removed)
    with the surviving tokens re-joined by single spaces; documents
    with no spans pass through unchanged.

    Shape: spans collapse to one per-doc index ARRAY (inclusive token
    ranges flattened to covered positions), joined back 1:1 — the
    filter is then a map-side array-membership test per token.  A doc's
    span list is bounded by its own token count, so the per-row array
    is document-sized, never corpus-sized."""
    covered = (
        spans.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("span_start"), F.col("span_end"))
            ).alias("p"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.collect_set("p").alias("drop_pos"))
    )
    toks = F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t != '')")
    joined = docs.select(F.col(id_col), toks.alias("toks")).join(
        covered, id_col, "left"
    )
    with_kept = joined.select(
        F.col(id_col),
        "toks",
        F.expr(
            "filter(transform(toks, (t, i) -> struct(t as t, i as i)),"
            " s -> drop_pos IS NULL OR NOT array_contains(drop_pos, s.i))"
        ).alias("kept"),
    )
    return with_kept.select(
        F.col(id_col),
        F.expr("array_join(transform(kept, s -> s.t), ' ')").alias("text"),
        (F.size("toks") - F.size("kept")).cast("int").alias("n_tokens_removed"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 "Winnowing: Local Algorithms for Document
    Fingerprinting" — the MOSS scheme): hash every token ``k``-gram,
    slide a ``window`` over consecutive hashes, and select each
    window's minimum hash, ties broken RIGHTMOST (the paper's rule:
    overlapping windows then mostly re-select the same position, so
    the fingerprint density is ~2/(window+1) instead of one per
    window).  The guarantee: any shared run of at least
    ``window + k - 1`` tokens between two documents shares at least
    one selected fingerprint — the local property that makes the
    scheme robust to position shifts, unlike every-i-th sampling.

    Returns (id_col, pos, hash): distinct selected positions (0-based
    k-gram start) with their 32-bit hash (first 8 md5 hex digits —
    the engine's cross-engine-stable hash).  Documents with fewer
    than ``window`` k-grams (but at least one) contribute the
    rightmost minimum over all their hashes — one fingerprint, the
    practical short-doc convention.  NULL/short texts (< k tokens)
    contribute nothing.

    Scale shape: one map-side n-gram pass, then per-DOCUMENT windows
    only (keys are doc ids — skew-safe, no corpus-wide shuffle, no
    doc-pair joins).  Downstream near-dup candidate generation joins
    on ``hash`` exactly like the MinHash band join, with the same
    capped-bucket discipline.
    """
    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")
    grams = _positioned_ngrams(docs, k, id_col, text_col)
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("bigint")
    hashed = grams.select(F.col(id_col), F.col("pos"), h.alias("__h"))
    w_count = Window.partitionBy(id_col)
    trail = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    # rightmost-min via lexicographic struct min: (hash asc, -pos asc)
    sel = F.min(
        F.struct(F.col("__h").alias("h"), (-F.col("pos")).alias("np"))
    ).over(trail)
    out = (
        hashed.withColumn("__n", F.count(F.lit(1)).over(w_count))
        .withColumn("__sel", sel)
        # full windows only — except the last position of a short doc,
        # whose trailing window covers the whole document
        .filter(
            F.col("pos") >= F.least(F.lit(window), F.col("__n")) - 1
        )
        .select(
            F.col(id_col),
            (-F.col("__sel.np")).cast("int").alias("pos"),
            F.col("__sel.h").alias("hash"),
        )
        .distinct()
    )
    return out


def winnow_candidate_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Near-dup candidate pairs from shared winnowing fingerprints —
    the third candidate path next to MinHash-LSH (probabilistic,
    whole-doc Jaccard) and the AllPairs prefix join (exact set
    similarity): winnowing candidates fire on a single SHARED PASSAGE
    of >= window + k - 1 tokens, so they surface partial-overlap pairs
    (quotes, boilerplate splices) the whole-document measures dilute
    away.

    ``fps`` is :func:`winnow_fingerprints` output.  Docs sharing a
    fingerprint HASH bucket pair up (a < b), counted by how many
    hashes they share; pairs below ``min_shared`` are dropped (one
    shared hash can be a md5 collision or a stop-phrase — two
    distinct selected passages is the published practical bar).

    Same hot-bucket discipline as the LSH path: a hash shared by more
    than ``max_bucket_size`` docs (a corpus-wide boilerplate passage)
    emits a min-id STAR (O(bucket) edges, diameter 2 — connected
    components still converge) instead of a quadratic all-pairs; star
    edges carry shared_hashes = NULL, marking them as connectivity
    edges, not measurements.
    """
    b = fps.select(F.col(id_col), F.col("hash").alias("__h"))
    stats = b.groupBy("__h").agg(
        F.count("*").alias("__n"), F.min(id_col).alias("__min")
    )
    sized = b.join(stats, "__h")
    small = sized.filter(F.col("__n") <= max_bucket_size)
    x, y = small.alias("x"), small.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.__h") == F.col("y.__h"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .groupBy(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
        )
        .agg(F.countDistinct("x.__h").cast("long").alias("shared_hashes"))
        .filter(F.col("shared_hashes") >= int(min_shared))
    )
    starred = (
        sized.filter((F.col("__n") > max_bucket_size) & (F.col(id_col) != F.col("__min")))
        .select(
            F.col("__min").alias("doc_a"),
            F.col(id_col).alias("doc_b"),
            F.lit(None).cast("long").alias("shared_hashes"),
        )
        .distinct()
    )
    return pairs.unionByName(starred)
