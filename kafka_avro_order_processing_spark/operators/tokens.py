"""Trainer-ready token shards: the last mile after BPE — string tokens
become integer ids under a frequency-ordered vocabulary, and documents
concatenate into fixed-length id sequences with per-sequence document
spans, which is literally the array a pretraining data loader feeds
the model.

Pipeline position: ``bpe_encode`` (operators/bpe.py) emits
(doc, tokens: array<string>); this module finishes the job:

    vocab  = build_vocab(tokenized)          # (token, token_id)
    ids    = encode_ids(tokenized, vocab)    # (doc, ids: array<int>)
    seqs   = pack_token_sequences(ids, 2048) # (seq_id, token_ids, doc_spans)

Scale notes, per function:
- ``build_vocab`` ranks the DISTINCT symbol set.  With BPE upstream
  that set is CLOSED (base characters + one entry per merge — a few
  tens of thousands), so the total-order ranking window runs over a
  vocabulary-sized table, not the corpus; raw whitespace tokens from
  an open vocabulary should be BPE'd first, which is the pipeline's
  order anyway.
- ``encode_ids`` is one broadcast join of exploded tokens against the
  vocab and a per-document re-assembly — no corpus-vs-corpus join.
- ``pack_token_sequences`` moves the token stream through exactly ONE
  shuffle (on the target sequence id) — the same volume any shard
  writer ships — after a per-shard running offset (the pack_sequences
  sharding discipline: the cumsum window sorts 1/n_shards of the
  corpus, never a global single partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .packing import SHARD_STRIDE


def build_vocab(
    tokenized: DataFrame, tokens_col: str = "tokens"
) -> DataFrame:
    """Frequency-ordered vocabulary: (token, token_id) with ids dense
    from 0, ordered by (count desc, token asc) — deterministic for a
    given corpus.  The ranking window runs over the distinct-symbol
    table (see module docstring for why that is small by design); a
    per-partition partial rank first keeps the global window's input
    at vocab size even when the upstream aggregation is wide."""
    counts = (
        tokenized.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return counts.select(
        "token", (F.row_number().over(w) - 1).cast("int").alias("token_id")
    )


def encode_ids(
    tokenized: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    missing_id: int = -1,
) -> DataFrame:
    """(id_col, ids: array<int>, n_tokens) — tokens mapped through the
    vocab in position order; tokens absent from the vocab take
    ``missing_id`` (with a BPE-trained vocab over the same corpus that
    never happens; scoring NEW text against an old vocab does, and -1
    is the honest OOV marker rather than a silent drop).  Empty
    documents yield empty arrays, not missing rows."""
    pos = tokenized.select(
        F.col(id_col),
        F.posexplode_outer(tokens_col).alias("pos", "token"),
    )
    joined = pos.join(F.broadcast(vocab), "token", "left").select(
        F.col(id_col),
        "pos",
        F.coalesce("token_id", F.lit(missing_id)).alias("tid"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(CASE WHEN pos IS NOT NULL"
                " THEN struct(pos, tid) END)), s -> s.tid)"
            ).alias("ids")
        )
        .select(
            F.col(id_col),
            "ids",
            F.size("ids").cast("long").alias("n_tokens"),
        )
    )


def pack_token_sequences(
    encoded: DataFrame,
    seq_len: int = 2048,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    ids_col: str = "ids",
) -> DataFrame:
    """Concatenate documents (shard-locally, in ``id_col`` order) and
    cut the stream into ``seq_len``-token sequences:

      seq_id      shard * SHARD_STRIDE + index within shard
      token_ids   array<int>, exactly seq_len except each shard's last
                  (no padding here — the trainer's collator pads)
      n_tokens    size of token_ids
      doc_spans   array<struct<doc_id, start, end>> — inclusive
                  positions each document occupies INSIDE this
                  sequence, in order; documents crossing a boundary
                  appear in both sequences' span lists

    Every token of every document appears in exactly one sequence, in
    document order within its shard — the standard packed-pretraining
    layout.  seq_id is a pure function of (shard, per-shard prefix
    sum), so the output is stable under any input partitioning."""
    spark_par = encoded.sparkSession.sparkContext.defaultParallelism
    shards = n_shards if n_shards is not None else spark_par
    base = encoded.select(
        F.col(id_col).alias("doc_id"),
        F.col(ids_col).alias("ids"),
        F.size(ids_col).alias("len"),
        (F.abs(F.hash(F.col(id_col))) % shards).alias("shard"),
    ).filter(F.col("len") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = base.withColumn("offset", F.sum("len").over(w) - F.col("len"))
    placed = (
        offs.select(
            "shard", "doc_id", "offset", F.posexplode("ids").alias("p", "tid")
        )
        .select(
            (
                F.col("shard").cast("long") * F.lit(SHARD_STRIDE)
                + F.floor((F.col("offset") + F.col("p")) / seq_len)
            ).alias("seq_id"),
            ((F.col("offset") + F.col("p")) % seq_len)
            .cast("int")
            .alias("spos"),
            "tid",
            "doc_id",
        )
    )
    seqs = placed.groupBy("seq_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(spos, tid))),"
            " s -> s.tid)"
        ).alias("token_ids")
    )
    spans = (
        placed.groupBy("seq_id", "doc_id")
        .agg(F.min("spos").alias("start"), F.max("spos").alias("end"))
        .groupBy("seq_id")
        .agg(
            F.expr(
                "array_sort(collect_list("
                " struct(start, end, doc_id)))"
            ).alias("sp")
        )
        .select(
            "seq_id",
            F.expr(
                "transform(sp, s -> named_struct('doc_id', s.doc_id,"
                " 'start', s.start, 'end', s.end))"
            ).alias("doc_spans"),
        )
    )
    return seqs.join(spans, "seq_id").select(
        "seq_id",
        "token_ids",
        F.size("token_ids").cast("int").alias("n_tokens"),
        "doc_spans",
    )


def oov_stats(
    encoded: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "ids",
    missing_id: int = -1,
) -> tuple[DataFrame, dict]:
    """Tokenizer-coverage QA over :func:`encode_ids` output: per-doc
    OOV counts/rate plus the corpus totals — the check a vocab shipped
    to production needs against NEW text (a rate creeping up means the
    corpus drifted away from the tokenizer's training set).

    Returns (per_doc, totals): per_doc adds ``n_oov``/``oov_rate`` to
    (id_col, n_tokens); totals is {'n_docs', 'n_tokens', 'n_oov',
    'oov_rate', 'n_docs_with_oov'} from exact integer sums.  Map-side
    array fold + one aggregation — no explode, no shuffle beyond the
    final partial+final agg.
    """
    n_oov = F.expr(
        f"size(filter({ids_col}, t -> t = {int(missing_id)}))"
    ).cast("long")
    per_doc = encoded.select(
        F.col(id_col),
        F.size(ids_col).cast("long").alias("n_tokens"),
        n_oov.alias("n_oov"),
    ).withColumn(
        "oov_rate",
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
        ),
    )
    row = per_doc.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("n_tokens").alias("t"),
        F.sum("n_oov").alias("o"),
        F.sum((F.col("n_oov") > 0).cast("bigint")).alias("dw"),
    ).collect()[0]
    t, o = int(row["t"] or 0), int(row["o"] or 0)
    totals = {
        "n_docs": int(row["d"]),
        "n_tokens": t,
        "n_oov": o,
        "oov_rate": (o / t) if t else None,
        "n_docs_with_oov": int(row["dw"] or 0),
    }
    return per_doc, totals


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    mask_rate: float = 0.15,
    salt: str = "t5",
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020's denoising
    objective), built DETERMINISTICALLY: each token's mask decision is
    an md5 draw on (salt, doc, position) — the engine's substitute for
    rand(seed), so the corrupted dataset is bit-reproducible under any
    partitioning, replay, or engine (suite-pinned against a Python
    replica of the same draws).  Contiguous masked runs collapse to
    one sentinel: ``inputs`` keeps unmasked tokens with
    ``<extra_id_k>`` standing in for the k-th masked run (numbered
    left-to-right from 0 per document); ``targets`` is each sentinel
    followed by the tokens it hides.  No trailing EOS sentinel —
    loaders differ; append your own.

    One (doc, pos) explode + gaps-and-islands run detection (the
    substr.py idiom) + per-doc array reassembly — every shuffle keys
    on the document, linear at scale.  Empty docs yield empty arrays;
    a doc with nothing masked yields targets=[].

    Columns: id_col, inputs array<string>, targets array<string>,
    n_masked (long).
    """
    from pyspark.sql import Window

    if not (0.0 <= mask_rate < 1.0):
        raise ValueError("mask_rate must be in [0, 1)")
    edge = int(mask_rate * (1 << 32))
    pos = df.select(
        F.col(id_col),
        F.posexplode_outer(tokens_col).alias("pos", "tok"),
    )
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(salt),
                    F.col(id_col).cast("string"),
                    F.col("pos").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    pos = pos.withColumn(
        "m",
        F.when(F.col("pos").isNotNull(), draw < edge).otherwise(
            F.lit(False)
        ),
    )
    # gaps-and-islands over the masked subset: island_key = pos - rn is
    # constant within a contiguous run and strictly increasing across
    # runs, so dense_rank(island_key) numbers runs left-to-right
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    masked = pos.filter(F.col("m")).withColumn(
        "island", F.col("pos") - F.row_number().over(w_doc)
    )
    w_isl = Window.partitionBy(id_col).orderBy("island")
    masked = masked.withColumn(
        "k", F.dense_rank().over(w_isl) - 1
    ).withColumn(
        "first",
        F.col("pos")
        == F.min("pos").over(Window.partitionBy(id_col, "island")),
    )
    sent = F.concat(F.lit("<extra_id_"), F.col("k"), F.lit(">"))
    unmasked = pos.filter(~F.col("m")).select(
        id_col,
        "pos",
        F.col("tok").alias("in_tok"),
        F.lit(None).cast("array<string>").alias("tgt"),
        F.lit(0).alias("hidden"),
    )
    masked_rows = masked.select(
        id_col,
        "pos",
        F.when(F.col("first"), sent).alias("in_tok"),  # NULL mid-run
        F.when(F.col("first"), F.array(sent, F.col("tok")))
        .otherwise(F.array(F.col("tok")))
        .alias("tgt"),
        F.lit(1).alias("hidden"),
    )
    allrows = unmasked.unionByName(masked_rows)
    return allrows.groupBy(id_col).agg(
        F.expr(
            "transform(array_sort(collect_list(CASE WHEN in_tok IS NOT"
            " NULL THEN struct(pos, in_tok) END)), s -> s.in_tok)"
        ).alias("inputs"),
        F.expr(
            "flatten(transform(array_sort(collect_list(CASE WHEN tgt IS"
            " NOT NULL THEN struct(pos, tgt) END)), s -> s.tgt))"
        ).alias("targets"),
        F.sum("hidden").cast("long").alias("n_masked"),
    )


def mlm_masking(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    mask_rate: float = 0.15,
    salt: str = "mlm",
    mask_token: str = "[MASK]",
) -> DataFrame:
    """BERT-style masked-LM corruption (Devlin et al. 2019) with the
    80/10/10 rule — of the selected ``mask_rate`` positions, 80%
    become ``mask_token``, 10% a random vocab token, 10% stay
    unchanged (so the model cannot learn 'masked ⇒ wrong') — built
    DETERMINISTICALLY like :func:`span_corruption`: selection, branch,
    and replacement draws are all md5 hashes of (salt, doc, position),
    so the corrupted dataset is bit-reproducible under any
    partitioning or replay (suite-pinned against a Python replica).

    ``vocab`` must be the (token, token_id) frame of
    :func:`build_vocab` with DENSE ids 0..V-1 — the random branch
    draws an id uniformly and broadcast-joins the token back.  Labels
    align position-for-position with the corrupted tokens: the
    ORIGINAL token at selected positions, NULL elsewhere (the -100
    convention, string-typed).

    Columns: id_col, input_tokens array<string>, labels array<string>,
    n_selected (long).  One explode + one broadcast join + one per-doc
    reassembly; V comes from one driver count scalar.
    """
    if not (0.0 <= mask_rate < 1.0):
        raise ValueError("mask_rate must be in [0, 1)")
    v_size = vocab.count()
    if v_size == 0:
        raise ValueError("mlm_masking needs a non-empty vocab")
    edge = int(mask_rate * (1 << 32))

    def draw(tag: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(f"{salt}.{tag}"),
                        F.col(id_col).cast("string"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")

    pos = df.select(
        F.col(id_col),
        F.posexplode_outer(tokens_col).alias("pos", "tok"),
    )
    sel = F.when(F.col("pos").isNotNull(), draw("sel") < edge).otherwise(
        F.lit(False)
    )
    branch = draw("branch") % 10  # 0-7 mask, 8 random, 9 keep
    rand_id = (draw("repl") % v_size).cast(
        dict(vocab.dtypes)["token_id"]
    )
    tagged = pos.select(
        id_col,
        "pos",
        "tok",
        sel.alias("sel"),
        F.when(sel, branch).alias("branch"),
        F.when(sel & (branch == 8), rand_id).alias("token_id"),
    )
    joined = tagged.join(
        F.broadcast(vocab.withColumnRenamed("token", "rand_tok")),
        "token_id",
        "left",
    )
    input_tok = (
        F.when(~F.col("sel"), F.col("tok"))
        .when(F.col("branch") <= 7, F.lit(mask_token))
        .when(F.col("branch") == 8, F.col("rand_tok"))
        .otherwise(F.col("tok"))
    )
    return (

        joined.select(
            id_col,
            "pos",
            "sel",
            input_tok.alias("__in"),
            F.when(F.col("sel"), F.col("tok")).alias("__lab"),
        )
        .groupBy(id_col)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(CASE WHEN pos IS NOT NULL"
                " THEN struct(pos, __in) END)), s -> s.__in)"
            ).alias("input_tokens"),
            F.expr(
                "transform(array_sort(collect_list(CASE WHEN pos IS NOT NULL"
                " THEN struct(pos, __lab) END)), s -> s.__lab)"
            ).alias("labels"),
            F.sum(F.col("sel").cast("long")).alias("n_selected"),
        )
    )
