"""Published rule-battery quality filters — the named heuristics the
field's curation pipelines actually shipped, as pure JVM expressions
with PER-RULE flags (an auditable funnel, not an opaque score; the
complement to ``text.quality_score``'s composite and
``classifier.py``'s learned filter):

* :func:`gopher_quality_flags` — the Gopher document-level rules
  (Rae et al. 2021, "Scaling Language Models", table A1 shape): word
  count bounds, mean word length bounds, symbol-to-word ratios
  (``#``/``…``), bullet/ellipsis line ratios, alphabetic-word ratio,
  stop-word presence.
* :func:`c4_line_filters` — the C4 line-level cleaning (Raffel et
  al. 2020): keep lines that end in terminal punctuation, have >= 5
  words, drop lines with "lorem ipsum"/curly braces/"javascript";
  then drop documents left with < 3 surviving lines.

* :func:`gopher_repetition_flags` — the battery's repetition half:
  duplicate line/paragraph fractions and top-n-gram character mass.

The quality and C4 batteries are arrays + regex inside whole-stage
codegen: zero Python, zero shuffles (plan-pinned by the suite).  The
repetition battery's character fractions group by (doc, unit) — one
shuffle whose keys are per-document, so it stays skew-proof and
linear.  Thresholds are keyword arguments with the published
defaults — a corpus with a different register tunes them without
forking the rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the Gopher rule's "must contain two of these" stop words
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _words(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_words: int = 2,
) -> DataFrame:
    """Per-document Gopher rule flags + the conjunction ``keep``.

    Columns: id_col, n_words, mean_word_len, plus one boolean per rule
    (``ok_word_count``, ``ok_mean_word_len``, ``ok_symbol_ratio``,
    ``ok_bullet_lines``, ``ok_ellipsis_lines``, ``ok_alpha_words``,
    ``ok_stop_words``) and ``keep``.  NULL text fails every rule.
    Ratios are double divisions of exact integer counts; empty-line
    and zero-word degenerate cases keep well-defined flags (a doc with
    no words fails the word-count rule, never divides by zero).
    """
    w = _words(text_col)
    n_words = F.size(w)
    total_chars = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, b: a + b
    )
    mean_wl = F.when(
        n_words > 0, total_chars.cast("double") / n_words.cast("double")
    )
    n_hash = F.size(F.split(F.col(text_col), "#", -1)) - 1
    n_ellipsis = F.size(F.split(F.col(text_col), r"\.\.\.", -1)) - 1
    symbol_ratio = F.when(
        n_words > 0,
        (n_hash + n_ellipsis).cast("double") / n_words.cast("double"),
    )
    lines = F.filter(
        F.split(F.col(text_col), "\n", -1), lambda l: F.trim(l) != ""
    )
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).startswith("-")
            | F.trim(l).startswith("*")
            | F.trim(l).startswith("•"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).endswith("..."))
    )
    bullet_ratio = F.when(
        n_lines > 0, bullet_lines.cast("double") / n_lines.cast("double")
    )
    ellipsis_ratio = F.when(
        n_lines > 0, ellipsis_lines.cast("double") / n_lines.cast("double")
    )
    alpha_words = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    alpha_ratio = F.when(
        n_words > 0, alpha_words.cast("double") / n_words.cast("double")
    )
    low = F.transform(w, lambda x: F.lower(x))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(low, lambda x: F.array_contains(stop_arr, x)))

    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "ok_symbol_ratio": symbol_ratio <= max_symbol_word_ratio,
        "ok_bullet_lines": bullet_ratio <= max_bullet_line_ratio,
        "ok_ellipsis_lines": ellipsis_ratio <= max_ellipsis_line_ratio,
        "ok_alpha_words": alpha_ratio >= min_alpha_word_ratio,
        "ok_stop_words": n_stop >= min_stop_words,
    }
    cols = [
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
    ]
    keep = F.lit(True)
    for name, cond in flags.items():
        safe = F.coalesce(cond, F.lit(False))  # NULL text fails the rule
        cols.append(safe.alias(name))
        keep = keep & safe
    cols.append(keep.alias("keep"))
    return df.select(*cols)


def c4_line_filters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    min_lines: int = 3,
    require_terminal_punct: bool = True,
    banned_substrings: tuple[str, ...] = ("lorem ipsum", "{", "javascript"),
) -> DataFrame:
    """C4's line-level cleaning: keep lines with >= ``min_line_words``
    words, (optionally) ending in terminal punctuation (.!?" ), and
    containing none of ``banned_substrings`` (case-insensitive); then
    keep only documents with >= ``min_lines`` surviving lines.

    Columns: id_col, text (the surviving lines rejoined with \\n),
    n_lines_kept, n_lines_dropped.  Documents below ``min_lines`` are
    FILTERED OUT (the C4 contract), so the output is the cleaned
    corpus, not a flag table.  Pure array expressions.
    """
    lines = F.filter(
        F.split(F.col(text_col), "\n", -1), lambda l: F.trim(l) != ""
    )

    def line_ok(l: Column) -> Column:
        t = F.trim(l)
        ok = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != "")) >= int(
            min_line_words
        )
        if require_terminal_punct:
            ok = ok & (
                t.endswith(".")
                | t.endswith("!")
                | t.endswith("?")
                | t.endswith('"')
            )
        low = F.lower(t)
        for s in banned_substrings:
            ok = ok & ~low.contains(s.lower())
        return ok

    kept = F.filter(lines, line_ok)
    out = df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias(text_col),
        F.size(kept).cast("long").alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_lines_dropped"),
    )
    return out.filter(F.col("n_lines_kept") >= int(min_lines))


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    max_top_ngram_char_frac: dict | None = None,
) -> DataFrame:
    """The Gopher repetition rules (Rae et al. 2021, table A1's other
    half): duplicate line / paragraph fractions by count AND by
    character mass, plus the fraction of characters inside the single
    most frequent word {2,3,4}-gram.  A doc can pass every quality
    flag and still be a templated spam page — these catch that.

    Count fractions (1 − distinct/total) are pure array expressions;
    character fractions and top-n-grams group by (doc, unit) — one
    shuffle whose keys are per-document, so a 100 TB corpus spreads
    evenly no matter how hot any single document is.  Fractions of
    empty denominators are NULL and their flags fail (NULL text too).

    Columns: id_col, dup_line_frac, dup_para_frac, dup_line_char_frac,
    dup_para_char_frac, top_{2,3,4}gram_char_frac, per-rule ok_*
    booleans, keep.
    """
    top_caps = {2: 0.20, 3: 0.18, 4: 0.16}
    if max_top_ngram_char_frac:
        top_caps.update(max_top_ngram_char_frac)

    text = F.col(text_col)
    n_chars = F.length(text)
    lines = F.filter(F.split(text, "\n", -1), lambda l: F.trim(l) != "")
    paras = F.filter(
        F.split(text, r"\n\s*\n", -1), lambda p: F.trim(p) != ""
    )

    def dup_count_frac(arr) -> Column:
        n = F.size(arr)
        return F.when(
            n > 0,
            (n - F.size(F.array_distinct(arr))).cast("double")
            / n.cast("double"),
        )

    base = df.select(
        F.col(id_col),
        text.alias("__t"),
        n_chars.alias("__nc"),
        lines.alias("__lines"),
        paras.alias("__paras"),
        F.filter(F.split(text, r"\s+"), lambda w: w != "").alias("__w"),
        dup_count_frac(lines).alias("dup_line_frac"),
        dup_count_frac(paras).alias("dup_para_frac"),
    )

    # character mass of duplicated units: explode -> (doc, unit) counts
    # -> chars in units whose count > 1, over total unit chars
    def dup_char_frac(col: str, out: str) -> DataFrame:
        u = base.select(id_col, F.explode(col).alias("u"))
        per = u.groupBy(id_col, "u").agg(F.count(F.lit(1)).alias("k"))
        return per.groupBy(id_col).agg(
            (
                F.sum(
                    F.when(F.col("k") > 1, F.length("u") * F.col("k"))
                    .otherwise(F.lit(0))
                ).cast("double")
                / F.sum(F.length("u") * F.col("k")).cast("double")
            ).alias(out)
        )

    # top word-n-gram character fraction: (occurrences x gram chars) of
    # the heaviest n-gram over the doc's total chars
    def top_ngram_frac(n: int, out: str) -> DataFrame:
        grams = base.select(
            id_col,
            "__nc",
            F.explode(
                F.when(
                    F.size("__w") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size("__w") - (n - 1)),
                        lambda i: F.concat_ws(
                            " ", F.slice("__w", i, n)
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g"),
        )
        per = grams.groupBy(id_col, "__nc", "g").agg(
            F.count(F.lit(1)).alias("k")
        )
        return per.groupBy(id_col).agg(
            (
                F.max(F.length("g") * F.col("k")).cast("double")
                / F.max("__nc").cast("double")
            ).alias(out)
        )

    out = (
        base.select(
            id_col, "dup_line_frac", "dup_para_frac"
        )
        .join(dup_char_frac("__lines", "dup_line_char_frac"), id_col, "left")
        .join(dup_char_frac("__paras", "dup_para_char_frac"), id_col, "left")
    )
    for n in (2, 3, 4):
        out = out.join(
            top_ngram_frac(n, f"top_{n}gram_char_frac"), id_col, "left"
        )

    flags = {
        "ok_dup_lines": F.col("dup_line_frac") <= max_dup_line_frac,
        "ok_dup_paras": F.col("dup_para_frac") <= max_dup_para_frac,
        "ok_dup_line_chars": F.col("dup_line_char_frac")
        <= max_dup_line_char_frac,
        "ok_dup_para_chars": F.col("dup_para_char_frac")
        <= max_dup_para_char_frac,
        **{
            f"ok_top_{n}gram": F.col(f"top_{n}gram_char_frac")
            <= top_caps[n]
            for n in (2, 3, 4)
        },
    }
    keep = F.lit(True)
    cols = [F.col(c) for c in out.columns]
    for name, cond in flags.items():
        safe = F.coalesce(cond, F.lit(False))
        cols.append(safe.alias(name))
        keep = keep & safe
    cols.append(keep.alias("keep"))
    return out.select(*cols)
