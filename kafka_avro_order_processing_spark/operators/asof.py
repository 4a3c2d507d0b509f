"""As-of (nearest-prior-event) join — an operator Spark lacks natively.

Implemented as the union + ordered-window composition (the scalable
merge-asof): tag both sides, union them, and carry the right side's
latest row forward with last(ignoreNulls) over an ordered per-key
window.  One shuffle on the join key, no range explosion, no per-group
pandas — survives arbitrarily large sides (guide: "As-of / range join"
pattern; same shape as pd.merge_asof but distributed).

Semantics:
- a right row at the exact same timestamp counts as "prior"
  (matches ASOF JOIN ... ON left.ts >= right.ts in engines with the
  native operator);
- ties among right rows resolve to the greatest (ts, tiebreak) —
  deterministic given a unique tiebreak column;
- the matched right row is carried as ONE struct, so its columns can
  never mix across rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_value_cols: tuple[str, ...] = (),
    right_tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the most recent right row (same `on`
    key, right.ts <= left.ts); NULLs when no prior right row exists.

    Output: all left columns + right's ts as `{ts}{suffix}` + each
    right value column as `{col}{suffix}`.
    """
    rv = F.struct(
        F.col(ts).alias(f"{ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    # Keep the tiebreak's native type — casting e.g. a string id to
    # long would null it out and silently lose the determinism the
    # parameter exists for.
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        rv.alias("__rv"),
    )
    rv_type = r_tagged.schema["__rv"].dataType
    tb_type = r_tagged.schema["__tb"].dataType
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(rv_type).alias("__rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    r_full = r_tagged.withColumn("__left", F.lit(None).cast(l_tagged.schema["__left"].dataType))

    # Right rows sort before left rows on ts ties (__side 0 < 1); among
    # right ties the greatest tiebreak lands last and wins.
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_full).withColumn(
        "__match", F.last(F.col("__rv"), ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__side") == 1).select(
        F.col("__left.*"), F.col("__match.*")
    )


def asof_join_same_source(
    df: DataFrame,
    on: str,
    left_pred,
    right_pred,
    ts: str = "ts",
    left_cols: tuple[str, ...] | None = None,
    right_value_cols: tuple[str, ...] = (),
    right_tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """``asof_join(df.filter(left_pred), df.filter(right_pred), ...)``
    in ONE scan of ``df`` (r13 optimization, guide §2.4/§6): when both
    sides of the as-of come from the same table, the union-of-two-
    filtered-scans plan reads the fact table twice just to tag rows the
    single pass can tag with a conditional projection.  Each input row
    maps to exactly one side, so the tagged stream is row-for-row the
    union the generic operator builds — same window, same semantics,
    rows verified identical (suite-pinned against asof_join).

    CONTRACT: ``left_pred`` and ``right_pred`` must be DISJOINT (a row
    matching both would appear on both sides of the generic form but
    can only take one side here; it takes the left branch).  Rows
    matching neither are dropped, as in the generic form.  Predicates
    may evaluate to NULL: a row is a left row iff ``left_pred`` is
    TRUE, a right row iff ``right_pred`` is TRUE — the right-side
    payload is gated on ``right_pred`` itself, NOT on ``~left_pred``
    (under three-valued logic ``~NULL`` is NULL, which would keep the
    row as a right row but silently null out its carried value — the
    r13 ADVICE latent bug, fixed r14 and pinned with a NULL-evaluating
    predicate test).

    ``left_cols`` limits the carried left payload (default: all of
    ``df``'s columns, matching asof_join's output).
    """
    left_cols = tuple(left_cols) if left_cols is not None else tuple(df.columns)
    rv = F.struct(
        F.col(ts).alias(f"{ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    lv = F.struct(*[F.col(c) for c in left_cols])
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    tagged = df.filter(left_pred | right_pred).select(
        F.col(on).alias("__key"),
        F.col(ts).alias("__ts"),
        F.when(left_pred, F.lit(1)).otherwise(F.lit(0)).alias("__side"),
        F.when(right_pred, tb).alias("__tb"),
        F.when(right_pred, rv).alias("__rv"),
        F.when(left_pred, lv).alias("__left"),
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        "__match", F.last(F.col("__rv"), ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__side") == 1).select(
        F.col("__left.*"), F.col("__match.*")
    )
