"""Multiple-testing corrections — Benjamini–Hochberg FDR, Holm
step-down FWER, and Bonferroni adjusted p-values as window
aggregations (Benjamini & Hochberg, JRSS-B 1995; Holm, Scand. J.
Stat. 1979).

Why it matters at 100 TB: a metrics platform reads out MANY
hypotheses at once — every metric of every experiment of every
segment (the abtest.py family emits exactly such p-value frames).  At
5% per test, a thousand simultaneous readouts "detect" ~50 null
effects; the correction layer is what makes the fleet of tests
honest.  Each procedure is two window passes over the p-value frame
(rank ascending, then a running min/max in rank order) — the frame is
O(hypotheses), thousands of rows, so any partitioning works; ``by``
scopes the family (e.g. per experiment) and becomes the window key.

Determinism: adjusted values are (p * m) / rank and running
min/max — fixed-order IEEE arithmetic both engines reproduce exactly.
p-value ties are provably assignment-stable: rows with equal p always
receive equal adjusted values (the suffix-min / prefix-max absorbs
the rank difference), so the arbitrary row_number order among ties
cannot leak into the output — ranks themselves are therefore NOT
emitted.  Invalid p (NULL, NaN, outside [0,1]) raises in-plan via the
repo's single-pass ``raise_error`` idiom.

Procedures:

- ``bh_adjust``: step-up FDR.  q_i = min_{j >= i} (p_(j) * m / j),
  clipped to 1; reject q <= alpha (equivalent to the classic
  max-i criterion).
- ``holm_adjust``: step-down FWER.  adj_i = max_{j <= i}
  ((m - j + 1) * p_(j)), clipped to 1 — uniformly more powerful than
  Bonferroni with the same guarantee.
- ``bonferroni_adjust``: min(1, m * p), the blunt baseline.

The reference has no statistics surface at all; this completes the
experiment-readout layer its order stream would feed
(abtest.cuped_ab_test emits the p-value inputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _checked_p(p_col: str) -> Column:
    bad = (
        F.col(p_col).isNull()
        | F.isnan(F.col(p_col).cast("double"))
        | (F.col(p_col) < 0)
        | (F.col(p_col) > 1)
    )
    return F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(f"mtc: invalid p-value in {p_col}: "),
                F.coalesce(F.col(p_col).cast("string"), F.lit("NULL")),
            )
        ).cast("double"),
    ).otherwise(F.col(p_col).cast("double"))


def _ranked(df: DataFrame, p_col: str, by: list[str]):
    wg = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    checked = df.withColumn("_p", _checked_p(p_col))
    return (
        checked.withColumn("m", F.count("*").over(wg))
        .withColumn(
            "_rn", F.row_number().over(wg.orderBy("_p"))
        ),
        wg,
    )


def bh_adjust(
    df: DataFrame,
    p_col: str,
    by: list[str] | None = None,
    alpha: float = 0.05,
) -> DataFrame:
    """Append ``m`` (family size), ``p_adj`` (BH q-value) and
    ``reject`` (q <= alpha) per family.  Controls FDR at alpha for
    independent / PRDS p-values."""
    by = list(by or [])
    ranked, wg = _ranked(df, p_col, by)
    raw = (F.col("_p") * F.col("m")) / F.col("_rn")
    w_suffix = (
        wg.orderBy(F.col("_rn").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    q = F.least(F.lit(1.0), F.min(raw).over(w_suffix))
    return (
        ranked.withColumn("p_adj", q)
        .withColumn("reject", F.col("p_adj") <= alpha)
        .drop("_p", "_rn")
    )


def holm_adjust(
    df: DataFrame, p_col: str, by: list[str] | None = None,
    alpha: float = 0.05,
) -> DataFrame:
    """Append ``m``, ``p_adj`` (Holm step-down) and ``reject``.
    Controls FWER at alpha with no dependence assumptions."""
    by = list(by or [])
    ranked, wg = _ranked(df, p_col, by)
    raw = F.col("_p") * (F.col("m") - F.col("_rn") + 1)
    w_prefix = (
        wg.orderBy(F.col("_rn").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    adj = F.least(F.lit(1.0), F.max(raw).over(w_prefix))
    return (
        ranked.withColumn("p_adj", adj)
        .withColumn("reject", F.col("p_adj") <= alpha)
        .drop("_p", "_rn")
    )


def bonferroni_adjust(
    df: DataFrame, p_col: str, by: list[str] | None = None,
    alpha: float = 0.05,
) -> DataFrame:
    """Append ``m``, ``p_adj`` = min(1, m*p) and ``reject``."""
    by = list(by or [])
    wg = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    checked = df.withColumn("_p", _checked_p(p_col))
    return (
        checked.withColumn("m", F.count("*").over(wg))
        .withColumn(
            "p_adj", F.least(F.lit(1.0), F.col("_p") * F.col("m"))
        )
        .withColumn("reject", F.col("p_adj") <= alpha)
        .drop("_p")
    )
