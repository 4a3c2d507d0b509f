"""Re-identification risk audits — k-anonymity (Sweeney, IJUFKS 2002)
and l-diversity (Machanavajjhala et al., TKDD 2007) over
quasi-identifier columns: the published privacy checks a dataset
release (or a training corpus with user-derived metadata) runs before
shipping, complementing the engine's value-level PII detection
(operators/pii.py) with STRUCTURE-level disclosure risk — a table can
be PII-free by regex and still single out every user by (zip, age,
segment).

Definitions, exactly as published:
- an equivalence class is one distinct combination of the
  quasi-identifier values (SQL NULL is its own value — groupBy
  semantics, and the conservative reading: an unknown value still
  partitions the crowd);
- k(row) = size of the row's class; the table is k-anonymous at the
  smallest class size;
- l(class) = number of DISTINCT sensitive values inside the class;
  a class with l = 1 discloses its sensitive attribute to anyone who
  can place a person in it, no matter how large k is.

Everything is integer counting — two hash aggregations and a join —
so every output is exact, bit-deterministic under any partitioning,
and DuckDB-oracle-able (suite-proven through the driver
canonicalization).  Scale shape: one partial+final groupBy on the
quasi-identifier key (the only shuffle; a skewed giant class is one
hot key whose count still partial-aggregates map-side), one more for
the per-class distinct-sensitive count, and a broadcast-sized summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_cols(df: DataFrame, cols: list[str]) -> None:
    if not cols:
        raise ValueError("quasi-identifier column list must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")


def k_anonymity_classes(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    """One row per equivalence class: (*qi_cols, k) with k = class
    size.  The k-anonymity of the table is min(k) over this frame."""
    _check_cols(df, qi_cols)
    return df.groupBy(*qi_cols).agg(F.count(F.lit(1)).cast("long").alias("k"))


def k_anonymity_summary(
    df: DataFrame, qi_cols: list[str], k_required: int = 5
) -> DataFrame:
    """The release-gate card, one row: n_rows, n_classes, min_k
    (= the table's k-anonymity), n_unique_rows (classes of 1 — the
    journalist-risk numerator), n_rows_below_k / pct_rows_below_k
    against the required k.  An empty frame reports zeros and a NULL
    min_k."""
    if k_required < 1:
        raise ValueError(f"k_required must be >= 1, got {k_required}")
    classes = k_anonymity_classes(df, qi_cols)
    return classes.agg(
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("k").alias("min_k"),
        F.coalesce(F.sum(F.when(F.col("k") == 1, F.lit(1))), F.lit(0))
        .cast("long")
        .alias("n_unique_rows"),
        F.coalesce(
            F.sum(F.when(F.col("k") < k_required, F.col("k"))), F.lit(0)
        )
        .cast("long")
        .alias("n_rows_below_k"),
        (
            F.coalesce(
                F.sum(F.when(F.col("k") < k_required, F.col("k"))), F.lit(0)
            ).cast("double")
            / F.when(F.sum("k") > 0, F.sum("k").cast("double"))
        ).alias("pct_rows_below_k"),
    )


def with_class_size(
    df: DataFrame, qi_cols: list[str], out_col: str = "k"
) -> DataFrame:
    """Append each row's equivalence-class size — the per-row risk
    column (1/k is the row's prosecutor re-identification risk) a
    suppression or generalization pass filters on.  One aggregation +
    one NULL-SAFE join on the class key (a plain equi-join would drop
    every class keyed by a NULL quasi-identifier value — the exact
    rows an audit most needs to see)."""
    classes = k_anonymity_classes(df, qi_cols)
    renamed = classes.select(
        *[F.col(c).alias(f"__qi_{c}") for c in qi_cols],
        F.col("k").alias(out_col),
    )
    cond = None
    for c in qi_cols:
        clause = F.col(c).eqNullSafe(F.col(f"__qi_{c}"))
        cond = clause if cond is None else cond & clause
    return df.join(renamed, cond, "left").drop(
        *[f"__qi_{c}" for c in qi_cols]
    )


def l_diversity_classes(
    df: DataFrame, qi_cols: list[str], sensitive_col: str
) -> DataFrame:
    """One row per equivalence class: (*qi_cols, k, l) with l = EXACT
    distinct count of the sensitive attribute inside the class (NULL
    sensitive values do not count toward diversity — an absent
    diagnosis protects nobody).  Distinctness is computed by
    pre-grouping on (class, sensitive) — two narrow integer groupBys,
    never a per-group set."""
    _check_cols(df, qi_cols + [sensitive_col])
    per_value = df.groupBy(*qi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    return per_value.groupBy(*qi_cols).agg(
        F.sum("__n").cast("long").alias("k"),
        F.sum(F.when(F.col(sensitive_col).isNotNull(), F.lit(1)))
        .cast("long")
        .alias("__l_raw"),
    ).select(
        *qi_cols,
        "k",
        F.coalesce("__l_raw", F.lit(0)).cast("long").alias("l"),
    )


def l_diversity_summary(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l_required: int = 2,
) -> DataFrame:
    """One row: n_classes, min_l (the table's l-diversity),
    n_disclosing_classes (l <= 1 — homogeneous or all-NULL classes:
    membership discloses the sensitive value), n_rows_below_l /
    pct_rows_below_l against the required l."""
    if l_required < 1:
        raise ValueError(f"l_required must be >= 1, got {l_required}")
    classes = l_diversity_classes(df, qi_cols, sensitive_col)
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("l").alias("min_l"),
        F.coalesce(F.sum(F.when(F.col("l") <= 1, F.lit(1))), F.lit(0))
        .cast("long")
        .alias("n_disclosing_classes"),
        F.coalesce(
            F.sum(F.when(F.col("l") < l_required, F.col("k"))), F.lit(0)
        )
        .cast("long")
        .alias("n_rows_below_l"),
        (
            F.coalesce(
                F.sum(F.when(F.col("l") < l_required, F.col("k"))), F.lit(0)
            ).cast("double")
            / F.when(F.sum("k") > 0, F.sum("k").cast("double"))
        ).alias("pct_rows_below_l"),
    )
