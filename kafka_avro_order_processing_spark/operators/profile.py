"""One-pass table profiling — the "look before you train" step of a
data pipeline: per-column row/null counts, min/max, and distinct
cardinality for any DataFrame, computed in a SINGLE global aggregation.

Scale shape: every statistic here is an associative aggregate, so the
whole profile is one partial+final hash aggregation over the table —
no row shuffle (only the per-task partial states move), no per-column
extra passes, no collect.  Distinct counts default to
`approx_count_distinct` (HLL++: bounded, mergeable sketch state per
column) because an EXACT distinct per column is a full shuffle per
column; `exact=True` exists for small tables and for oracle checks.
The wide one-row aggregate is unpivoted to one-row-per-column with
`stack()` — still JVM-side, still one job.

The reference pipeline has no profiling analogue (its schema is fixed
by the Avro contract); this operator exists for the 100 TB curation
workflows where schema drift, null storms, and cardinality blowups are
discovered AFTER ingestion unless something cheap looks first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Spark can min/max any orderable type; maps are the common
    exception (structs/arrays order element-wise and are fine)."""
    return not isinstance(dt, T.MapType)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Profile `columns` (default: all) of `df` in one aggregation.

    Returns one row per column:
      column          name
      data_type       Spark simpleString of the column's type
      n_rows          table row count (repeated per row for autonomy)
      n_nulls         null count
      null_frac       n_nulls / n_rows as double (0.0 for empty table)
      min_value       min cast to string AFTER native-type comparison
                      (so numeric columns order numerically), NULL for
                      unorderable types (maps) or all-null columns
      max_value       likewise
      n_distinct      approx_count_distinct(rsd=approx_rsd), or the
                      exact distinct count when exact=True (small
                      tables / oracle parity only — exact is a
                      per-column shuffle at scale)
    """
    cols = list(columns) if columns is not None else list(df.columns)
    dtypes = {f.name: f.dataType for f in df.schema.fields if f.name in cols}
    one = df.agg(*_profile_aggs(cols, dtypes, exact, approx_rsd))
    return _unpivot_profile(one, cols, dtypes)


def _profile_aggs(cols, dtypes, exact: bool, approx_rsd: float) -> list:
    """The wide aggregate list — shared by the batch operator and the
    streaming twin (which forces exact=False: countDistinct is not a
    streaming aggregate; HLL++ state is)."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__nn__{c}"))
        if _orderable(dtypes[c]):
            aggs.append(F.min(col).cast("string").alias(f"__min__{c}"))
            aggs.append(F.max(col).cast("string").alias(f"__max__{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min__{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max__{c}"))
        if exact:
            aggs.append(F.countDistinct(col).alias(f"__nd__{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(col, rsd=approx_rsd).alias(f"__nd__{c}")
            )
    return aggs


def _unpivot_profile(one: DataFrame, cols, dtypes) -> DataFrame:
    """Unpivot the one wide row into one row per column, JVM-side."""
    parts = []
    for c in cols:
        parts.append(
            "'{c}', '{t}', `__nn__{q}`, `__min__{q}`, `__max__{q}`, `__nd__{q}`".format(
                c=c.replace("'", "''"),
                t=dtypes[c].simpleString().replace("'", "''"),
                q=c,
            )
        )
    stacked = one.select(
        F.col("__n_rows").alias("n_rows"),
        F.expr(
            "stack({n}, {args}) as"
            " (column, data_type, n_nonnull, min_value, max_value, n_distinct)".format(
                n=len(cols), args=", ".join(parts)
            )
        ),
    )
    return stacked.select(
        "column",
        "data_type",
        "n_rows",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_nulls"),
        F.when(F.col("n_rows") > 0,
               (F.col("n_rows") - F.col("n_nonnull"))
               / F.col("n_rows").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("null_frac"),
        "min_value",
        "max_value",
        "n_distinct",
    )


def column_topk(df: DataFrame, column: str, k: int = 10) -> DataFrame:
    """Top-k most frequent values of ONE column (ties break on the
    value's string form — total, engine-portable order).  Separate from
    :func:`profile_table` because value histograms genuinely need a
    shuffle on the column; run it on the columns the profile flagged,
    not on everything.  Returns (value: string, n, rank)."""
    from pyspark.sql import Window

    counted = (
        df.select(F.col(column).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("value"))
    # The global window runs over only the DISTINCT values that survive
    # a pre-filter: keep rows whose count ties or beats the k-th
    # per-partition candidate is overkill at this table's size — but a
    # single-partition window over distinct values IS the documented
    # cost here, so bound it: take the top k per shuffle partition
    # first (partial top-k), then rank the survivors globally.
    part_w = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.desc("n"), F.asc("value")
    )
    survivors = counted.withColumn("pr", F.row_number().over(part_w)).filter(
        F.col("pr") <= k
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("value", "n", F.col("rank").cast("int").alias("rank"))
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-level diff of two corpus snapshots — the "what changed
    in my training set" audit between curation runs (the row-level
    complement of the lake's part-level ``diff_versions``).  Returns
    one row per document id seen in EITHER snapshot:
    (id_col, status, old_hash, new_hash) with status in

    - ``added``      id only in the new snapshot
    - ``removed``    id only in the old snapshot
    - ``changed``    id in both, text content differs
    - ``unchanged``  id in both, text content identical

    Content compares by md5 of the text with NULL-SAFE equality, so
    two NULL texts are ``unchanged`` and NULL-vs-text is ``changed``
    (a nulled-out document is a real change, never silently equal).
    Summary counts are one ``groupBy("status").count()`` away.

    Scale shape: one map-side hash per side and ONE full-outer
    sort-merge join on the id — no content ever shuffles, only
    (id, 32-byte hash) pairs; ids are unique per snapshot by corpus
    contract (duplicate ids would fan the join out — run exact dedup
    first, which is the pipeline's own precondition)."""
    oh = old.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("old_hash")
    )
    nh = new.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("new_hash")
    )
    # presence markers survive the outer join even when a side's hash
    # is legitimately NULL (NULL text)
    joined = oh.withColumn("__in_old", F.lit(True)).join(
        nh.withColumn("__in_new", F.lit(True)), "__id", "full_outer"
    )
    return joined.select(
        F.col("__id").alias(id_col),
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("old_hash").eqNullSafe(F.col("new_hash")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        "old_hash",
        "new_hash",
    )
