"""Mergeable quantile sketches over unbounded value domains — a
deterministic-compaction KLL/MRL sketch (Karnin, Lang & Liberty,
FOCS'16 "Optimal quantile approximation in streams"; the alternating
deterministic compactor is the classic Manku–Rajagopalan–Lindsay
collapse, SIGMOD'98).

Why it matters at 100 TB: exact quantiles need a full sort (the
single most expensive thing a 100 TB job can do); the repo's
histogram sketch (sketch.py) is mergeable but needs a KNOWN bounded
value range, and Spark's built-in percentile_approx is a KLL whose
bytes are engine-opaque (rows-only checkable — the HLL posture).
This sketch keeps the mergeable-KLL scale shape with TRANSPARENT
state: plain (level, value) rows, weight 2^level, O(k log(n/k)) of
them per group, foldable in one map-only pass and re-compactable
anywhere.

Scale shape (the important part):

- pass 1 is MAP-ONLY ``mapInPandas``: each input partition folds its
  rows into a partial sketch at O(k log n) memory, streaming — a
  partition larger than memory is fine;
- the shuffle moves ONLY sketch rows (per group: partitions × k log n
  values, not data rows); stage 2 re-compacts each group's partial
  sketches with ``applyInPandas`` — safe precisely because the group
  is sketch-sized, never data-sized;
- ``kll_merge`` unions two sketch frames and re-compacts: per-day /
  per-source sketches roll up without touching raw data.

Guarantees kept EXACTLY (any row order, any partitioning):

- weight conservation: Σ 2^level over a group's rows == the group's
  row count (compaction promotes pairs, transferring weight);
- size bound: ≤ k rows per level, ≤ ~log2(n/k)+2 levels.

Rank error: each compaction at level h perturbs any rank by ≤ 2^h,
and level h suffers ≤ n/(k·2^h) compactions, giving the MRL-style
|est_rank - true_rank| ≤ O(n·log2(n/k)/k) worst case with the
alternating-parity deterministic compactor (no randomness anywhere —
reruns over the same partition layout are bit-identical).  Sketch
CONTENT depends on arrival order, like every streaming sketch
(percentile_approx included) — the guarantees above do not.

Quantile readout: rank r = ceil(q·n) by integer ceil-division on
millionth-quantized q (float ceil mis-rounds at representable
boundaries — the conformal.py idiom); the estimate is the smallest
value whose cumulative weight reaches r — a window cumsum over the
TINY sketch frame, never over data.

The reference has no quantile surface (exact dict aggregates only,
/root/reference/src/aggregator/price_aggregator.py:35-51); this is
the bounded-memory answer its price stream needs at web scale.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

KLL_K = 200


class _KLL:
    """Levels of value lists; level h rows carry weight 2^h.  Compacts
    a level when it exceeds k: sort, keep alternating elements (parity
    flips per compaction per level), promote them one level up.  An
    odd straggler stays behind, preserving total weight exactly."""

    def __init__(self, k: int):
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.parity: list[int] = [0]

    def _compact(self, h: int) -> None:
        buf = self.levels[h]
        if len(buf) <= self.k:
            return
        buf.sort()
        if len(self.levels) == h + 1:
            self.levels.append([])
            self.parity.append(0)
        if len(buf) % 2 == 1:
            keep_back = [buf[-1]]
            buf = buf[:-1]
        else:
            keep_back = []
        start = self.parity[h]
        self.parity[h] ^= 1
        self.levels[h + 1].extend(buf[start::2])
        self.levels[h] = keep_back
        self._compact(h + 1)

    def add_batch(self, values) -> None:
        self.levels[0].extend(float(v) for v in values)
        self._compact(0)

    def add_weighted(self, level: int, values) -> None:
        while len(self.levels) <= level:
            self.levels.append([])
            self.parity.append(0)
        self.levels[level].extend(float(v) for v in values)
        self._compact(level)

    def rows(self) -> Iterator[tuple[int, float]]:
        for h, buf in enumerate(self.levels):
            for v in buf:
                yield h, v


def _sketch_schema(by_fields: list[T.StructField]) -> T.StructType:
    return T.StructType(
        by_fields
        + [
            T.StructField("level", T.IntegerType()),
            T.StructField("value", T.DoubleType()),
        ]
    )


def _check_values(pdf: pd.DataFrame, col: str) -> None:
    bad = pdf[col].isna()
    if bad.any():
        raise ValueError(f"kll_sketch: NULL/NaN in {col} rejected")


def kll_sketch(
    df: DataFrame,
    value_col: str,
    k: int = KLL_K,
    by: list[str] | None = None,
) -> DataFrame:
    """Per-group sketch rows (by..., level, value).  Pass 1 folds each
    input partition map-only; pass 2 re-compacts per group over
    sketch-sized rows.  NULL/NaN values are rejected loudly."""
    if k < 8:
        raise ValueError(f"kll_sketch needs k >= 8, got {k}")
    by = list(by or [])
    by_fields = [df.schema[c] for c in by]
    out_schema = _sketch_schema(by_fields)

    def fold(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict[tuple, _KLL] = {}
        for pdf in pdfs:
            _check_values(pdf, value_col)
            if by:
                for key, sub in pdf.groupby(by, sort=False):
                    key = key if isinstance(key, tuple) else (key,)
                    sketches.setdefault(key, _KLL(k)).add_batch(
                        sub[value_col]
                    )
            else:
                sketches.setdefault((), _KLL(k)).add_batch(pdf[value_col])
        for key, sk in sketches.items():
            rows = list(sk.rows())
            out = pd.DataFrame(
                {
                    **{c: [key[i]] * len(rows) for i, c in enumerate(by)},
                    "level": [r[0] for r in rows],
                    "value": [r[1] for r in rows],
                }
            )
            yield out

    partials = df.select(*by, value_col).mapInPandas(fold, out_schema)
    return _recompact(partials, k, by, by_fields)


def _recompact(
    partials: DataFrame,
    k: int,
    by: list[str],
    by_fields: list[T.StructField],
) -> DataFrame:
    out_schema = _sketch_schema(by_fields)

    def compact(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = _KLL(k)
        # deterministic fold order over the sketch rows
        pdf = pdf.sort_values(["level", "value"])
        for level, sub in pdf.groupby("level", sort=True):
            sk.add_weighted(int(level), sub["value"])
        rows = list(sk.rows())
        key = tuple(pdf.iloc[0][c] for c in by)
        return pd.DataFrame(
            {
                **{c: [key[i]] * len(rows) for i, c in enumerate(by)},
                "level": [r[0] for r in rows],
                "value": [r[1] for r in rows],
            }
        )

    grouped = (
        partials.groupBy(*by)
        if by
        else partials.groupBy(F.lit(1).alias("_g"))
    )
    out = grouped.applyInPandas(compact, out_schema)
    return out


def kll_merge(
    a: DataFrame, b: DataFrame, k: int = KLL_K, by: list[str] | None = None
) -> DataFrame:
    """Union two sketch frames and re-compact per group — the roll-up
    path (weight conservation is exact; error budgets add like one
    sketch over the concatenated data)."""
    by = list(by or [])
    u = a.unionByName(b)
    by_fields = [u.schema[c] for c in by]
    return _recompact(u, k, by, by_fields)


def kll_quantiles(
    sketch: DataFrame,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    by: list[str] | None = None,
) -> DataFrame:
    """(by..., q, est): est = smallest sketch value whose cumulative
    weight reaches ceil(q*n) — integer ceil-division on
    millionth-quantized q; one window cumsum over sketch rows."""
    by = list(by or [])
    wg = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    w_cum = wg.orderBy("value", "level").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    weighted = sketch.withColumn(
        "w", F.expr("shiftleft(CAST(1 AS BIGINT), level)")
    )
    cum = weighted.withColumn("cw", F.sum("w").over(w_cum)).withColumn(
        "n", F.sum("w").over(wg)
    )
    outs = []
    for q in quantiles:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"kll_quantiles: q {q} outside (0, 1]")
        ppm = round(q * 10**6)
        # cw >= ceil(n*ppm/1e6)  <=>  cw * 1e6 >= n * ppm  for integer
        # cw — no division at all (exact for n*ppm < 2^63, i.e. n up
        # to ~9.2e12 rows per group).
        hit = cum.filter(F.col("cw") * F.lit(10**6) >= F.col("n") * ppm)
        first = (
            hit.withColumn(
                "rn",
                F.row_number().over(wg.orderBy("value", "level")),
            )
            .filter(F.col("rn") == 1)
            .select(*by, F.lit(q).alias("q"), F.col("value").alias("est"))
        )
        outs.append(first)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
