"""Z-order (Morton) multi-column data layout — interleaved-bit
clustering keys, range-partitioned file layout, and zone-map pruning
statistics (Morton 1966; the layout technique behind data-skipping
indexes in modern lakehouse engines — see e.g. the OPTIMIZE ZORDER
literature and Lemire & Kaser, "Reordering columns for smaller
indexes", Inf. Sciences 2011).

Why it matters at 100 TB: parquet pruning is only as good as the
correlation between file boundaries and query predicates.  Sorting by
one column makes THAT column prunable and destroys locality for every
other; interleaving the bits of k quantized columns gives every
participating column ~1/k of its standalone pruning power
simultaneously — a rectangle predicate on any subset of the z-columns
touches a near-minimal set of files, because z-order preserves
multi-dimensional locality (nearby points share long key prefixes).
The written artifact is plain sorted parquet: engines prune it with
ordinary min/max zone maps, no index structure to maintain.

Everything here is INTEGER arithmetic end-to-end — affine
quantization by integer division, bit interleave by shift/mask/sum —
so z-keys hash-match an ANSI oracle exactly, and the layout is fully
deterministic (repartitionByRange on the key + sortWithinPartitions).

Scale shape: quantization bounds come from ONE global min/max
aggregation (a couple of longs per column); the layout itself is one
range-shuffle — exactly what a plain ORDER BY write costs, pruning
for k columns instead of one.  Zone maps are a per-partition
aggregation (spark_partition_id groupBy) — O(files) rows.

The repo's Avro OCF writer already z-orders ITS part files
(sources/avro_ocf.py write_avro_zordered, rank-based levels + header
stats pruning); this module is the format-agnostic relational layer —
exact-integer keys any engine reproduces, zone maps as DataFrames,
layouts for the parquet path.  The reference writes no files at all
(console sink only: /root/reference/src/consumer/order_consumer.py);
this is the layout step its pipeline would need first when the sink
becomes a data lake.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 10  # per-column resolution; k*bits must stay < 63


def quantize_minmax(
    col: Column, lo: int, hi: int, bits: int = ZORDER_BITS
) -> Column:
    """Affine-quantize an INTEGER column with known inclusive bounds
    [lo, hi] into [0, 2^bits): q = (x - lo) * 2^bits div (hi - lo + 1).
    Exact integer arithmetic: the div is computed as
    (a - a % span) / span — the numerator is an exact multiple of
    span below 2^53, so the IEEE division is exact (the raw
    floor(a/b) float idiom mis-rounds near integers).  Requires
    span * 2^bits < 2^53, validated here (bounds are driver-side
    ints).  Out-of-bounds values raise in-plan (the repo's loud
    single-pass idiom)."""
    if hi < lo:
        raise ValueError(f"quantize_minmax: hi {hi} < lo {lo}")
    span = hi - lo + 1
    if span * (2**bits) >= 2**53:
        raise ValueError(
            f"quantize_minmax: span {span} * 2^{bits} exceeds exact-double "
            "range 2^53"
        )
    a = (col.cast("long") - F.lit(lo)) * F.lit(2**bits)
    qi = ((a - a % F.lit(span)) / F.lit(span)).cast("long")
    return F.when(
        col.isNull() | (col < lo) | (col > hi),
        F.raise_error(
            F.concat(
                F.lit(f"quantize_minmax: value outside [{lo}, {hi}]: "),
                F.coalesce(col.cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(qi)


def zorder_key(quantized: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Interleave the bits of k already-quantized columns (each in
    [0, 2^bits)) into one Morton key: bit j of column c lands at
    position j*k + c.  k*bits must fit in a signed 64-bit key."""
    k = len(quantized)
    if k < 1:
        raise ValueError("zorder_key needs at least one column")
    if k * bits >= 63:
        raise ValueError(f"zorder_key: {k} cols x {bits} bits >= 63")
    terms: list[Column] = []
    for c_idx, q in enumerate(quantized):
        for j in range(bits):
            bit = F.shiftright(q, j).bitwiseAND(F.lit(1))
            terms.append(
                F.shiftleft(bit.cast("long"), j * k + c_idx)
            )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def zorder_key_auto(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS
) -> tuple[DataFrame, dict[str, tuple[int, int]]]:
    """Append ``zkey`` using bounds from ONE global min/max pass over
    the integer columns.  Returns (df + zkey, the bounds used) so the
    caller can quantize FUTURE batches consistently (incremental
    layout needs frozen bounds).  Columns must be integral — a float
    column would silently truncate through the quantizer's
    cast("long"), so it is rejected here where the schema is visible
    (quantize floats explicitly upstream, picking the resolution)."""
    for c in cols:
        t = df.schema[c].dataType.typeName()
        if t not in ("byte", "short", "integer", "long"):
            raise ValueError(
                f"zorder_key_auto: column {c!r} is {t}, not integral — "
                "quantize it explicitly first"
            )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    bounds = {c: (int(row[f"_lo_{c}"]), int(row[f"_hi_{c}"])) for c in cols}
    qs = [
        quantize_minmax(F.col(c), bounds[c][0], bounds[c][1], bits)
        for c in cols
    ]
    return df.withColumn("zkey", zorder_key(qs, bits)), bounds


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int, bits: int = ZORDER_BITS
) -> DataFrame:
    """Range-partition into ``n_files`` partitions by the z-key and
    sort within each — one range shuffle, after which a parquet write
    yields files whose per-column min/max zone maps are tight on
    EVERY z-column."""
    zdf, _ = zorder_key_auto(df, cols, bits)
    return zdf.repartitionByRange(n_files, "zkey").sortWithinPartitions(
        "zkey"
    )


def zone_maps(
    df: DataFrame, cols: list[str], file_col: str | None = None
) -> DataFrame:
    """Per-file min/max of each column — the pruning statistics a scan
    consults.  One narrow aggregation keyed by ``file_col`` when given
    (e.g. a deterministic z-bucket), else by spark_partition_id (the
    physical would-be-file; note repartitionByRange samples its
    boundaries, so physical assignment can vary across recomputations
    — pass an explicit ``file_col`` when determinism matters)."""
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    keyed = (
        df.withColumnRenamed(file_col, "_file")
        if file_col
        else df.withColumn("_file", F.spark_partition_id())
    )
    return keyed.groupBy("_file").agg(*aggs)


def zbucket(zkey: Column, n_files: int, k_cols: int, bits: int) -> Column:
    """Deterministic file id: the z-keyspace [0, 2^(k*bits)) cut into
    ``n_files`` equal arithmetic slices — keyspace-balanced (contrast
    repartitionByRange's row-balanced sampled boundaries), and exactly
    reproducible in any engine."""
    if k_cols * bits > 52:
        raise ValueError(
            f"zbucket: {k_cols} cols x {bits} bits exceeds the exact-double "
            "division range (2^52)"
        )
    space = 2 ** (k_cols * bits)
    width = (space + n_files - 1) // n_files
    a = zkey - zkey % F.lit(width)  # exact multiple of width, < 2^52
    return (a / F.lit(width)).cast("int")


def pruning_fraction(
    zmaps: DataFrame, predicate_bounds: dict[str, tuple[int, int]]
) -> float:
    """Fraction of files a rectangle predicate must read, judged by
    the zone maps: a file survives if its [min,max] intersects the
    predicate's [lo,hi] on EVERY queried column.  Driver-side over
    O(files) rows — the same decision a parquet reader makes."""
    cond = F.lit(True)
    for c, (lo, hi) in predicate_bounds.items():
        cond = cond & (F.col(f"max_{c}") >= lo) & (F.col(f"min_{c}") <= hi)
    total = zmaps.count()
    touched = zmaps.filter(cond).count()
    return touched / total if total else 0.0


def kll_range_boundaries(
    df: DataFrame, col: str, n_buckets: int, k: int = 256
) -> list[float]:
    """Row-balanced range boundaries from ONE map-only pass: the
    (i/n)-quantiles of ``col`` per the KLL sketch (operators/kll.py).
    Returns n_buckets-1 ascending boundary values (driver-side, tiny).

    This replaces repartitionByRange's reservoir sampling with an
    auditable, re-usable artifact: the boundaries are plain numbers
    you can freeze, version, and apply to FUTURE batches — and unlike
    the sampled partitioner they are identical on every recomputation
    of the same input layout.  Balance error inherits the sketch's
    rank bound (~n·log2(n/k)/k rows per bucket off ideal)."""
    from .kll import kll_quantiles, kll_sketch

    if n_buckets < 2:
        raise ValueError(f"kll_range_boundaries needs n_buckets >= 2")
    qs = tuple(i / n_buckets for i in range(1, n_buckets))
    sk = kll_sketch(df, col, k=k)
    rows = kll_quantiles(sk, qs).collect()
    return [r["est"] for r in sorted(rows, key=lambda r: r["q"])]


def range_bucket(col: Column, boundaries: list[float]) -> Column:
    """Bucket id = number of boundaries <= value (0..len(boundaries)).
    JVM-side array filter over a literal boundary array — exactly
    reproducible in ANSI SQL as a sum of CASEs."""
    if not boundaries:
        raise ValueError("range_bucket needs at least one boundary")
    if sorted(boundaries) != list(boundaries):
        raise ValueError("range_bucket boundaries must be ascending")
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(
        F.filter(arr, lambda b: b <= col.cast("double"))
    ).cast("int")


def zorder_layout_balanced(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = ZORDER_BITS,
    k: int = 256,
) -> DataFrame:
    """Deterministic, ROW-balanced z-order layout: Morton key, then
    KLL-quantile boundaries over the key, then a ``zbucket`` column
    that IS the file assignment — write with
    ``.write.partitionBy("zbucket")`` for a reproducible directory
    layout (no sampled partitioner anywhere).  Keyspace-equal
    ``zbucket`` slices balance badly when the data is skewed in the
    z-space; quantile boundaries balance rows by construction."""
    zdf, _ = zorder_key_auto(df, cols, bits)
    bounds = kll_range_boundaries(zdf, "zkey", n_files, k=k)
    return zdf.withColumn(
        "zbucket", range_bucket(F.col("zkey"), bounds)
    )
