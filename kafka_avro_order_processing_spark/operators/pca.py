"""PCA over embedding columns — the covariance-free Gram-matrix route
(the classical two-pass algorithm: accumulate X'X distributed, solve
the d x d eigenproblem on the driver — the same shape MLlib's
RowMatrix.computePrincipalComponents ships, and the standard
preprocessing step before semantic dedup / clustering / IVF when the
raw embedding dimension is wasteful).

Scale shape: the corpus is touched ONCE to build the d(d+1)/2
upper-triangle second-moment entries — per-partition partial sums, a
shuffle of O(d^2 * partitions) skinny integer rows, never the corpus —
and the eigendecomposition is O(d^3) on a d x d driver matrix (d = a
few hundred for embedding models; the sanctioned model-sized driver
action).  Projection is a stateless Arrow-batched map with the k x d
component matrix shipped as a literal — no join, no shuffle.

Float discipline: each product x_i * x_j of two float32-derived
doubles is EXACT in f64 (24+24 mantissa bits), so quantizing it as
floor(x_i * x_j * 2^scale_bits + 0.5) -> BIGINT is reproducible on any
engine (floor of an exactly-representable argument — the SCALE.md
rounding idiom, no Double.toString dependence), and the Gram entries
are pure integer sums: bit-identical under any partitioning, equal
between the SQL and Arrow builders, and DuckDB-oracle-able
(suite-proven).  The single float descaling happens once per entry at
fit time on the driver.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd  # module-top: pandas_udf type hints resolve as strings
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE_BITS = 40


def _max_abs(scale_bits: int) -> float:
    """Largest |element| for which |v_i*v_j| * 2^scale_bits < 2^52, the
    floor() exactness bound both builders rely on (|x| <= 64 at the
    default 40 bits)."""
    return math.sqrt(float(1 << (52 - scale_bits)))


def _checked_vec_expr(vec_col: str, dim: int, max_abs: float, dtype: str) -> str:
    """SQL projection of ``vec_col`` that raises in-plan on the first
    NULL / wrong-length / NULL-element / over-magnitude vector — the
    single-pass replacement for a separate validation scan (r10
    verdict): the one corpus read IS the validation."""
    msg = (
        f"{vec_col}: NULL / wrong-length / NULL-element vector, or an "
        f"element with |x| > {max_abs!r} breaking the 2^52 floor() "
        f"exactness bound (expected array of {dim}) — filter explicitly"
    )
    quoted = msg.replace("'", "''")
    return (
        f"CASE WHEN `{vec_col}` IS NULL OR size(`{vec_col}`) != {dim}"
        f" OR exists(`{vec_col}`, x -> x IS NULL"
        f" OR isnan(CAST(x AS DOUBLE))"
        f" OR abs(CAST(x AS DOUBLE)) > {max_abs!r}D)"
        f" THEN CAST(raise_error('{quoted}') AS {dtype})"
        f" ELSE `{vec_col}` END"
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).filter("d IS NOT NULL").first()
    if row is None:
        raise ValueError(f"gram_matrix: no non-NULL {vec_col!r} vectors")
    return int(row["d"])


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    scale_bits: int = DEFAULT_SCALE_BITS,
    method: str = "arrow",
) -> DataFrame:
    """Upper-triangle second-moment matrix: (i, j, q) with 1 <= i <= j
    <= dim and q = SUM over rows of floor(v[i]*v[j]*2^scale_bits + 0.5)
    as DECIMAL(38,0) — exact integers, so the result is bit-identical
    under any partitioning and between both builders:

    - ``method="arrow"`` (default): mapInPandas, one numpy outer-product
      accumulation per bounded ROW CHUNK emitting d(d+1)/2 int64
      partials — O(rows * d^2) vectorized work at O(chunk * d^2)
      memory, the right builder for wide embeddings;
    - ``method="sql"``: pure JVM explode of the per-row triangle —
      Python-free and whole-stage-codegen'd, the right builder for
      narrow vectors and the oracle twin of the arrow path.

    Exactness bound (enforced IN the one corpus scan): |v[i]*v[j]| *
    2^scale_bits must stay below 2^52 for floor()'s argument to be
    exact, i.e. embeddings with |x| <= 64 at the default 40 bits.
    Both builders raise on the first vector that is NULL, wrong-length,
    NULL-elemented, or carries an element with |x| over the bound —
    folded into the scan itself (sql: in-plan ``raise_error``; arrow:
    a vectorized chunk check), so validation never costs a second pass
    and a wrapping partial can never be produced silently.  The arrow
    builder emits one int64 partial frame per ROW CHUNK of at most
    1024 rows (also capped so chunk * d^2 stays ~2^24 floats — bounded
    executor memory at any d), so a chunk partial is <= 1024 * 2^52 <
    2^63 BY CONSTRUCTION — never a silent wrap — and all cross-chunk
    summation happens in DECIMAL(38,0)."""
    if method not in ("arrow", "sql"):
        raise ValueError(f"method must be 'arrow' or 'sql', got {method!r}")
    if not (1 <= scale_bits <= 51):
        raise ValueError(f"scale_bits must be in [1, 51], got {scale_bits}")
    d = int(dim) if dim is not None else _infer_dim(df, vec_col)
    if d < 1:
        raise ValueError(f"dim must be >= 1, got {d}")
    ms = float(1 << scale_bits)
    max_abs = _max_abs(scale_bits)

    if method == "sql":
        vtype = df.schema[vec_col].dataType.simpleString()
        checked = _checked_vec_expr(vec_col, d, max_abs, vtype)
        tri = F.expr(
            f"flatten(transform(sequence(1, {d}), i ->"
            f" transform(sequence(i, {d}), j -> struct(i as i, j as j,"
            f" CAST(floor(CAST(element_at(__v, i) AS DOUBLE)"
            f" * CAST(element_at(__v, j) AS DOUBLE)"
            f" * {ms!r}D + 0.5D) AS BIGINT) as t))))"
        )
        exploded = (
            df.select(F.expr(checked).alias("__v"))
            .select(F.explode(tri).alias("e"))
            .select("e.i", "e.j", "e.t")
        )
        # cast BEFORE summing: a long sum would overflow at corpus scale
        return exploded.groupBy("i", "j").agg(
            F.sum(F.col("t").cast("decimal(38,0)")).cast("decimal(38,0)").alias("q")
        )

    # chunk rows so (a) the f64 outer-product tensor stays ~2^24
    # elements (bounded executor memory at any d) and (b) the int64
    # chunk partial cannot wrap: 1024 terms * 2^52 max-magnitude < 2^63
    chunk_rows = max(1, min(1024, (1 << 24) // (d * d)))

    def build(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        iu = np.triu_indices(d)
        bad_msg = (
            f"{vec_col}: NULL / wrong-length / NULL-element vector, or "
            f"an element with |x| > {max_abs!r} breaking the 2^52 "
            f"floor() exactness bound (expected array of {d}) — filter "
            "explicitly"
        )
        for pdf in batches:
            vecs = pdf[vec_col]
            if len(vecs) == 0:
                continue
            if any(v is None or len(v) != d for v in vecs):
                raise ValueError(bad_msg)
            V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            # NaN covers NULL elements (arrow nulls surface as NaN in
            # the float frame); the magnitude gate keeps every
            # |v_i*v_j|*2^scale_bits partial exactly representable
            if np.isnan(V).any() or np.abs(V).max() > max_abs:
                raise ValueError(bad_msg)
            for lo in range(0, len(V), chunk_rows):
                C = V[lo : lo + chunk_rows]
                P = np.einsum("ni,nj->nij", C, C)
                part = np.floor(P * ms + 0.5).astype(np.int64).sum(axis=0)[iu]
                yield pd.DataFrame(
                    {"i": iu[0] + 1, "j": iu[1] + 1, "t": part}
                ).astype({"i": "int32", "j": "int32"})

    partials = df.select(vec_col).mapInPandas(build, "i int, j int, t long")
    return partials.groupBy("i", "j").agg(
        F.sum(F.col("t").cast("decimal(38,0)")).cast("decimal(38,0)").alias("q")
    )


def _mean_ints(df: DataFrame, vec_col: str, d: int, ms: float) -> list[int]:
    """Per-dimension quantized sums (same floor idiom), one aggregation."""
    sums = df.select(
        F.expr(
            f"transform(sequence(1, {d}), i ->"
            f" CAST(floor(CAST(element_at({vec_col}, i) AS DOUBLE)"
            f" * {ms!r}D + 0.5D) AS BIGINT))"
        ).alias("v")
    ).agg(
        *[
            F.sum(F.element_at("v", i + 1).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias(f"s{i}")
            for i in range(d)
        ]
    ).collect()[0]
    return [int(sums[f"s{i}"]) for i in range(d)]


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    dim: int | None = None,
    center: bool = True,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> dict:
    """Fit a k-component PCA.  Returns the model dict {components
    (k x d), mean (d), eigenvalues (k, descending), ratio (k, shares of
    TOTAL variance), n, dim, center} — driver-sized, consumed by
    :func:`pca_project`.

    The covariance is assembled on the driver from the exact integer
    Gram entries and mean sums (C = E[xx'] - mu mu', scaled n/(n-1)),
    then numpy's symmetric eigensolver runs on the d x d matrix.  Sign
    convention: each component's largest-|loading| entry is made
    positive (first index on ties), so the model is deterministic, not
    just the subspace."""
    import numpy as np

    d = int(dim) if dim is not None else _infer_dim(df, vec_col)
    if not (1 <= k <= d):
        raise ValueError(f"k must be in [1, {d}], got {k}")
    n = df.filter(F.col(vec_col).isNotNull()).count()
    if n < 2:
        raise ValueError(f"pca_fit: needs >= 2 vectors, got {n}")
    ms = float(1 << scale_bits)

    gram = gram_matrix(df, vec_col, dim=d, scale_bits=scale_bits).collect()
    G = np.zeros((d, d))
    for r in gram:
        v = float(int(r["q"])) / ms  # one descale per entry
        G[r["i"] - 1, r["j"] - 1] = v
        G[r["j"] - 1, r["i"] - 1] = v

    if center:
        mu = np.array(_mean_ints(df, vec_col, d, ms), dtype=np.float64) / (ms * n)
        C = (G - n * np.outer(mu, mu)) / (n - 1)
    else:
        mu = np.zeros(d)
        C = G / (n - 1)

    eigval, eigvec = np.linalg.eigh(C)  # ascending
    order = np.argsort(eigval)[::-1]
    eigval, eigvec = eigval[order], eigvec[:, order]
    total = float(eigval.sum())
    comps = []
    for c in range(k):
        v = eigvec[:, c]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return {
        "components": comps,
        "mean": [float(x) for x in mu],
        "eigenvalues": [float(x) for x in eigval[:k]],
        "ratio": [float(x) / total if total > 0 else 0.0 for x in eigval[:k]],
        "n": int(n),
        "dim": d,
        "center": bool(center),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append the k-dim projection (x - mean) @ components' as
    array<double> — a stateless Arrow-batched map (the component matrix
    rides as a task literal, no join); NULL vectors project to NULL.
    Per-row numpy matmul, so row order / partitioning never affects any
    value."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    W = np.array(model["components"], dtype=np.float64)  # k x d
    mu = np.array(model["mean"], dtype=np.float64)
    d = model["dim"]

    @pandas_udf("array<double>")
    def proj(col: pd.Series) -> pd.Series:
        out = []
        for v in col:
            if v is None or len(v) != d:
                out.append(None)
            else:
                x = np.asarray(v, dtype=np.float64) - mu
                out.append((W @ x).tolist())
        return pd.Series(out, dtype=object)

    return df.withColumn(out_col, proj(F.col(vec_col)))
