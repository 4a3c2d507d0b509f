"""Streaming always-valid A/B monitoring — the peeking twin: the
per-arm integer moments accumulate as update-mode streaming
aggregation state (exactly :func:`operators.abtest.ab_arm_stats`'s
state), and EVERY MICRO-BATCH IS A LOOK — the epoch-stamped changelog
replays the cumulative readout at each epoch and the mSPRT running-min
p (Johari et al., KDD'17) is computed over that look sequence.  This
is the deployment the always-valid guarantee exists for: a dashboard
that recomputes p after every micro-batch stays type-I-error-valid no
matter how often anyone refreshes it.

Exactness contract (suite-pinned): the FINAL look's cumulative
moments are the batch moments on the same rows (integer sums;
micro-batch boundaries cannot move them), so the final diff/se equal
:func:`operators.abtest.msprt_ab_test`'s EXACTLY and lambda/p at libm
tolerance.  Intermediate looks are a function of where the micro-batch
boundaries fell — that is the semantics of peeking, not a tolerance.

The changelog drain here keeps the ``__epoch`` stamp (the standard
:func:`drain_to_df` folds it away — latest-per-key is the right
semantics for every other twin, but the look SEQUENCE is the whole
point of this one), which is why this module carries its own small
foreachBatch drain rather than reusing the shared one.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.abtest import DEFAULT_SCALE_BITS, _arm_moments


def _drain_changelog(stream_df: DataFrame) -> DataFrame:
    """Bounded availableNow drain of an update-mode aggregation,
    KEEPING the per-epoch changelog: one row per (key, epoch-the-key-
    changed-in), stamped __epoch.  Distributed end-to-end (parquet
    sink, lazy scan back).

    An EMPTY source stream never materializes the sink directory (no
    micro-batch writes), so only the path-does-not-exist
    AnalysisException maps to an empty frame; every other read failure
    (corrupt sink, permissions) re-raises rather than being
    misreported downstream as a missing-arms ValueError."""
    from pyspark.errors import AnalysisException

    spark = stream_df.sparkSession
    tag = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"drainlog_{tag}_")
    sink, chk = f"{base}/sink", f"{base}/chk"

    def _delta(df: DataFrame, epoch_id: int) -> None:
        df.withColumn("__epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(sink)

    q = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(_delta)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        return spark.read.parquet(sink)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return spark.createDataFrame(
                [], schema=stream_df.withColumn("__epoch", F.lit(0)).schema
            )
        raise


def streaming_always_valid_pvalues(
    stream_df: DataFrame,
    metric_col: str,
    arm_col: str,
    tau: float = 1.0,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> DataFrame:
    """One row per micro-batch epoch: (look, n_a, n_b, diff, se, lam,
    p_always) — the cumulative mSPRT readout at that look with the
    running-min always-valid p.  Looks where either arm has n < 2
    carry NULL diff/se/lam and p_always = 1 (no variance estimate
    yet).  Output column semantics match
    :func:`operators.abtest.always_valid_pvalues` with the epoch id
    as the bucket.

    Scale shape: the unbounded part is O(arms) streaming aggregation
    state; the look table is O(epochs x arms) — driver-tick-sized, so
    the trailing windows over looks are the conformal-class documented
    bound."""
    if tau <= 0:
        raise ValueError(
            f"streaming_always_valid_pvalues: tau must be > 0, got {tau}"
        )
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    ms = float(1 << scale_bits)
    tau2 = float(tau) * float(tau)
    from ..operators.abtest import _trajectory_rows, _trajectory_schema

    log = _drain_changelog(
        _arm_moments(
            stream_df, metric_col, arm_col, scale_bits,
            "streaming_always_valid_pvalues",
        )
    )
    # The changelog is O(epochs x arms) — driver-tick-sized — so the
    # carry-forward and the per-look readout assemble DRIVER-SIDE on
    # Python ints through the exact machinery the batch trajectory
    # uses (operators/abtest.py::_trajectory_rows; shared code IS the
    # twins' bit-match guarantee, and the final-look pin against
    # msprt_ab_test keeps the drain honest).  This replaced the r12
    # epochs-x-arms grid (crossJoin + two window passes) and its
    # in-plan n*syy - sy*sy decimal product, whose n^2 B^2 2^(2s)
    # < 10^38 cap bounded cumulative n; arbitrary-precision ints
    # have no such cap.
    rows = log.select("__epoch", "arm", "n", "sy", "syy").collect()
    arms = sorted({r["arm"] for r in rows})
    if len(arms) != 2:
        raise ValueError(
            "streaming_always_valid_pvalues: need exactly 2 arms, got "
            f"{arms!r} — filter or split multi-arm experiments into "
            "pairwise readouts"
        )
    a, b = arms
    # update-mode changelog rows are cumulative per-arm snapshots
    # stamped with the epoch they changed in: carry each arm's latest
    # snapshot forward across the ordered epoch sequence
    snap: dict = {}
    for r in rows:
        snap.setdefault(r["__epoch"], {})[r["arm"]] = (
            int(r["n"]), int(r["sy"]), int(r["syy"])
        )
    state = {a: (0, 0, 0), b: (0, 0, 0)}
    looks = []
    for ep in sorted(snap):
        for arm, cell in snap[ep].items():
            state[arm] = cell
        looks.append((ep, *state[a], *state[b]))
    return log.sparkSession.createDataFrame(
        _trajectory_rows(looks, ms, tau2),
        _trajectory_schema("look", log.schema["__epoch"].dataType),
    )




def streaming_mann_whitney_u(
    stream_df: DataFrame,
    metric_col: str,
    arm_col: str,
    quantize_bits: int | None = None,
) -> dict:
    """Streaming twin of :func:`operators.abtest.mann_whitney_u`: the
    per-(arm, distinct-value) count table — the test's sufficient
    statistic — accumulates as update-mode streaming aggregation
    state, and the drained table feeds the identical readout.
    BIT-matches batch on the same rows (integer counts cannot be
    moved by micro-batch boundaries; suite-pinned).  State is
    O(arms x distinct metric values) — for a continuous unbounded
    metric pass ``quantize_bits=s`` (the batch opt-in; see the batch
    docstring's cardinality contract) to bound BOTH the streaming
    state and the readout's single-task distinct-value window."""
    from ..operators.abtest import (
        _arm_checked,
        _q_expr,
        mann_whitney_u_from_counts,
    )
    from .pipeline import drain_to_df

    op = "streaming_mann_whitney_u"
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        v_expr = _q_expr(metric_col, quantize_bits, op)
    else:
        s = F.col(metric_col).cast("double")
        msg = f"{op}: NULL/NaN {metric_col} row — filter explicitly first"
        v_expr = F.when(
            s.isNull() | F.isnan(s),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    cells = (
        stream_df.select(
            _arm_checked(arm_col, op).alias("arm"), v_expr.alias("v")
        )
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    drained = drain_to_df(cells, "update", key_cols=("arm", "v"))
    return mann_whitney_u_from_counts(drained)


def streaming_kruskal_wallis(
    stream_df: DataFrame,
    metric_col: str,
    group_col: str,
    quantize_bits: int | None = None,
) -> dict:
    """Streaming twin of :func:`operators.abtest.kruskal_wallis`, the
    same sufficient-statistic pattern as
    :func:`streaming_mann_whitney_u`: the (group, distinct-value)
    count table accumulates as update-mode streaming aggregation
    state and the drained table feeds the identical readout
    (kruskal_wallis_from_counts).  BIT-matches batch on the same rows
    — integer counts cannot be moved by micro-batch boundaries
    (suite-pinned).  State is O(groups x distinct metric values); for
    a continuous unbounded metric pass ``quantize_bits=s`` (the batch
    opt-in's cardinality contract) to bound both the state and the
    readout's single-task distinct-value window."""
    from ..operators.abtest import _q_expr, kruskal_wallis_from_counts
    from .pipeline import drain_to_df

    op = "streaming_kruskal_wallis"
    gmsg = f"{op}: NULL {group_col} row — filter explicitly first"
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        v_expr = F.when(
            F.col(group_col).isNull(),
            F.raise_error(F.lit(gmsg)).cast("long"),
        ).otherwise(_q_expr(metric_col, quantize_bits, op))
    else:
        s = F.col(metric_col).cast("double")
        msg = (
            f"{op}: NULL/NaN {metric_col} or NULL {group_col} row — "
            "filter explicitly first"
        )
        v_expr = F.when(
            s.isNull() | F.isnan(s) | F.col(group_col).isNull(),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    cells = (
        stream_df.select(
            F.col(group_col).cast("string").alias("g"), v_expr.alias("v")
        )
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    drained = drain_to_df(cells, "update", key_cols=("g", "v"))
    return kruskal_wallis_from_counts(drained)

def streaming_quantile_treatment_effects(
    stream_df: DataFrame,
    metric_col: str,
    arm_col: str,
    ppms: tuple[int, ...] = (250_000, 500_000, 750_000),
    quantize_bits: int | None = None,
) -> DataFrame:
    """Streaming twin of
    :func:`operators.abtest.quantile_treatment_effects`: the
    (arm, distinct-value) count table — the same sufficient statistic
    the U test drains — accumulates as update-mode streaming
    aggregation state; the drained table feeds the identical integer
    quantile-selection readout, so the output is bit-equal to batch
    on the same rows (suite-pinned).  State is O(arms x distinct
    metric values); ``quantize_bits`` bounds it for continuous
    metrics (the batch contract), with the same dequantization of the
    emitted quantiles."""
    from ..operators.abtest import (
        _arm_checked,
        _q_expr,
        quantile_treatment_effects_from_counts,
    )
    from .pipeline import drain_to_df

    op = "streaming_quantile_treatment_effects"
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        v_expr = _q_expr(metric_col, quantize_bits, op)
    else:
        s = F.col(metric_col).cast("double")
        msg = f"{op}: NULL/NaN {metric_col} row — filter explicitly first"
        v_expr = F.when(
            s.isNull() | F.isnan(s),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    cells = (
        stream_df.select(
            _arm_checked(arm_col, op).alias("arm"), v_expr.alias("v")
        )
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    drained = drain_to_df(cells, "update", key_cols=("arm", "v"))
    out = quantile_treatment_effects_from_counts(drained, ppms)
    if quantize_bits is not None:
        ms = float(1 << quantize_bits)
        out = out.select(
            "ppm", "arm_a", "arm_b",
            (F.col("q_a") / F.lit(ms)).alias("q_a"),
            (F.col("q_b") / F.lit(ms)).alias("q_b"),
            (F.col("qte") / F.lit(ms)).alias("qte"),
        )
    return out


def streaming_quantile_treatment_effect_cis(
    stream_df: DataFrame,
    metric_col: str,
    arm_col: str,
    ppms: tuple[int, ...] = (250_000, 500_000, 750_000),
    confidence_ppm: int = 950_000,
    quantize_bits: int | None = None,
) -> DataFrame:
    """Streaming twin of
    :func:`operators.abtest.quantile_treatment_effect_cis`: the same
    (arm, distinct-value) count-table state as the QTE twin, drained
    into the identical rank-band readout — bit-equal to batch on the
    same rows (suite-pinned; integer counts cannot be moved by
    micro-batch boundaries, and the betai rank searches run on the
    drained exact n).  State is O(arms x distinct metric values);
    ``quantize_bits`` bounds it (the batch contract)."""
    from ..operators.abtest import (
        _arm_checked,
        _check_confidence_ppm,
        _q_expr,
        quantile_treatment_effect_cis_from_counts,
    )
    from .pipeline import drain_to_df

    op = "streaming_quantile_treatment_effect_cis"
    _check_confidence_ppm(confidence_ppm, op)
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        v_expr = _q_expr(metric_col, quantize_bits, op)
    else:
        s = F.col(metric_col).cast("double")
        msg = f"{op}: NULL/NaN {metric_col} row — filter explicitly first"
        v_expr = F.when(
            s.isNull() | F.isnan(s),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    cells = (
        stream_df.select(
            _arm_checked(arm_col, op).alias("arm"), v_expr.alias("v")
        )
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    drained = drain_to_df(cells, "update", key_cols=("arm", "v"))
    out = quantile_treatment_effect_cis_from_counts(
        drained, ppms, confidence_ppm
    )
    if quantize_bits is not None:
        ms = float(1 << quantize_bits)
        vals = ["q_a", "lo_a", "hi_a", "q_b", "lo_b", "hi_b",
                "qte", "qte_lo", "qte_hi"]
        out = out.select(
            "ppm", "arm_a", "arm_b",
            *[(F.col(c) / F.lit(ms)).alias(c) for c in vals],
        )
    return out


def streaming_wilcoxon_signed_rank(
    stream_df: DataFrame,
    x_col: str,
    y_col: str,
    quantize_bits: int | None = None,
) -> dict:
    """Streaming twin of
    :func:`operators.abtest.wilcoxon_signed_rank`: the per-distinct-
    |d| (v, cpos, cneg, czero) count table accumulates as update-mode
    streaming aggregation state (associative integer sums — batch
    boundaries cannot move them) and the drained table feeds the
    identical readout, bit-equal to batch on the same rows
    (suite-pinned).  State is O(distinct |d| values);
    ``quantize_bits`` bounds it (the batch cardinality contract)."""
    from ..operators.abtest import (
        _q_expr,
        wilcoxon_signed_rank_from_counts,
    )
    from .pipeline import drain_to_df

    op = "streaming_wilcoxon_signed_rank"
    dx = F.col(x_col).cast("double")
    dy = F.col(y_col).cast("double")
    proj = stream_df.select((dy - dx).alias("d"))
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        d_expr = _q_expr("d", quantize_bits, op)
    else:
        s = F.col("d").cast("double")
        msg = (
            f"{op}: NULL/NaN difference row ({y_col} - {x_col}) — "
            "filter explicitly first"
        )
        d_expr = F.when(
            s.isNull() | F.isnan(s),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    cells = (
        proj.select(d_expr.alias("dd"))
        .select(F.abs(F.col("dd")).alias("v"), F.signum("dd").alias("sgn"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("sgn") > 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias("cpos"),
            F.sum(F.when(F.col("sgn") < 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias("cneg"),
            F.sum(F.when(F.col("sgn") == 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias("czero"),
        )
    )
    drained = drain_to_df(cells, "update", key_cols=("v",))
    return wilcoxon_signed_rank_from_counts(drained)


def streaming_hodges_lehmann_shift(
    stream_df: DataFrame,
    metric_col: str,
    arm_col: str,
    confidence_ppm: int = 950_000,
    quantize_bits: int | None = None,
    max_cells: int = 1_000_000,
) -> dict:
    """Streaming twin of
    :func:`operators.abtest.hodges_lehmann_shift`: the (arm,
    distinct-value) count table — the shift estimate's sufficient
    statistic — accumulates as update-mode streaming aggregation
    state; the drained table feeds the identical driver-side
    selection, bit-equal to batch on the same rows (suite-pinned).
    State is O(arms x distinct metric values); ``quantize_bits``
    bounds it (the batch contract), and ``max_cells`` bounds the
    drained driver collect loudly."""
    from ..operators.abtest import (
        _arm_checked,
        _check_confidence_ppm,
        _q_expr,
        hodges_lehmann_shift_from_counts,
    )
    from .pipeline import drain_to_df

    op = "streaming_hodges_lehmann_shift"
    _check_confidence_ppm(confidence_ppm, op)
    if quantize_bits is not None:
        if not (1 <= quantize_bits <= 43):
            raise ValueError(
                f"{op}: quantize_bits must be in [1, 43], got "
                f"{quantize_bits}"
            )
        v_expr = _q_expr(metric_col, quantize_bits, op)
    else:
        s = F.col(metric_col).cast("double")
        msg = f"{op}: NULL/NaN {metric_col} row — filter explicitly first"
        v_expr = F.when(
            s.isNull() | F.isnan(s),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(s)
    cells = (
        stream_df.select(
            _arm_checked(arm_col, op).alias("arm"), v_expr.alias("v")
        )
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    drained = drain_to_df(cells, "update", key_cols=("arm", "v"))
    out = hodges_lehmann_shift_from_counts(
        drained, confidence_ppm, max_cells
    )
    if quantize_bits is not None:
        ms = float(1 << quantize_bits)
        for key in ("shift", "ci_lo", "ci_hi"):
            out[key] = out[key] / ms
    return out


def streaming_spearman_corr(
    stream_df: DataFrame,
    x_col: str,
    y_col: str,
    quantize_bits: int | None = None,
) -> dict:
    """Streaming twin of :func:`operators.abtest.spearman_corr`: the
    joint (x, y) count table — rho's sufficient statistic — as
    update-mode streaming aggregation state; the drained table feeds
    spearman_corr_from_counts.  Bit-equal to batch on the same rows
    (suite-pinned).  State is O(distinct (x, y) pairs) — for
    continuous columns pass ``quantize_bits=s`` (the batch
    cardinality contract) to bound both the state and the readout's
    single-task distinct-value windows."""
    from ..operators.abtest import _q_expr, spearman_corr_from_counts
    from .pipeline import drain_to_df

    op = "streaming_spearman_corr"
    if quantize_bits is not None and not (1 <= quantize_bits <= 43):
        raise ValueError(
            f"{op}: quantize_bits must be in [1, 43], got {quantize_bits}"
        )

    def _checked(col):
        if quantize_bits is not None:
            return _q_expr(col, quantize_bits, op)
        c = F.col(col).cast("double")
        msg = f"{op}: NULL/NaN {col} row — filter explicitly first"
        return F.when(
            c.isNull() | F.isnan(c),
            F.raise_error(F.lit(msg)).cast("double"),
        ).otherwise(c)

    cells = (
        stream_df.select(_checked(x_col).alias("x"),
                         _checked(y_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    drained = drain_to_df(cells, "update", key_cols=("x", "y"))
    return spearman_corr_from_counts(drained)


def streaming_winsorized_ab_test(
    stream_df: DataFrame,
    metric_col: str,
    arm_col: str,
    lower_ppm: int = 10_000,
    upper_ppm: int = 990_000,
    scale_bits: int = 20,
) -> dict:
    """Streaming twin of :func:`operators.abtest.winsorized_ab_test`:
    the quantized (arm, v, c) count table accumulates as update-mode
    streaming aggregation state and the drained table feeds the
    identical threshold-and-clamp readout
    (winsorized_ab_test_from_counts) — bit-equal to batch on the same
    rows (suite-pinned).  State is O(arms x 2^scale_bits-bounded
    distinct buckets); scale_bits is the cardinality knob."""
    from ..operators.abtest import (
        _arm_checked,
        _q_expr,
        winsorized_ab_test_from_counts,
    )
    from .pipeline import drain_to_df

    op = "streaming_winsorized_ab_test"
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    cells = (
        stream_df.select(
            _arm_checked(arm_col, op).alias("arm"),
            _q_expr(metric_col, scale_bits, op).alias("v"),
        )
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    drained = drain_to_df(cells, "update", key_cols=("arm", "v"))
    return winsorized_ab_test_from_counts(
        drained.localCheckpoint(eager=False),
        lower_ppm, upper_ppm, scale_bits,
    )


def streaming_trimmed_mean_ab_test(
    stream_df: DataFrame,
    metric_col: str,
    arm_col: str,
    lower_ppm: int = 100_000,
    upper_ppm: int = 900_000,
    scale_bits: int = 20,
) -> dict:
    """Streaming twin of
    :func:`operators.abtest.trimmed_mean_ab_test` (Yuen's test): the
    quantized (arm, v, c) count table accumulates as update-mode
    streaming aggregation state and the drained table feeds the
    identical trim-and-test readout — bit-equal to batch on the same
    rows (suite-pinned).  State is O(arms x bounded buckets);
    scale_bits is the cardinality knob."""
    from ..operators.abtest import (
        _arm_checked,
        _q_expr,
        trimmed_mean_ab_test_from_counts,
    )
    from .pipeline import drain_to_df

    op = "streaming_trimmed_mean_ab_test"
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    cells = (
        stream_df.select(
            _arm_checked(arm_col, op).alias("arm"),
            _q_expr(metric_col, scale_bits, op).alias("v"),
        )
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    drained = drain_to_df(cells, "update", key_cols=("arm", "v"))
    return trimmed_mean_ab_test_from_counts(
        drained.localCheckpoint(eager=False),
        lower_ppm, upper_ppm, scale_bits,
    )


def streaming_proportion_ab_test(
    stream_df: DataFrame,
    success_col: str,
    arm_col: str,
    confidence_ppm: int = 950_000,
) -> dict:
    """Streaming twin of :func:`operators.abtest.proportion_ab_test`:
    per-arm (n, x) integer sums as update-mode streaming aggregation
    state (associative — micro-batch boundaries provably cannot move
    them); the drained latest-per-arm rows feed the identical
    Clopper-Pearson + pooled-z assembly.  Bit-equal to batch on the
    same rows (suite-pinned).  State is O(arms)."""
    from ..operators.abtest import (
        _arm_checked,
        _check_confidence_ppm,
        _proportion_assemble,
    )
    from .pipeline import drain_to_df

    op = "streaming_proportion_ab_test"
    _check_confidence_ppm(confidence_ppm, op)
    dt = stream_df.schema[success_col].dataType.simpleString()
    s = F.col(success_col)
    if dt not in ("boolean", "tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"{op}: {success_col!r} must be boolean or integer 0/1, got "
            f"{dt} — cast explicitly first"
        )
    sx = s.cast("long")
    msg = (
        f"{op}: NULL or non-0/1 {success_col} row — filter explicitly "
        "first"
    )
    checked = F.when(
        sx.isNull() | ~sx.isin(0, 1),
        F.raise_error(F.lit(msg)).cast("long"),
    ).otherwise(sx)
    cells = (
        stream_df.select(_arm_checked(arm_col, op).alias("arm"),
                         checked.alias("x"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("x"),
        )
    )
    rows = drain_to_df(cells, "update", key_cols=("arm",)).collect()
    return _proportion_assemble(rows, confidence_ppm, op)


__all__ = [
    "streaming_always_valid_pvalues",
    "streaming_hodges_lehmann_shift",
    "streaming_kruskal_wallis",
    "streaming_mann_whitney_u",
    "streaming_proportion_ab_test",
    "streaming_quantile_treatment_effect_cis",
    "streaming_quantile_treatment_effects",
    "streaming_spearman_corr",
    "streaming_trimmed_mean_ab_test",
    "streaming_wilcoxon_signed_rank",
    "streaming_winsorized_ab_test",
]
