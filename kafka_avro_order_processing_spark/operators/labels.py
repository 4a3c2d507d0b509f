"""Crowd / multi-annotator label aggregation — the training-label
quality layer of a data-curation pipeline: majority vote with a
deterministic tiebreak, per-worker agreement audits, and the classical
Dawid–Skene EM (Dawid & Skene 1979, "Maximum Likelihood Estimation of
Observer Error-Rates Using the EM Algorithm") that learns per-worker
confusion matrices and re-weights votes by estimated reliability —
the published standard that majority vote is the baseline for
(Snow et al. EMNLP'08; Passonneau & Carpenter TACL'14 use the same
model family).

Why this operator set: every labeled-data pipeline at scale has
redundant annotations (human raters, model ensembles, weak-labeling
functions), and "which label wins" + "which annotator to trust" are
exactly the two questions these operators answer.  No counterpart
exists in Spark's built-ins.

The module also carries the inter-annotator AGREEMENT statistics a
labeling operation reports before trusting any aggregate: Cohen's
kappa (1960; scalar and all-pairs table), Fleiss' kappa (1971;
fixed panels), and Krippendorff's alpha (2011; ragged panels,
nominal, ordinal and interval difference functions) — all assembled from
exact integer counts (Fraction arithmetic on the driver; the only
pre-assembly float in the interval form is the one rating
quantization, which cancels in alpha).

Scale shape:

- ``majority_vote`` / ``worker_agreement``: integer groupBys + one
  per-item window — the word-count class of job, DuckDB-oracle-able
  exactly (counts are integers; rates are single f64 divisions of
  exact integers, correctly rounded on any engine).
- ``dawid_skene``: the label table is shuffled ONCE into an
  item-partitioned, item-sorted layout and localCheckpoint'ed; each
  EM iteration is then a SHUFFLE-FREE ``mapInPandas`` over the
  contiguous item runs (one Python call per arrow batch, not per
  item — per-item state is that item's label rows, skew bounded by
  the most-annotated item) emitting integer M-step contributions,
  plus ONE tiny-keyed integer groupBy collected to the driver.  The
  model (class priors + one K x K confusion matrix per worker) is
  O(workers * K^2) — the sanctioned driver/model budget, same as
  k-means centroids; it ships back into the next E-step as a
  task-literal dict.

Float discipline (the repo rule — see operators/nb.py): per-item
E-step math runs vectorized in numpy (deterministic for a FIXED
item's rows, independent of partitioning), each posterior is
quantized ONCE to a 2^52-scaled integer, and every cross-item
aggregation — M-step confusion numerators, denominators, and class
priors — is a DECIMAL(38,0) sum of those integers, so the fitted
model and the final posteriors are bit-identical under any
partitioning or rerun.  The M-step divisions happen on the driver
from exact collected integers in one fixed expression order.
ln()/exp() are not IEEE-portable across engines, so the EM pins
against a Python replica at tolerance while the integer vote tables
carry exact DuckDB oracles (the lm.py / nb.py convention).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Posterior quantization scale: 2^52 (the repo-wide MEAN_SCALE).
_POST_SCALE = float(1 << 52)


def _checked_cols(df: DataFrame, cols: list[str], op: str) -> DataFrame:
    """Project ``df`` with NULL rejection folded into the scan (the
    single-pass in-plan raise_error pattern — no validation pre-scan)."""
    cond = None
    for c in cols:
        cond = F.col(c).isNull() if cond is None else cond | F.col(c).isNull()
    msg = f"{op}: NULL {' / '.join(cols)} row — filter explicitly first"
    first = cols[0]
    checked = F.when(cond, F.raise_error(F.lit(msg)).cast(
        df.schema[first].dataType.simpleString()
    )).otherwise(F.col(first))
    return df.select(
        checked.alias(first), *[F.col(c) for c in cols[1:]]
    )


def majority_vote(
    labels: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
) -> DataFrame:
    """One row per item: the winning label by vote count with a
    DETERMINISTIC tiebreak (most votes, then smallest label in the
    label column's native ordering).  Returns (item_col, label,
    n_votes, n_total, vote_frac); ``vote_frac`` is one f64 division
    of exact integers.  NULL items/workers/labels are rejected loudly
    in the same scan that counts the votes."""
    rows = _checked_cols(labels, [item_col, worker_col, label_col],
                         "majority_vote")
    votes = rows.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_votes")
    )
    w = Window.partitionBy(item_col).orderBy(
        F.desc("n_votes"), F.asc(label_col)
    )
    totals = Window.partitionBy(item_col)
    return (
        votes.withColumn("n_total", F.sum("n_votes").over(totals).cast("long"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            item_col,
            label_col,
            "n_votes",
            "n_total",
            (F.col("n_votes").cast("double") / F.col("n_total").cast("double")
             ).alias("vote_frac"),
        )
    )


def worker_agreement(
    labels: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-worker agreement with the majority: (worker_col, n_labels,
    n_agree, agree_rate) over every label instance the worker
    produced.  The broadcast side is the per-item winner table
    (O(items) rows but only 2 skinny columns; at corpus scale the
    join keys co-partition on item — one shuffle)."""
    rows = _checked_cols(labels, [item_col, worker_col, label_col],
                         "worker_agreement")
    winners = majority_vote(labels, item_col, worker_col, label_col).select(
        item_col, F.col(label_col).alias("__maj")
    )
    return (
        rows.join(winners, item_col)
        .select(
            worker_col,
            (F.col(label_col) == F.col("__maj")).cast("long").alias("__hit"),
        )
        .groupBy(worker_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_labels"),
            F.sum("__hit").cast("long").alias("n_agree"),
        )
        .withColumn(
            "agree_rate",
            F.col("n_agree").cast("double") / F.col("n_labels").cast("double"),
        )
    )


def _estep_fn(classes: list, model: dict | None, emit: str):
    """E-step for mapInPandas over the item-partitioned, item-sorted
    layout.  ``model`` None = the vote-fraction initialization (the
    standard Dawid–Skene start).  ``emit='m'`` yields integer M-step
    contribution rows; ``emit='post'`` yields the quantized posterior
    rows.  The within-item fold order is the layout's (worker, label)
    SORT order — Spark's binary string ordering; an exactness replica
    must sort the same way (ASCII-identical to Python's)."""
    import numpy as np
    import pandas as pd

    k = len(classes)
    cls_idx = {c: i for i, c in enumerate(classes)}

    def one_item(pdf, out):
        """Score ONE item's (already (worker, label)-sorted) rows and
        append its output rows to the ``out`` column lists.  The fold
        order is fixed by the partition sort, so the posterior is
        bit-identical under any partitioning."""
        item = pdf["__item"].iloc[0]
        obs = np.array([cls_idx[v] for v in pdf["__label"]], dtype=np.int64)
        cnt = pdf["__n"].to_numpy(dtype=np.int64)
        if model is None:
            # vote-fraction posterior: votes_j / total (exact ints -> f64)
            v = np.zeros(k, dtype=np.float64)
            np.add.at(v, obs, cnt.astype(np.float64))
            post = v / v.sum()
        else:
            s = model["log_prior"].copy()
            for w, o, n in zip(pdf["__worker"], obs, cnt):
                s = s + float(n) * model["log_pi"][w][:, o]
            s -= s.max()
            e = np.exp(s)
            post = e / e.sum()
        # the ONE quantization: everything summed across items is
        # integer from here on
        post_q = np.floor(post * _POST_SCALE + 0.5).astype(np.int64)
        if emit == "post":
            out["__item"].extend([item] * k)
            out["__class"].append(np.arange(k, dtype=np.int32))
            out["__post_q"].append(post_q)
            return
        # M-step rows: per (worker, obs label, class): n * post_q(class),
        # plus one prior row per class (worker NULL)
        n_rows = len(pdf)
        out["__worker"].extend(list(pdf["__worker"]) * k + [None] * k)
        out["__obs"].append(
            np.concatenate([np.tile(obs, k), np.full(k, -1)]).astype(np.int32)
        )
        out["__class"].append(
            np.concatenate(
                [np.repeat(np.arange(k), n_rows), np.arange(k)]
            ).astype(np.int32)
        )
        out["__contrib"].append(
            np.concatenate(
                [(cnt[None, :] * post_q[:, None]).reshape(-1), post_q]
            )
        )

    def flush(out):
        if emit == "post":
            return pd.DataFrame(
                {
                    "__item": out["__item"],
                    "__class": np.concatenate(out["__class"]),
                    "__post_q": np.concatenate(out["__post_q"]),
                }
            )
        return pd.DataFrame(
            {
                "__worker": pd.Series(out["__worker"], dtype=object),
                "__obs": np.concatenate(out["__obs"]),
                "__class": np.concatenate(out["__class"]),
                "__contrib": np.concatenate(out["__contrib"]),
            }
        )

    def fresh():
        return (
            {"__item": [], "__class": [], "__post_q": []}
            if emit == "post"
            else {"__worker": [], "__obs": [], "__class": [], "__contrib": []}
        )

    def run(batches):
        """mapInPandas driver: the input is repartitioned by __item and
        sorted (__item, __worker, __label) within partitions, so an
        item's rows are contiguous; the tail item of each arrow batch
        may continue in the next and is carried over."""
        pending = None
        for pdf in batches:
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if len(pdf) == 0:
                continue
            tail_mask = (pdf["__item"] == pdf["__item"].iloc[-1]).to_numpy()
            # contiguity: the tail item occupies a suffix of the batch
            cut = len(pdf) - int(tail_mask[::-1].argmin() or len(pdf))
            pending = pdf.iloc[cut:]
            work = pdf.iloc[:cut]
            if len(work) == 0:
                continue
            out = fresh()
            codes, starts = _group_starts(work["__item"])
            for i, lo in enumerate(starts):
                hi = starts[i + 1] if i + 1 < len(starts) else len(work)
                one_item(work.iloc[lo:hi], out)
            yield flush(out)
        if pending is not None and len(pending):
            out = fresh()
            one_item(pending, out)
            yield flush(out)

    return run


def _group_starts(series):
    """Start offsets of each contiguous equal-value run in a pandas
    Series (the input is pre-sorted, so runs == groups)."""
    import numpy as np

    codes = series.factorize()[0]
    starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
    return codes, starts


def dawid_skene(
    labels: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
    n_iter: int = 10,
    alpha: float = 0.01,
) -> tuple[DataFrame, dict]:
    """Dawid–Skene observer-error EM.  Returns ``(posts, model)``:

    - ``posts``: (item_col, label_col, posterior, map_label) — one row
      per (item, class) with the class posterior and the item's MAP
      label flag (ties broken toward the smaller class in label-sorted
      order, deterministic);
    - ``model``: {classes, log-space priors, per-worker K x K
      confusion matrices pi[true, observed], n_iter, alpha} — the
      reliability audit a curation run actually reads.

    ``alpha`` is add-alpha smoothing on the confusion counts and
    priors (keeps zero-count cells finite — the standard fix).
    Iterations are FIXED (``n_iter``), not convergence-tested, so two
    runs do identical work — determinism over adaptivity, the repo
    rule.  Per-item label multiplicity n per (item, worker, label)
    must stay <= 2^10 so n * post_q fits an int64 by construction
    (enforced); realistic annotation data has n = 1.
    """
    rows = _checked_cols(labels, [item_col, worker_col, label_col],
                         "dawid_skene")
    counts = (
        rows.select(
            F.col(item_col).alias("__item"),
            F.col(worker_col).alias("__worker"),
            F.col(label_col).alias("__label"),
        )
        .groupBy("__item", "__worker", "__label")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    return dawid_skene_from_counts(
        counts,
        item_type=labels.schema[item_col].dataType.simpleString(),
        worker_type=labels.schema[worker_col].dataType.simpleString(),
        label_type=labels.schema[label_col].dataType.simpleString(),
        item_col=item_col,
        label_col=label_col,
        n_iter=n_iter,
        alpha=alpha,
    )


def dawid_skene_from_counts(
    counts: DataFrame,
    item_type: str,
    worker_type: str,
    label_type: str,
    item_col: str = "item_id",
    label_col: str = "label",
    n_iter: int = 10,
    alpha: float = 0.01,
) -> tuple[DataFrame, dict]:
    """The EM of :func:`dawid_skene` running directly on the
    (__item, __worker, __label, __n) count table — the model's
    SUFFICIENT STATISTIC, which is what makes the streaming twin exact:
    a count table maintained as update-mode streaming aggregation state
    folds to the identical integers, so feeding the drained table here
    BIT-matches the batch fit on the same rows (suite-pinned in
    streaming/labels.py's tests)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    import numpy as np

    # in-plan bound so n * post_q (<= n * 2^52) cannot wrap an int64
    counts = counts.withColumn(
        "__n",
        F.when(
            F.col("__n") > (1 << 10),
            F.raise_error(F.lit(
                "dawid_skene: more than 1024 identical (item, worker, "
                "label) rows — aggregate duplicates upstream"
            )).cast("long"),
        ).otherwise(F.col("__n")),
    )
    # the layout every iteration re-reads: shuffle ONCE into
    # item-partitioned, (__item, __worker, __label)-sorted form and pin
    # it — each EM iteration is then a SHUFFLE-FREE mapInPandas over
    # contiguous item runs (one Python call per arrow batch, not per
    # item) plus the tiny-keyed M-step aggregate.  This is the whole
    # difference between O(n_iter) corpus shuffles and one.
    counts = (
        counts.repartition("__item")
        .sortWithinPartitions("__item", "__worker", "__label")
        .localCheckpoint(eager=True)
    )

    classes = [
        r["__label"]
        for r in counts.select("__label").distinct().orderBy("__label").collect()
    ]
    if len(classes) < 2:
        raise ValueError(
            f"dawid_skene: needs >= 2 distinct labels, got {classes!r}"
        )
    k = len(classes)
    n_items = counts.select("__item").distinct().count()

    m_schema = (
        f"__worker {worker_type}, __obs int, __class int, __contrib long"
    )
    post_schema = f"__item {item_type}, __class int, __post_q long"

    model = None  # iteration 0 = vote-fraction init
    for _ in range(n_iter):
        msums = (
            counts.mapInPandas(_estep_fn(classes, model, "m"), m_schema)
            .groupBy("__worker", "__obs", "__class")
            .agg(
                F.sum(F.col("__contrib").cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .alias("__s")
            )
            .collect()
        )
        # driver M-step from exact integers, fixed expression order
        prior_sums = [0] * k
        conf: dict = {}
        for r in msums:
            if r["__worker"] is None:
                prior_sums[r["__class"]] += int(r["__s"])
            else:
                conf.setdefault(r["__worker"], np.zeros((k, k), dtype=object))[
                    r["__class"], r["__obs"]
                ] += int(r["__s"])
        tot = sum(prior_sums)
        log_prior = np.array(
            [
                math.log((float(p) + alpha * _POST_SCALE)
                         / (float(tot) + k * alpha * _POST_SCALE))
                for p in prior_sums
            ]
        )
        log_pi = {}
        for w in sorted(conf, key=str):
            m = conf[w]
            lp = np.empty((k, k), dtype=np.float64)
            for j in range(k):
                denom = float(sum(int(m[j, o]) for o in range(k)))
                for o in range(k):
                    lp[j, o] = math.log(
                        (float(int(m[j, o])) + alpha * _POST_SCALE)
                        / (denom + k * alpha * _POST_SCALE)
                    )
            log_pi[w] = lp
        model = {"log_prior": log_prior, "log_pi": log_pi}

    posts = counts.mapInPandas(
        _estep_fn(classes, model, "post"), post_schema
    )
    cls_df = posts.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(classes)],
        f"__class int, {label_col} {label_type}",
    )
    w = Window.partitionBy("__item").orderBy(
        F.desc("__post_q"), F.asc("__class")
    )
    out = (
        posts.join(F.broadcast(cls_df), "__class")
        .withColumn("map_label", (F.row_number().over(w) == 1))
        .select(
            F.col("__item").alias(item_col),
            label_col,
            (F.col("__post_q").cast("double") / F.lit(_POST_SCALE)
             ).alias("posterior"),
            "map_label",
        )
    )
    pi = {
        w_: np.exp(model["log_pi"][w_]) for w_ in model["log_pi"]
    }
    return out, {
        "classes": classes,
        "log_prior": [float(x) for x in model["log_prior"]],
        "prior": [float(math.exp(x)) for x in model["log_prior"]],
        "pi": {w_: pi[w_].tolist() for w_ in pi},
        "n_items": int(n_items),
        "n_iter": int(n_iter),
        "alpha": float(alpha),
    }


# ------------------------------------------------- agreement statistics


def cohen_kappa(
    labels: DataFrame,
    worker_a,
    worker_b,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
) -> dict:
    """Cohen's kappa (Cohen 1960) between two specific annotators over
    the items BOTH labeled: {n_items, po, pe, kappa}.  Exact integer
    form: with confusion counts n_ab over shared items,

        kappa = (n * agree - sum_l rowsum_l * colsum_l)
                / (n^2     - sum_l rowsum_l * colsum_l)

    — one float division of exact Python bigints, so the readout is
    bit-deterministic and engine-independent.  A worker labeling the
    same item twice breaks the contingency semantics and raises.
    Scale: one equi-join on item between two single-worker slices plus
    O(K^2) collected confusion cells."""
    rows = _checked_cols(labels, [item_col, worker_col, label_col],
                         "cohen_kappa")
    a = rows.filter(F.col(worker_col) == F.lit(worker_a)).select(
        item_col, F.col(label_col).alias("__la")
    )
    b = rows.filter(F.col(worker_col) == F.lit(worker_b)).select(
        item_col, F.col(label_col).alias("__lb")
    )
    for side, nm in ((a, worker_a), (b, worker_b)):
        dup = (
            side.groupBy(item_col).count().filter(F.col("count") > 1).count()
        )
        if dup:
            raise ValueError(
                f"cohen_kappa: worker {nm!r} labeled {dup} item(s) more "
                "than once — aggregate duplicates upstream"
            )
    conf = (
        a.join(b, item_col)
        .groupBy("__la", "__lb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    if not conf:
        raise ValueError(
            f"cohen_kappa: workers {worker_a!r} and {worker_b!r} share "
            "no items"
        )
    n = sum(int(r["c"]) for r in conf)
    agree = sum(int(r["c"]) for r in conf if r["__la"] == r["__lb"])
    row_sum: dict = {}
    col_sum: dict = {}
    for r in conf:
        row_sum[r["__la"]] = row_sum.get(r["__la"], 0) + int(r["c"])
        col_sum[r["__lb"]] = col_sum.get(r["__lb"], 0) + int(r["c"])
    pe_num = sum(
        row_sum[l] * col_sum.get(l, 0) for l in sorted(row_sum, key=str)
    )
    denom = n * n - pe_num
    kappa = float(n * agree - pe_num) / float(denom) if denom else float("nan")
    return {
        "n_items": n,
        "po": agree / n,
        "pe": pe_num / (n * n),
        "kappa": kappa,
    }


def pairwise_cohen_kappa(
    labels: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
    min_shared: int = 1,
) -> DataFrame:
    """Cohen's kappa for EVERY annotator pair: (worker_a, worker_b,
    n_items, n_agree, pe_num, kappa) with worker_a < worker_b — the
    reliability matrix a labeling operation audits.  The kappa column
    is the same exact-integer expression as :func:`cohen_kappa`,
    evaluated in-plan, so the whole table is DuckDB-oracle-able
    (suite-proven).  Degenerate pairs (pe = 1, e.g. both workers used
    a single identical label everywhere) report NULL kappa.

    Scale: one self-join on item (co-partitioned equi-join) producing
    one row per co-labeled (item, pair); per-pair marginals come from
    two grouped counts joined back on (pair, label) — every stage is
    a keyed integer aggregate.  Duplicate (worker, item) labels raise
    in-plan via the n*(n-1)/2 pair expansion check upstream callers
    should have done; here they are rejected by a grouped guard."""
    rows = _checked_cols(labels, [item_col, worker_col, label_col],
                         "pairwise_cohen_kappa")
    one = rows.groupBy(item_col, worker_col).agg(
        F.count(F.lit(1)).alias("__m"),
        F.min(label_col).alias("__l"),
    )
    one = one.withColumn(
        "__l",
        F.when(
            F.col("__m") > 1,
            F.raise_error(F.lit(
                "pairwise_cohen_kappa: a worker labeled the same item "
                "more than once — aggregate duplicates upstream"
            )).cast(labels.schema[label_col].dataType.simpleString()),
        ).otherwise(F.col("__l")),
    ).select(item_col, worker_col, "__l")
    lhs = one.select(
        F.col(item_col).alias("__i"),
        F.col(worker_col).alias("wa"),
        F.col("__l").alias("__la"),
    )
    rhs = one.select(
        F.col(item_col).alias("__i"),
        F.col(worker_col).alias("wb"),
        F.col("__l").alias("__lb"),
    )
    pairs = lhs.join(rhs, "__i").filter(F.col("wa") < F.col("wb"))
    base = pairs.groupBy("wa", "wb").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum((F.col("__la") == F.col("__lb")).cast("long"))
        .cast("long").alias("n_agree"),
    )
    ma = pairs.groupBy("wa", "wb", F.col("__la").alias("__l")).agg(
        F.count(F.lit(1)).cast("long").alias("ca")
    )
    mb = pairs.groupBy("wa", "wb", F.col("__lb").alias("__l")).agg(
        F.count(F.lit(1)).cast("long").alias("cb")
    )
    pe = (
        ma.join(mb, ["wa", "wb", "__l"])
        .groupBy("wa", "wb")
        .agg(
            F.sum(
                (F.col("ca").cast("decimal(19,0)")
                 * F.col("cb").cast("decimal(19,0)")).cast("decimal(38,0)")
            ).cast("decimal(38,0)").alias("pe_num")
        )
    )
    dn = F.col("n_items").cast("decimal(19,0)")
    denom = (dn * dn).cast("decimal(38,0)") - F.col("pe_num")
    kappa_num = (
        dn * F.col("n_agree").cast("decimal(19,0)")
    ).cast("decimal(38,0)") - F.col("pe_num")
    return (
        # LEFT join: a pair whose workers share no label value at all
        # has pe_num = 0 (every rowsum * colsum product is 0), not a
        # missing row
        base.join(pe, ["wa", "wb"], "left")
        .withColumn(
            "pe_num",
            F.coalesce(F.col("pe_num"), F.lit(0).cast("decimal(38,0)")),
        )
        .filter(F.col("n_items") >= int(min_shared))
        .select(
            F.col("wa").alias("worker_a"),
            F.col("wb").alias("worker_b"),
            "n_items",
            "n_agree",
            F.col("pe_num").cast("long").alias("pe_num"),
            F.when(
                denom != F.lit(0).cast("decimal(38,0)"),
                kappa_num.cast("double") / denom.cast("double"),
            ).alias("kappa"),
        )
    )


def fleiss_kappa(
    labels: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
) -> dict:
    """Fleiss' kappa (Fleiss 1971) for a fixed panel size: every item
    must carry the SAME number of ratings n >= 2 (the statistic is
    undefined otherwise — for ragged panels use
    :func:`krippendorff_alpha_nominal`; a ragged frame raises).
    Returns {n_items, n_raters, po, pe, kappa} with po/pe/kappa
    assembled from exact integer sums via fractions.Fraction — no
    accumulated float error, one final float conversion each.
    Scale: two integer groupBys (per-(item,label) counts, then the
    sum of squares + per-class totals), O(K) driver state."""
    from fractions import Fraction

    rows = _checked_cols(labels, [item_col, worker_col, label_col],
                         "fleiss_kappa")
    cell = rows.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_item = cell.groupBy(item_col).agg(
        F.sum("c").cast("long").alias("ni")
    )
    distinct_n = [r["ni"] for r in per_item.select("ni").distinct().collect()]
    if len(distinct_n) != 1 or distinct_n[0] < 2:
        raise ValueError(
            f"fleiss_kappa: needs a constant panel of >= 2 ratings per "
            f"item, got per-item counts {sorted(distinct_n)!r} — use "
            "krippendorff_alpha_nominal for ragged panels"
        )
    n_r = int(distinct_n[0])
    agg = cell.agg(
        F.sum(
            (F.col("c").cast("decimal(19,0)") * F.col("c").cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("ss"),
    ).collect()[0]
    ss = int(agg["ss"])
    n_items = per_item.count()
    ctot = {
        r[label_col]: int(r["ct"])
        for r in cell.groupBy(label_col)
        .agg(F.sum("c").cast("long").alias("ct"))
        .collect()
    }
    total = n_items * n_r
    po = Fraction(ss - total, n_items * n_r * (n_r - 1))
    pe = Fraction(
        sum(c * c for _, c in sorted(ctot.items(), key=lambda kv: str(kv[0]))),
        total * total,
    )
    kappa = (
        float((po - pe) / (1 - pe)) if pe != 1 else float("nan")
    )
    return {
        "n_items": int(n_items),
        "n_raters": n_r,
        "po": float(po),
        "pe": float(pe),
        "kappa": kappa,
    }


def _kripp_assemble(dnum_by_den: dict, n: int, n_items: int,
                    de_num: int, de_den: int, op: str,
                    unit_scale: int = 1) -> dict:
    """Exact Fraction assembly of alpha = 1 - Do/De from per-panel-size
    disagreement sums.  dnum_by_den maps (n_u - 1) -> exact integer
    sum of per-item pairwise disagreements over items with that panel
    size; De is the exact global rational de_num/de_den.  unit_scale
    descales the REPORTED do/de back to the caller's units (the
    interval form's quantized squared differences carry a 2^(2*s)
    factor that cancels in alpha but not in do/de)."""
    from fractions import Fraction

    do = Fraction(0)
    for den in sorted(dnum_by_den):
        do += Fraction(dnum_by_den[den], den)
    do /= n * unit_scale
    if de_num == 0:
        return {
            "n_values": n, "n_items": n_items, "do": float(do),
            "de": 0.0, "alpha": float("nan"),
        }
    de = Fraction(de_num, de_den * unit_scale)
    return {
        "n_values": n,
        "n_items": n_items,
        "do": float(do),
        "de": float(de),
        "alpha": float(1 - do / de),
    }


def krippendorff_alpha_nominal(
    labels: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
) -> dict:
    """Krippendorff's alpha with the nominal difference function
    (Krippendorff 2011, "Computing Krippendorff's Alpha-Reliability")
    — the ragged-panel agreement statistic: items may have any number
    of ratings; items with fewer than 2 are excluded (standard).

        alpha = 1 - D_o / D_e
        D_o   = (1/n) * sum_u [ sum_{i != j in u} delta_ij / (n_u - 1) ]
        D_e   = sum_{i != j over ALL values} delta_ij / (n (n - 1))

    with nominal delta (0 if equal, 1 otherwise), so the per-item
    pairwise disagreement count is n_u^2 - sum_c n_uc^2.

    EXACT, no quantization anywhere: the per-item integer numerators
    group by PANEL SIZE (n_u - 1 takes at most max-panel distinct
    values), each group's sum collects as an exact decimal, and the
    mixed-denominator sum assembles on the driver with
    fractions.Fraction — alpha is one final float conversion of an
    exact rational, bit-identical under any partitioning and equal to
    the brute-force pair-counting replica EXACTLY (suite).  Returns
    {n_values, n_items, do, de, alpha}.
    Scale: two integer groupBys + one O(distinct-panel-sizes) collect
    — no joins, no windows; skew bounded by the most-annotated item."""
    rows = _checked_cols(labels, [item_col, worker_col, label_col],
                         "krippendorff_alpha_nominal")
    cell = rows.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_item = Window.partitionBy(item_col)
    per = (
        cell.withColumn("nu", F.sum("c").over(w_item).cast("long"))
        .filter(F.col("nu") >= 2)
    )
    # per-item disagreement count sum_c c*(nu - c) = nu^2 - sum_c c^2,
    # exact in decimal, then grouped by panel size
    item_d = per.groupBy(item_col, "nu").agg(
        F.sum(
            (F.col("c").cast("decimal(19,0)")
             * (F.col("nu") - F.col("c")).cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("dnum")
    )
    by_den = (
        item_d.groupBy((F.col("nu") - 1).alias("den"))
        .agg(
            F.sum("dnum").cast("decimal(38,0)").alias("dsum"),
            F.sum("nu").cast("long").alias("nsum"),
            F.count(F.lit(1)).cast("long").alias("items"),
        )
        .collect()
    )
    if not by_den:
        raise ValueError(
            "krippendorff_alpha_nominal: no item has >= 2 ratings"
        )
    dnum_by_den = {int(r["den"]): int(r["dsum"]) for r in by_den}
    n = sum(int(r["nsum"]) for r in by_den)
    n_items = sum(int(r["items"]) for r in by_den)
    ctot = [
        int(r["ct"])
        for r in per.groupBy(label_col)
        .agg(F.sum("c").cast("long").alias("ct"))
        .orderBy(label_col)
        .collect()
    ]
    de_num = n * n - sum(c * c for c in ctot)
    return _kripp_assemble(
        dnum_by_den, n, n_items, de_num, n * (n - 1),
        "krippendorff_alpha_nominal",
    )


def krippendorff_alpha_interval(
    labels: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    value_col: str = "value",
    scale_bits: int = 20,
) -> dict:
    """Krippendorff's alpha with the INTERVAL difference function
    delta_ij = (v_i - v_j)^2 — the agreement statistic for numeric
    ratings (quality scores, Likert scales read as numbers).  Same
    exclusion rule and exact assembly as the nominal form; the only
    float manufactured before the final conversions is the ONE
    quantization of each rating (floor(v * 2^scale_bits + 0.5), the
    abtest.py idiom), after which

        sum_{i != j in u} (q_i - q_j)^2 = 2 * (n_u * sum q^2 - (sum q)^2)

    is exact decimal arithmetic, grouped by panel size and assembled
    driver-side with Fraction (alpha is scale-invariant in the
    quantization factor, which cancels between Do and De).  Ratings
    must satisfy |v| < 2^(44 - scale_bits) (in-plan loud bound) and
    panels stay within decimal headroom for any realistic rater count.
    Returns {n_values, n_items, do, de, alpha}; pinned against a
    brute-force pair replica EXACTLY (suite)."""
    from .abtest import _dprod, _q_expr

    op = "krippendorff_alpha_interval"
    if not (1 <= scale_bits <= 43):
        raise ValueError(f"scale_bits must be in [1, 43], got {scale_bits}")
    imsg = f"{op}: NULL {item_col} / {worker_col} row — filter explicitly first"
    i_checked = F.when(
        F.col(item_col).isNull() | F.col(worker_col).isNull(),
        F.raise_error(F.lit(imsg)).cast(
            labels.schema[item_col].dataType.simpleString()
        ),
    ).otherwise(F.col(item_col))
    rows = labels.select(
        i_checked.alias("__item"),
        _q_expr(value_col, scale_bits, op).alias("q"),
    )
    per = rows.groupBy("__item").agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum(F.col("q").cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("sq"),
        F.sum(_dprod("q", "q")).cast("decimal(38,0)").alias("sqq"),
    ).filter(F.col("nu") >= 2)
    # sum_{i!=j} (qi-qj)^2 = 2*(nu*sqq - sq^2), exact decimal
    dnum = (
        F.lit(2).cast("decimal(19,0)")
        * (
            F.col("nu").cast("decimal(19,0)") * F.col("sqq")
            - F.col("sq") * F.col("sq")
        )
    ).cast("decimal(38,0)")
    by_den = (
        per.select((F.col("nu") - 1).alias("den"), dnum.alias("dnum"),
                   "nu", "sq", "sqq")
        .groupBy("den")
        .agg(
            F.sum("dnum").cast("decimal(38,0)").alias("dsum"),
            F.sum("nu").cast("long").alias("nsum"),
            F.count(F.lit(1)).cast("long").alias("items"),
            F.sum("sq").cast("decimal(38,0)").alias("gsq"),
            F.sum("sqq").cast("decimal(38,0)").alias("gsqq"),
        )
        .collect()
    )
    if not by_den:
        raise ValueError(
            f"{op}: no item has >= 2 ratings"
        )
    dnum_by_den = {int(r["den"]): int(r["dsum"]) for r in by_den}
    n = sum(int(r["nsum"]) for r in by_den)
    n_items = sum(int(r["items"]) for r in by_den)
    gsq = sum(int(r["gsq"]) for r in by_den)
    gsqq = sum(int(r["gsqq"]) for r in by_den)
    de_num = 2 * (n * gsqq - gsq * gsq)
    return _kripp_assemble(
        dnum_by_den, n, n_items, de_num, n * (n - 1), op,
        unit_scale=1 << (2 * scale_bits),
    )


def krippendorff_alpha_ordinal(
    labels: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
    max_categories: int = 64,
) -> dict:
    """Krippendorff's alpha with the ORDINAL difference function —
    ordered categories (Likert scales, severity grades) where
    disagreeing by two steps matters more than by one but the steps
    are not numeric distances (that would be the interval form):

        delta(c, c') = ( sum_{k = c..c'} n_k  -  (n_c + n_c') / 2 )^2

    with n_k the GLOBAL (pairable) category frequencies — the standard
    ordinal metric from Krippendorff 2011.

    EXACT: 4*delta is an integer (the half only ever appears squared),
    so the per-item pairwise disagreement sums compute as exact
    decimals via a broadcast-joined O(K^2) delta table (K = category
    count, capped at ``max_categories``), group by panel size, and
    assemble with Fraction at unit_scale 4 — equal to the brute-force
    pair replica EXACTLY (suite).  Categories order by the label
    column's natural ordering.  Two passes: global category counts
    (driver O(K)), then one per-item pair aggregation."""
    from fractions import Fraction

    op = "krippendorff_alpha_ordinal"
    rows = _checked_cols(labels, [item_col, worker_col, label_col], op)
    cell = rows.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_item = Window.partitionBy(item_col)
    per = (
        cell.withColumn("nu", F.sum("c").over(w_item).cast("long"))
        .filter(F.col("nu") >= 2)
    )
    # pass 1: global pairable category counts, in category order
    cats = [
        (r[label_col], int(r["ct"]))
        for r in per.groupBy(label_col)
        .agg(F.sum("c").cast("long").alias("ct"))
        .orderBy(label_col)
        .collect()
    ]
    if not cats:
        raise ValueError(f"{op}: no item has >= 2 ratings")
    k = len(cats)
    if k > max_categories:
        raise ValueError(
            f"{op}: {k} categories > max_categories={max_categories} — "
            "ordinal alpha is for ORDERED CATEGORY scales; use "
            "krippendorff_alpha_interval for numeric ratings"
        )
    names = [c for c, _ in cats]
    freqs = [n for _, n in cats]
    # 4*delta(c, c') exact integers: (2*sum_{c..c'} n_k - n_c - n_c')^2
    n_total = sum(freqs)
    delta4 = []
    for i in range(k):
        for j in range(i + 1, k):
            mid = sum(freqs[i:j + 1])
            d2 = 2 * mid - freqs[i] - freqs[j]
            delta4.append((names[i], names[j], d2 * d2))
    spark = labels.sparkSession
    ltype = labels.schema[label_col].dataType.simpleString()
    ddf = spark.createDataFrame(
        delta4, f"la {ltype}, lb {ltype}, d4 long"
    ) if delta4 else spark.createDataFrame([], f"la {ltype}, lb {ltype}, d4 long")
    # pass 2: within-item ordered-category pairs x broadcast delta
    lhs = per.select(
        F.col(item_col).alias("__i"), F.col(label_col).alias("la"),
        F.col("c").alias("ca"), F.col("nu"),
    )
    rhs = per.select(
        F.col(item_col).alias("__i"), F.col(label_col).alias("lb"),
        F.col("c").alias("cb"),
    )
    pair_d = (
        lhs.join(rhs, "__i")
        .filter(F.col("la") < F.col("lb"))
        .join(F.broadcast(ddf), ["la", "lb"])
        .select(
            "__i", "nu",
            # sum_{i != j} delta*4 counts each unordered pair twice
            (F.lit(2).cast("decimal(19,0)")
             * F.col("ca").cast("decimal(19,0)")
             * F.col("cb").cast("decimal(19,0)")
             * F.col("d4").cast("decimal(19,0)")).cast("decimal(38,0)")
            .alias("dnum4"),
        )
    )
    # items whose raters all chose ONE category have no pairs rows but
    # zero disagreement anyway — re-anchor on the per-item frame so n
    # and n_items count them
    base = per.groupBy(item_col, "nu").agg(F.count(F.lit(1)).alias("__k"))
    item_d = (
        base.join(
            pair_d.groupBy("__i").agg(
                F.sum("dnum4").cast("decimal(38,0)").alias("dnum4")
            ),
            F.col(item_col) == F.col("__i"),
            "left",
        )
        .select(
            (F.col("nu") - 1).alias("den"),
            F.coalesce(F.col("dnum4"), F.lit(0).cast("decimal(38,0)"))
            .alias("dnum4"),
            "nu",
        )
    )
    by_den = (
        item_d.groupBy("den")
        .agg(
            F.sum("dnum4").cast("decimal(38,0)").alias("dsum"),
            F.sum("nu").cast("long").alias("nsum"),
            F.count(F.lit(1)).cast("long").alias("items"),
        )
        .collect()
    )
    dnum_by_den = {int(r["den"]): int(r["dsum"]) for r in by_den}
    n = sum(int(r["nsum"]) for r in by_den)
    n_items = sum(int(r["items"]) for r in by_den)
    if n != n_total:
        # both sides derive from the same pairable frame; a mismatch
        # means the plan itself is broken — fail loudly even under -O
        raise RuntimeError(
            f"krippendorff_alpha_ordinal: internal invariant broke — "
            f"per-denominator pairable count {n} != total {n_total}"
        )
    d4_by_pair = {(la, lb): d for la, lb, d in delta4}
    de_num4 = 2 * sum(
        freqs[i] * freqs[j] * d4_by_pair[(names[i], names[j])]
        for i in range(k) for j in range(i + 1, k)
    )
    return _kripp_assemble(
        dnum_by_den, n, n_items, de_num4, n * (n - 1), op, unit_scale=4
    )
