"""Span-level (sub-document) dedup (operators/substr.py): exact
agreement with a Python reference for span detection and masking,
planted-boilerplate recovery, same-doc repetition, the n-sensitivity
contract, and partitioning independence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.substr import (
    duplicated_ngram_spans,
    mask_duplicated_spans,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _py_spans(texts, n, min_occ=2):
    from collections import Counter

    toks = {i: [t for t in s.split() if t] for i, s in texts.items()}
    occ = Counter()
    for ts in toks.values():
        for i in range(len(ts) - n + 1):
            occ[" ".join(ts[i : i + n])] += 1
    spans = {}
    for d, ts in toks.items():
        dup = [
            i
            for i in range(len(ts) - n + 1)
            if occ[" ".join(ts[i : i + n])] >= min_occ
        ]
        out, run = [], []
        for p in dup:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    out.append((run[0], run[-1] + n - 1, len(run)))
                run = [p]
        if run:
            out.append((run[0], run[-1] + n - 1, len(run)))
        if out:
            spans[d] = sorted(out)
    return spans


def _py_mask(text, spans, n):
    ts = [t for t in text.split() if t]
    drop = set()
    for s, e, _ in spans:
        drop.update(range(s, e + 1))
    kept = [t for i, t in enumerate(ts) if i not in drop]
    return " ".join(kept), len(ts) - len(kept)


BOILER = "this content is provided as is without warranty of any kind either express or implied"
TEXTS = {
    0: f"alpha beta gamma {BOILER} delta epsilon",
    1: f"{BOILER} zeta eta theta iota kappa lambda",
    2: "totally unique words nothing repeated here at all today friends",
    3: "repeat me repeat me repeat me repeat me repeat me repeat me",
}


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in TEXTS.items()], "doc_id long, text string"
    )


def test_spans_match_python_reference(spark):
    n = 5
    got = {}
    for r in duplicated_ngram_spans(_docs(spark), n=n).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_grams"])
        )
    got = {d: sorted(v) for d, v in got.items()}
    want = _py_spans(TEXTS, n)
    assert got == want
    # the planted boilerplate is found IN FULL in both carriers
    blen = len(BOILER.split())
    for d, start in ((0, 3), (1, 0)):
        spans = got[d]
        assert any(
            s <= start and e >= start + blen - 1 for s, e, _ in spans
        ), (d, spans)
    assert 2 not in got  # the unique doc is untouched
    assert 3 in got  # same-doc repetition counts toward occurrences


def test_mask_matches_python_reference(spark):
    n = 5
    docs = _docs(spark)
    spans = duplicated_ngram_spans(docs, n=n)
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in mask_duplicated_spans(docs, spans).collect()
    }
    pys = _py_spans(TEXTS, n)
    for d, t in TEXTS.items():
        want_text, want_rm = _py_mask(t, pys.get(d, []), n)
        assert got[d] == (want_text, want_rm), d
    # unique doc passes through byte-identical with zero removals
    assert got[2] == (TEXTS[2], 0)


def test_short_passages_are_invisible_below_n(spark):
    # a 4-token repeat with n=5 must produce no spans — n is the
    # sensitivity knob, exactly the paper's span-length threshold
    docs = spark.createDataFrame(
        [
            (0, "one two three four aaa bbb ccc ddd eee"),
            (1, "one two three four fff ggg hhh iii jjj"),
        ],
        "doc_id long, text string",
    )
    assert duplicated_ngram_spans(docs, n=5).count() == 0
    assert duplicated_ngram_spans(docs, n=4).count() == 2


def test_spans_partitioning_independence(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    a = sorted(
        tuple(r) for r in duplicated_ngram_spans(docs, n=6).collect()
    )
    b = sorted(
        tuple(r)
        for r in duplicated_ngram_spans(
            docs.repartition(7, F.col("doc_id")), n=6
        ).collect()
    )
    assert a == b
    assert a  # the synthetic corpus's tiny vocab guarantees repeats


def test_no_pair_explosion_plan(spark):
    # documents must never join against each other: the only join in
    # the span plan is the semi-join against the n-gram count table.
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    plan = (
        duplicated_ngram_spans(docs, n=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
