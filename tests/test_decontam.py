"""Decontamination (operators/decontam.py): exact parity with a
Python replica of the published n-gram rule (GPT-3 App. C) including
the short-eval whole-sequence containment arm, anti-join removal,
leakage report, and the broadcast plan shape.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.decontam import (
    contamination_tags,
    decontaminate,
    eval_leakage_report,
)

DOCS = [
    (1, "a b c d e f"),          # shares gram "b c d" with eval 10
    (2, "x y z w q"),            # clean
    (3, "p q"),                  # too short for grams; contains short eval "p q"
    (4, ""),                     # empty
    (5, None),                   # NULL text
    (6, "m b c d m m"),          # shares "b c d" too
    (7, "ap qx"),                # must NOT match short eval "p q" (substring, not tokens)
]
EVALS = [
    (10, "z b c d k"),           # long (>= n=3 tokens): grams {z b c, b c d, c d k}
    (11, "p q"),                 # short (< 3 tokens): whole-sequence rule
    (12, ""),                    # empty eval: matches nothing
]
N = 3


def _py_tokens(t):
    return t.split(" ") if t is not None else None


def _py_grams(t, n):
    toks = _py_tokens(t)
    if toks is None or len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_reference():
    eval_grams = set()
    short_seqs = set()
    for _, t in EVALS:
        g = _py_grams(t, N)
        if g:
            eval_grams |= g
        else:
            toks = _py_tokens(t)
            if toks and 1 <= len(toks) < N:
                s = " ".join(toks)
                if s:
                    short_seqs.add(s)
    rows = {}
    for did, t in DOCS:
        g = _py_grams(t, N)
        hit = len(g & eval_grams)
        toks = _py_tokens(t) or []
        body = " " + " ".join(toks) + " "
        short = sum(1 for s in short_seqs if f" {s} " in body)
        rows[did] = dict(
            n_grams=len(g),
            n_hit_grams=hit,
            hit_frac=(hit / len(g)) if g else None,
            n_short_hits=short,
            is_contaminated=hit > 0 or short > 0,
        )
    return rows, eval_grams, short_seqs


def test_tags_match_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    evals = spark.createDataFrame(EVALS, "eval_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in contamination_tags(docs, evals, n=N).collect()
    }
    want, _, _ = _py_reference()
    assert set(got) == set(want)
    for did, w in want.items():
        g = got[did]
        assert g["n_grams"] == w["n_grams"], did
        assert g["n_hit_grams"] == w["n_hit_grams"], did
        assert g["n_short_hits"] == w["n_short_hits"], did
        assert g["is_contaminated"] == w["is_contaminated"], did
        if w["hit_frac"] is None:
            assert g["hit_frac"] is None, did
        else:
            assert g["hit_frac"] == w["hit_frac"], did  # exact int/int division


def test_token_boundary_not_substring(spark):
    # doc 7 "ap qx" contains the characters "p q" but not the token seq
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    evals = spark.createDataFrame(EVALS, "eval_id long, text string")
    got = {r["doc_id"]: r for r in contamination_tags(docs, evals, n=N).collect()}
    assert got[7]["n_short_hits"] == 0 and not got[7]["is_contaminated"]
    assert got[3]["n_short_hits"] == 1 and got[3]["is_contaminated"]


def test_decontaminate_removes_exactly_the_tagged(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    evals = spark.createDataFrame(EVALS, "eval_id long, text string")
    want, _, _ = _py_reference()
    keep = sorted(d for d, w in want.items() if not w["is_contaminated"])
    out = decontaminate(docs, evals, n=N)
    assert sorted(r["doc_id"] for r in out.collect()) == keep
    assert out.columns == ["doc_id", "text"]  # schema preserved


def test_leakage_report_matches_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    evals = spark.createDataFrame(EVALS, "eval_id long, text string")
    got = {r["eval_id"]: r.asDict() for r in eval_leakage_report(docs, evals, n=N).collect()}
    # Python reference
    corpus_grams = set()
    for _, t in DOCS:
        corpus_grams |= _py_grams(t, N)
    # eval 10: long form
    g10 = _py_grams(EVALS[0][1], N)
    leaked10 = len(g10 & corpus_grams)
    assert got[10]["n_grams"] == len(g10)
    assert got[10]["n_leaked_grams"] == leaked10
    assert got[10]["leaked_frac"] == leaked10 / len(g10)
    # eval 11: short form, contained in doc 3 -> fully leaked
    assert got[11]["n_grams"] == 1 and got[11]["n_leaked_grams"] == 1
    assert got[11]["leaked_frac"] == 1.0
    # eval 12 (empty) must not appear
    assert 12 not in got


def test_plan_broadcasts_eval_side_and_stays_jvm(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    evals = spark.createDataFrame(EVALS, "eval_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        contamination_tags(docs, evals, n=N).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan          # gram membership join
    assert "BroadcastNestedLoopJoin" in plan    # short-seq containment
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the CORPUS gram stream must not shuffle on shingle — the only
    # shingle-keyed Exchange allowed is the (tiny) eval-side distinct
    assert plan.count("hashpartitioning(shingle") == 1


def test_no_eval_overlap_keeps_everything(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    evals = spark.createDataFrame([(1, "nothing shared here at all")], "eval_id long, text string")
    out = decontaminate(docs, evals, n=N)
    assert out.count() == len(DOCS)
