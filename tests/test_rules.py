"""Published rule batteries (operators/rules.py): each Gopher rule
trips on a targeted violation and only that rule; C4 line filtering
matches a Python reference line-for-line; plans stay JVM-only.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.rules import (
    c4_line_filters,
    gopher_quality_flags,
)

GOOD = (
    "The quick brown fox jumps over the lazy dog and then settles down "
    "to have a rest with the other animals that live in the forest. "
) * 3  # ~60 words, sane lengths, stop words present


def _flags(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    return gopher_quality_flags(df, **kw).collect()[0]


def test_gopher_good_doc_passes_all(spark):
    r = _flags(spark, GOOD)
    assert r["keep"] is True
    assert r["n_words"] >= 50
    for c in (
        "ok_word_count",
        "ok_mean_word_len",
        "ok_symbol_ratio",
        "ok_bullet_lines",
        "ok_ellipsis_lines",
        "ok_alpha_words",
        "ok_stop_words",
    ):
        assert r[c] is True, c


def test_gopher_each_rule_trips_alone(spark):
    # too short
    r = _flags(spark, "The cat and the dog have a rest.")
    assert r["ok_word_count"] is False and r["keep"] is False
    # mean word length too long (but keep word count satisfied)
    r = _flags(spark, " ".join(["pneumonoultramicroscopic"] * 60))
    assert r["ok_mean_word_len"] is False and r["ok_word_count"] is True
    # symbol ratio: hashes everywhere
    r = _flags(spark, GOOD + " " + "# # # # # # # # # # # # # # # #")
    assert r["ok_symbol_ratio"] is False
    # bullet lines dominate
    bullets = "\n".join(f"- bullet item number {i} here" for i in range(20))
    r = _flags(spark, bullets)
    assert r["ok_bullet_lines"] is False
    # ellipsis line endings dominate
    dots = "\n".join(
        f"a trailing thought number {i} goes on..." for i in range(10)
    )
    r = _flags(spark, GOOD + "\n" + dots, max_ellipsis_line_ratio=0.05)
    assert r["ok_ellipsis_lines"] is False
    # non-alphabetic words dominate
    r = _flags(spark, GOOD + " " + " ".join(["12345"] * 60))
    assert r["ok_alpha_words"] is False
    # no stop words
    r = _flags(spark, " ".join(["zebra", "quokka", "lemur"] * 30))
    assert r["ok_stop_words"] is False
    # NULL text fails everything
    df = spark.createDataFrame([(1, None)], "doc_id int, text string")
    r = gopher_quality_flags(df).collect()[0]
    assert r["keep"] is False and r["ok_word_count"] is False


def test_c4_line_filters_match_python(spark):
    docs = [
        (
            1,
            "This is a perfectly reasonable first sentence.\n"
            "short line\n"
            "Another fine sentence that ends with punctuation!\n"
            "This one mentions lorem ipsum so it must go.\n"
            'A quoted line with enough words ends well."\n'
            "var x = {a: 1}\n"
            "And a third good sentence rounds out the document.",
        ),
        (2, "Only one good sentence lives in this document.\nmeh\n"),
        (3, None),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r["doc_id"]: r for r in c4_line_filters(df).collect()}

    def py_c4(text):
        if text is None:
            return []
        kept = []
        for line in text.split("\n"):
            t = line.strip()
            if not t or len(t.split()) < 5:
                continue
            if not (t.endswith(".") or t.endswith("!") or t.endswith("?") or t.endswith('"')):
                continue
            low = t.lower()
            if any(s in low for s in ("lorem ipsum", "{", "javascript")):
                continue
            kept.append(t)
        return kept

    want1 = py_c4(docs[0][1])
    assert len(want1) == 4
    assert out[1]["n_lines_kept"] == 4 and out[1]["n_lines_dropped"] == 3
    # rejoined text preserves surviving lines in order (modulo the
    # original leading/trailing spaces, which the reference strips)
    got_lines = [l.strip() for l in out[1]["text"].split("\n")]
    assert got_lines == want1
    # doc 2 falls below min_lines, doc 3 is NULL: both filtered out
    assert 2 not in out and 3 not in out


def test_rule_plans_are_jvm_only(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id int, text string")
    for plan_df in (gopher_quality_flags(df), c4_line_filters(df)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan_df.explain("formatted")
        plan = buf.getvalue()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "Exchange" not in plan  # map-side only


def test_gopher_funnel_on_documents_table(spark):
    from kafka_avro_order_processing_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    flags = gopher_quality_flags(docs, min_words=10)
    n = docs.count()
    agg = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
    ).collect()[0]
    assert agg["n"] == n      # one flag row per doc, no loss
    assert 0 < agg["kept"] <= n


def test_gopher_repetition_flags_match_python(spark):
    from kafka_avro_order_processing_spark.operators.rules import (
        gopher_repetition_flags,
    )

    # fully distinct words per line: no repeated n-gram anywhere, and
    # long enough that a single unique 4-gram stays under its char cap
    # (the published caps presume web-scale docs, not snippets)
    clean = (
        "alpha bravo charlie delta echo foxtrot golf hotel india.\n"
        "juliet kilo lima mike november oscar papa quebec romeo.\n\n"
        "sierra tango uniform victor whiskey xray yankee zulu one.\n"
        "two three four five six seven eight nine ten eleven.\n\n"
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen.\n"
        "nineteen twenty blue green yellow purple orange silver gold."
    )
    spam_lines = "Buy cheap widgets now online.\n" * 10 + "One unique line."
    spam_phrase = ("free offer " * 40).strip()
    docs = [(1, clean), (2, spam_lines), (3, spam_phrase), (4, None)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r["doc_id"]: r for r in gopher_repetition_flags(df).collect()}

    def py_fracs(text):
        lines = [l for l in text.split("\n") if l.strip()]
        import re

        paras = [p for p in re.split(r"\n\s*\n", text) if p.strip()]
        words = [w for w in re.split(r"\s+", text) if w]

        def dup_frac(units):
            return (
                (len(units) - len(set(units))) / len(units) if units else None
            )

        def dup_char(units):
            from collections import Counter

            c = Counter(units)
            tot = sum(len(u) * k for u, k in c.items())
            dup = sum(len(u) * k for u, k in c.items() if k > 1)
            return dup / tot if tot else None

        def top_ngram(n):
            from collections import Counter

            grams = [
                " ".join(words[i : i + n])
                for i in range(len(words) - n + 1)
            ]
            if not grams:
                return None
            c = Counter(grams)
            best = max(len(g) * k for g, k in c.items())
            return best / len(text)

        return (
            dup_frac(lines),
            dup_frac(paras),
            dup_char(lines),
            dup_char(paras),
            top_ngram(2),
            top_ngram(3),
            top_ngram(4),
        )

    for i, text in docs:
        if text is None:
            continue
        want = py_fracs(text)
        got = out[i]
        keys = (
            "dup_line_frac",
            "dup_para_frac",
            "dup_line_char_frac",
            "dup_para_char_frac",
            "top_2gram_char_frac",
            "top_3gram_char_frac",
            "top_4gram_char_frac",
        )
        for k, w in zip(keys, want):
            if w is None:
                assert got[k] is None, (i, k)
            else:
                assert abs(got[k] - w) < 1e-12, (i, k, got[k], w)

    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["ok_dup_lines"] is False
    assert out[3]["keep"] is False and out[3]["ok_top_2gram"] is False
    assert out[4]["keep"] is False  # NULL text fails
    # one row per input doc, none lost to the joins
    assert set(out) == {1, 2, 3, 4}
