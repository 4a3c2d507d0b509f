"""Text cleaning (operators/clean.py): JVM-only plan for clean_text,
exact unicodedata parity for normalize_unicode, exact zlib parity for
compression_ratio, NULL propagation, and signal direction (repetition
compresses below prose, noise above).
"""

from __future__ import annotations

import io
import contextlib
import unicodedata
import zlib

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.clean import (
    clean_text,
    compression_ratio,
    normalize_unicode,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_clean_text_strips_and_collapses(spark):
    rows = [
        (1, "hello\x01\x07 world"),  # C0 controls
        (2, "a\u200b\u200d\ufeffb"),  # ZWSP/ZWJ/BOM (Cf)
        (3, "  lots\t of \n\n whitespace  "),
        (4, None),
        (5, "\u202aRTL\u202c mark"),  # bidi embedding (Cf)
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: r["text"] for r in clean_text(df).collect()}
    assert got[1] == "hello world"
    assert got[2] == "ab"
    assert got[3] == "lots of whitespace"
    assert got[4] is None
    assert got[5] == "RTL mark"
    low = {r["id"]: r["text"] for r in clean_text(df, lower=True).collect()}
    assert low[5] == "rtl mark"


def test_clean_text_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "x")], "id int, text string")
    plan = _plan(clean_text(df))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # not even the fast Python path


@pytest.mark.parametrize("form", ["NFC", "NFKC"])
def test_normalize_unicode_matches_unicodedata(spark, form):
    rows = [
        (1, "ﬁre"),                # LATIN SMALL LIGATURE FI
        (2, "Ｆｕｌｌｗｉｄｔｈ"),  # fullwidth forms
        (3, "x² + é"),  # superscript two, combining accent
        (4, "①Ⅱ"),       # circled one, roman numeral two
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: r["text"] for r in normalize_unicode(df, form=form).collect()}
    for i, t in rows:
        want = unicodedata.normalize(form, t) if t is not None else None
        assert got[i] == want
    with pytest.raises(ValueError):
        normalize_unicode(df, form="NFX")


def test_compression_ratio_exact_zlib_parity(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 4),
        (2, "spam " * 200),
        (3, "q8Zk!fP2@xL9#mW3$vC7"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: r["compression_ratio"] for r in compression_ratio(df).collect()}
    for i, t in rows:
        if t:
            b = t.encode("utf-8")
            assert got[i] == len(zlib.compress(b, 6)) / len(b)
        else:
            assert got[i] is None
    # direction: repetition << prose; short random-ish strings compress
    # poorly (deflate header overhead dominates)
    assert got[2] < got[1] < got[3]


def test_clean_then_normalize_pipeline(spark):
    df = spark.createDataFrame(
        [(1, "  Ｈｅｌｌｏ​ ｗｏｒｌｄ ")], "id int, text string"
    )
    out = normalize_unicode(clean_text(df), form="NFKC").collect()[0]["text"]
    assert out == "Hello world"
