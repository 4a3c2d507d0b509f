"""Streaming ingest-hygiene twins (streaming/hygiene.py): drained
PII flags/redaction and URL normalization/domain filtering BIT-match
their batch operators on the same rows, across micro-batchings.
"""

from __future__ import annotations

from kafka_avro_order_processing_spark.operators.pii import pii_flags, redact_pii
from kafka_avro_order_processing_spark.operators.urls import (
    domain_filter,
    normalize_url,
)
from kafka_avro_order_processing_spark.streaming.hygiene import (
    streaming_domain_filter,
    streaming_normalize_url,
    streaming_pii_flags,
    streaming_redact_pii,
)

PII_DOCS = [
    (1, "contact jane.doe@example.com or (212) 555-0187"),
    (2, "card 4539 1488 0343 6467 at 10.0.0.1"),
    (3, "ssn 123-45-6789 and card 123-456-7890 1234 5678"),
    (4, "clean text, nothing to see"),
    (5, ""),
    (6, None),
]

URL_DOCS = [
    (1, "HTTP://Example.COM:0080/Path?a=1&utm_source=x#f"),
    (2, "https://sub.spam.co.uk:8443/x?gclid=g&keep=1"),
    (3, "http://good.org/b"),
    (4, "not a url"),
    (5, None),
]


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


def _stream(spark, tmp_path, rows, schema, name, per_file=False):
    d = str(tmp_path / name)
    df = spark.createDataFrame(rows, schema)
    (df.repartition(3) if per_file else df).write.parquet(d)
    reader = spark.readStream.schema(schema)
    if per_file:
        reader = reader.option("maxFilesPerTrigger", 1)  # several epochs
    return reader.parquet(d)


def test_streaming_pii_flags_bit_matches_batch(spark, tmp_path):
    docs = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    want = _rows(pii_flags(docs))
    stream = _stream(
        spark, tmp_path, PII_DOCS, "doc_id long, text string", "p", per_file=True
    )
    assert _rows(streaming_pii_flags(stream)) == want


def test_streaming_redact_bit_matches_batch(spark, tmp_path):
    docs = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    want = _rows(redact_pii(docs))
    stream = _stream(spark, tmp_path, PII_DOCS, "doc_id long, text string", "r")
    got = _rows(streaming_redact_pii(stream))
    assert got == want
    # the ordering contract holds through the stream: one <CARD>, no leak
    by_id = {r[0]: r[1] for r in got}
    assert by_id[3] == "ssn <SSN> and card <CARD>"


def test_streaming_normalize_url_bit_matches_batch(spark, tmp_path):
    docs = spark.createDataFrame(URL_DOCS, "doc_id long, url string")
    want = _rows(normalize_url(docs))
    stream = _stream(
        spark, tmp_path, URL_DOCS, "doc_id long, url string", "u", per_file=True
    )
    assert _rows(streaming_normalize_url(stream)) == want


def test_streaming_domain_filter_matches_batch_modes(spark, tmp_path):
    docs = spark.createDataFrame(URL_DOCS, "doc_id long, url string")
    bl = spark.createDataFrame([("spam.co.uk",)], "domain string")
    stream = _stream(spark, tmp_path, URL_DOCS, "doc_id long, url string", "d")
    for mode in ("block", "allow"):
        want = _rows(domain_filter(docs, bl, mode=mode))
        got = _rows(streaming_domain_filter(stream, bl, mode=mode))
        assert got == want, mode
    # NULL-domain rows (unparseable, NULL url) survive block mode
    kept = {r[0] for r in domain_filter(docs, bl, mode="block").collect()}
    assert {4, 5} <= kept


def test_hygiene_plans_have_no_python(spark, tmp_path):
    import contextlib
    import io

    docs = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    for plan_df in (pii_flags(docs), redact_pii(docs)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan_df.explain("formatted")
        p = buf.getvalue()
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
