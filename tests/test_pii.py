"""PII battery (operators/pii.py): exact Python-re parity for every
pattern (counts AND sequential redaction), Luhn validation of card
candidates, NULL propagation, JVM-only plan, and an ASCII hypothesis
fuzz over a PII-dense alphabet.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from hypothesis import given, settings, strategies as st

from kafka_avro_order_processing_spark.operators.pii import (
    PII_PATTERNS,
    PII_PLACEHOLDERS,
    PII_REDACT_PATTERNS,
    pii_flags,
    pii_summary,
    redact_pii,
)

CASES = [
    (1, "contact me at jane.doe+spam@example.co.uk or bob@x.io"),
    (2, "server at 192.168.0.1 and 255.255.255.255 but not 999.1.1.1"),
    (3, "ssn 123-45-6789 phone 555-867-5309 and (212) 555-0187"),
    (4, "card 4539 1488 0343 6467 junk 1234 5678 9012 3456"),  # 1st passes Luhn
    (5, "int +44 020-7946-0958 nope; +1 415-555-2671 yes"),
    (6, "no pii here, just 42 and v1.2.3 and a-b-c"),
    (7, ""),
    (8, None),
    (9, "edge 1.2.3.4.5 run 12345678901234567890123 x"),
    (10, "mail@sub.domain.org, ip 10.0.0.256 (invalid octet), 0.0.0.0 ok"),
    # card run with a phone-shaped prefix: must mask as ONE <CARD>,
    # not <PHONE> + 8 leaked digits (ccnum ordered before phone)
    (11, "card 123-456-7890 1234 5678 end"),
    # 20-digit separated run (two adjacent phone numbers): the capped
    # {12,18} card arm could only mask a 16-digit sub-run, leaking
    # '-3210' beside the placeholder (ADVICE r8).  The redact path's
    # uncapped arm masks the maximal run as ONE <CARD>.
    (12, "Tel: 123-456-7890 987-654-3210"),
]


def _py_luhn(digits: str) -> bool:
    total, dbl = 0, False
    for ch in reversed(digits):
        d = ord(ch) - 48
        if dbl:
            d *= 2
            if d > 9:
                d -= 9
        total += d
        dbl = not dbl
    return total % 10 == 0


def _py_counts(text):
    if text is None:
        return None
    out = {}
    for k, p in PII_PATTERNS.items():
        ms = re.findall(p, text)
        if k == "ccnum":
            out["n_ccnum_shaped"] = len(ms)
            out["n_ccnum_luhn"] = sum(
                1 for m in ms if _py_luhn(re.sub("[ -]", "", m))
            )
        else:
            out[f"n_{k}"] = len(ms)
    return out


def _py_redact(text):
    if text is None:
        return None
    for k, p in PII_REDACT_PATTERNS.items():
        text = re.sub(p, PII_PLACEHOLDERS[k], text)
    return text


def test_flags_match_python_re(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_flags(df).collect()}
    for did, text in CASES:
        want = _py_counts(text)
        g = got[did]
        if want is None:
            assert all(
                g[c] is None
                for c in ("n_email", "n_ipv4", "n_ssn", "n_phone", "n_ccnum_shaped")
            )
            assert g["has_pii"] is None
            continue
        for k, v in want.items():
            assert g[k] == v, (did, k, g[k], v)
        strong = (
            want["n_email"] + want["n_ipv4"] + want["n_ssn"]
            + want["n_phone"] + want["n_ccnum_luhn"]
        )
        assert g["has_pii"] == (strong > 0), did


def test_luhn_distinguishes_real_cards(spark):
    df = spark.createDataFrame([CASES[3]], "doc_id long, text string")
    r = pii_flags(df).collect()[0]
    assert r["n_ccnum_shaped"] == 2
    assert r["n_ccnum_luhn"] == 1  # 4539... is Luhn-valid, 1234... is not


def test_redaction_matches_python_composition(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in redact_pii(df).collect()}
    for did, text in CASES:
        assert got[did] == _py_redact(text), did


def test_card_run_with_phone_prefix_masks_whole_run(spark):
    """ADVICE r7: phone-before-ccnum leaked the 8 digits after the
    phone-shaped prefix of an 18-digit run.  ccnum now precedes phone
    in PII_PATTERNS, so the whole run masks as one <CARD>."""
    df = spark.createDataFrame([CASES[10]], "doc_id long, text string")
    out = redact_pii(df).collect()[0]["text"]
    assert out == "card <CARD> end"
    assert not re.search("[0-9]{4}", out), f"digits leaked: {out!r}"
    assert list(PII_PATTERNS).index("ccnum") < list(PII_PATTERNS).index("phone")
    assert list(PII_REDACT_PATTERNS).index("ccnum") < list(
        PII_REDACT_PATTERNS
    ).index("phone")


def test_long_digit_run_never_leaks_a_tail(spark):
    """ADVICE r8: a 20-digit separated run (adjacent phone numbers)
    must mask ENTIRELY — the capped {12,18} arm emitted
    'Tel: <CARD>-3210', leaking 4 raw digits.  The redact path's
    uncapped maximal-run arm masks it as one <CARD> (over-redact,
    never leak); the flag path keeps the 13-19 card-length bound."""
    df = spark.createDataFrame([CASES[11]], "doc_id long, text string")
    out = redact_pii(df).collect()[0]["text"]
    assert out == "Tel: <CARD>"
    assert not re.search("[0-9]{2}", out), f"digits leaked: {out!r}"
    # flag path unchanged: detection counts stay per-pattern over the
    # original text — the capped card arm sees the greedy 16-digit
    # sub-run (one shaped candidate, Luhn-invalid) and the phone arm
    # sees both numbers independently
    r = pii_flags(df).collect()[0]
    assert r["n_ccnum_shaped"] == 1 and r["n_ccnum_luhn"] == 0
    assert r["n_phone"] == 2


def test_redaction_subset_and_out_col(spark):
    df = spark.createDataFrame([CASES[0]], "doc_id long, text string")
    out = redact_pii(df, types=("email",), out_col="clean").collect()[0]
    assert out["text"] == CASES[0][1]  # original untouched
    assert out["clean"] == re.sub(
        PII_PATTERNS["email"], PII_PLACEHOLDERS["email"], CASES[0][1]
    )
    with pytest.raises(ValueError):
        redact_pii(df, types=("emial",))


def test_redact_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        redact_pii(df).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_summary_totals(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    s = pii_summary(df).collect()[0]
    want = [_py_counts(t) for _, t in CASES if t is not None]
    assert s["n_docs"] == len(CASES)
    assert s["total_email"] == sum(w["n_email"] for w in want)
    assert s["total_ssn"] == sum(w["n_ssn"] for w in want)
    assert s["total_ccnum_luhn"] == sum(w["n_ccnum_luhn"] for w in want)
    n_with = sum(
        1
        for w in want
        if (w["n_email"] + w["n_ipv4"] + w["n_ssn"] + w["n_phone"] + w["n_ccnum_luhn"]) > 0
    )
    assert s["n_docs_with_pii"] == n_with
    # NULL-text docs are reported explicitly, never counted as clean
    assert s["n_docs_null_text"] == sum(1 for _, t in CASES if t is None)
    assert (
        s["n_docs"] - s["n_docs_with_pii"] - s["n_docs_null_text"]
        == sum(
            1
            for w in want
            if (w["n_email"] + w["n_ipv4"] + w["n_ssn"] + w["n_phone"] + w["n_ccnum_luhn"]) == 0
        )
    )


PII_ALPHABET = "0123456789 .-@()+aex"  # digit/separator-dense: hits every pattern arm


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(PII_ALPHABET, min_size=0, max_size=60), min_size=1, max_size=8))
@pytest.mark.slow
def test_fuzz_counts_and_redaction_parity(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flags = {r["doc_id"]: r.asDict() for r in pii_flags(df).collect()}
    red = {r["doc_id"]: r["text"] for r in redact_pii(df).collect()}
    for i, t in rows:
        want = _py_counts(t)
        for k, v in want.items():
            assert flags[i][k] == v, (t, k)
        assert red[i] == _py_redact(t), t
