"""PII detection and redaction for training-data curation.

Reference scope: not in the reference pipeline (an order-event
consumer); part of the engine's training-data layer (task brief).
Published practice (C4, The Pile, RefinedWeb appendices): regex
batteries for emails / IPs / phone-shaped and id-shaped digit runs,
with REDACTION preferring false positives over leaks.

Design:
- Detection and redaction are pure JVM regex (``regexp_count`` /
  ``regexp_replace`` inside whole-stage codegen — zero Python in the
  hot path at 100 TB; plan-asserted in tests).
- Patterns are written in the Java<->Python common regex subset
  (explicit ``[0-9]`` classes, no ``\\d``/``\\b`` whose Unicode
  semantics differ between engines) — tests/test_pii.py pins exact
  parity against Python ``re`` on the same strings (ASCII contract).
- Card numbers: the FLAG path Luhn-validates candidate runs
  (``F.luhn_check`` — exact, JVM-side) against the card-shaped
  13-19 digit pattern; the REDACT path masks every separated digit
  run of >= 13 digits WITHOUT an upper length cap
  (``PII_REDACT_PATTERNS``), the conservative direction for
  redaction (over-redact, never leak).  The cap matters: a capped
  {12,18} card arm on a 20-digit run (two adjacent phone numbers,
  say) can only match a 13-19 digit sub-run, leaving a raw digit
  tail next to the placeholder that the later phone pass no longer
  recognizes — '<CARD>-3210' leaks 4 digits (ADVICE r8).  The
  uncapped arm masks the maximal run as one ``<CARD>``.
- Counts are per-pattern over the ORIGINAL text and independent of
  each other; redaction applies patterns sequentially in
  ``PII_REDACT_PATTERNS`` order (pinned — emails are masked before
  phone-shaped runs can eat their digits, and card runs before
  phone: a long digit run whose prefix is phone-shaped must mask
  as ONE ``<CARD>``, not a ``<PHONE>`` plus leaked digits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Detection patterns, in redaction application order.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — the C4-style permissive form
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted quad with 0-255 octets, not embedded in a longer digit run
    "ipv4": (
        r"(?<![0-9])(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])(?![0-9])"
    ),
    # US SSN shape 3-2-4 with dashes
    "ssn": r"(?<![0-9])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9-])",
    # 13-19 digit run with optional single space/dash separators.
    # MUST precede phone: a card run whose first 10 digits are
    # phone-shaped ('123-456-7890 1234 5678') would otherwise be
    # split by the phone pass, leaking the remaining raw digits —
    # violating the "masks every 13-19 digit run" redact contract.
    "ccnum": r"(?<![0-9])(?:[0-9][ -]?){12,18}[0-9](?![0-9])",
    # phone: optional +CC, then 3-3-4 with separators or (area)
    "phone": (
        r"(?<![0-9A-Za-z])(?:\+[0-9]{1,3}[-. ])?"
        r"(?:\([0-9]{3}\)[-. ]?|[0-9]{3}[-. ])[0-9]{3}[-. ]?[0-9]{4}(?![0-9])"
    ),
}

#: Redaction application order + patterns.  Identical to
#: ``PII_PATTERNS`` except the card arm, which drops the upper length
#: cap: redaction masks the MAXIMAL separated digit run of >= 13
#: digits, so a 20+ digit run (e.g. two adjacent phone numbers) can
#: never leave a raw digit tail beside the placeholder (ADVICE r8 —
#: the {12,18} shape stays on the flag/Luhn path only, where the
#: card-length bound is part of the definition being counted).
PII_REDACT_PATTERNS: dict[str, str] = {
    **PII_PATTERNS,
    "ccnum": r"(?<![0-9])(?:[0-9][ -]?){12,}[0-9](?![0-9])",
}

#: Redaction placeholders per type.
PII_PLACEHOLDERS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "ssn": "<SSN>",
    "phone": "<PHONE>",
    "ccnum": "<CARD>",
}


def _luhn_valid_count(text: Column) -> Column:
    """Count ccnum-shaped runs whose digits pass the Luhn checksum —
    candidate extraction by the shape regex, validation by the exact
    JVM ``luhn_check`` over the separator-stripped digits."""
    cands = F.regexp_extract_all(text, F.lit(PII_PATTERNS["ccnum"]), 0)
    # F.luhn_check has no pyspark wrapper in this build — call the SQL
    # function by name (JVM-side either way).
    return F.size(
        F.filter(
            cands,
            lambda x: F.call_function("luhn_check", F.regexp_replace(x, "[ -]", "")),
        )
    ).cast("long")


def pii_flags(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII counts: ``n_email, n_ipv4, n_ssn, n_phone,
    n_ccnum_shaped, n_ccnum_luhn, has_pii``.  NULL text yields NULL
    counts and ``has_pii`` NULL (unknown, not clean) — filter upstream
    if NULLs should fail.  ``has_pii`` uses the Luhn-validated card
    count (shape-only runs are common in prose — order ids, hashes)."""
    t = F.col(text_col)
    counts = {
        f"n_{k}": F.regexp_count(t, F.lit(p)).cast("long")
        for k, p in PII_PATTERNS.items()
        if k != "ccnum"
    }
    counts["n_ccnum_shaped"] = F.regexp_count(t, F.lit(PII_PATTERNS["ccnum"])).cast("long")
    counts["n_ccnum_luhn"] = _luhn_valid_count(t)
    strong = (
        counts["n_email"] + counts["n_ipv4"] + counts["n_ssn"]
        + counts["n_phone"] + counts["n_ccnum_luhn"]
    )
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in counts.items()],
        (strong > 0).alias("has_pii"),
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    types: tuple[str, ...] | None = None,
) -> DataFrame:
    """Sequential typed redaction: each pattern in
    ``PII_REDACT_PATTERNS`` order replaced by its placeholder.
    ``out_col=None`` overwrites ``text_col``; all other columns ride
    through unchanged.  The card arm deliberately masks ALL maximal
    digit runs of >= 13 digits (no Luhn gate, no upper length cap) —
    for redaction the false-positive direction is the safe one."""
    sel = types if types is not None else tuple(PII_REDACT_PATTERNS)
    unknown = set(sel) - set(PII_REDACT_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII types: {sorted(unknown)}")
    c: Column = F.col(text_col)
    for k in PII_REDACT_PATTERNS:  # canonical order regardless of `types` order
        if k in sel:
            c = F.regexp_replace(
                c, F.lit(PII_REDACT_PATTERNS[k]), F.lit(PII_PLACEHOLDERS[k])
            )
    target = out_col or text_col
    return df.withColumn(target, c)


def pii_summary(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-level rollup of the flag frame: one row of exact totals
    (docs, docs with PII, per-type match totals) — the audit counter a
    curation run reports.  NULL-text docs (``has_pii`` NULL = unknown,
    per ``pii_flags``) are counted in ``n_docs`` and reported
    separately as ``n_docs_null_text`` — never folded into the clean
    bucket, so ``n_docs - n_docs_with_pii - n_docs_null_text`` is the
    count of docs POSITIVELY known clean."""
    flags = pii_flags(df, id_col, text_col)
    return flags.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("has_pii"), 1).otherwise(0)).cast("long").alias("n_docs_with_pii"),
        F.sum(F.when(F.col("has_pii").isNull(), 1).otherwise(0)).cast("long").alias("n_docs_null_text"),
        F.sum(F.coalesce("n_email", F.lit(0))).cast("long").alias("total_email"),
        F.sum(F.coalesce("n_ipv4", F.lit(0))).cast("long").alias("total_ipv4"),
        F.sum(F.coalesce("n_ssn", F.lit(0))).cast("long").alias("total_ssn"),
        F.sum(F.coalesce("n_phone", F.lit(0))).cast("long").alias("total_phone"),
        F.sum(F.coalesce("n_ccnum_luhn", F.lit(0))).cast("long").alias("total_ccnum_luhn"),
    )
