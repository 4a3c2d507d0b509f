"""Text cleaning & normalization — the pre-tokenization hygiene pass
of a web-curation pipeline (control/format-char stripping, whitespace
collapse, Unicode NFKC, compressibility as a junk signal).

Spark-first division of labor:

* :func:`clean_text` is PURE JVM — control (``\\p{Cc}``) and format
  (``\\p{Cf}``: zero-width spaces, BOMs, bidi marks) characters and
  whitespace runs are regex classes Catalyst evaluates inside
  whole-stage codegen.  No Python anywhere (suite plan-asserted).
* :func:`normalize_unicode` needs the Unicode character database
  (NFKC/NFC folding: ligatures, fullwidth forms, compatibility
  digits) which the JVM exposes differently than CPython — so it is
  an Arrow-batched Pandas UDF over ``unicodedata``, the sanctioned
  slow path, kept to exactly the step that genuinely needs it.
* :func:`compression_ratio` (deflate bytes / raw bytes, the classic
  cheap junk detector: machine-generated repetition compresses far
  below natural prose) needs zlib — Arrow-batched UDF, one pass,
  deterministic (fixed level, so the ratio is reproducible anywhere
  zlib is).

All three are map-side projections: zero shuffles, trivially linear
at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: control + format chars (C0/C1, ZWSP/ZWNJ/ZWJ, BOM, bidi marks…),
#: EXCEPT tab/newline/CR which are whitespace, handled by the collapse.
_STRIP_CLASS = r"[\p{Cc}\p{Cf}&&[^\t\n\r]]"


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    lower: bool = False,
) -> DataFrame:
    """Strip control/format characters, collapse all whitespace runs to
    a single space, trim; optionally casefold to lowercase.  Pure JVM
    expressions — NULL stays NULL."""
    out_col = out_col or text_col
    c = F.regexp_replace(F.col(text_col), _STRIP_CLASS, "")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    if lower:
        c = F.lower(c)
    return df.withColumn(out_col, c)


def _normalize_udf(form: str):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return norm


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFKC",
    out_col: str | None = None,
) -> DataFrame:
    """Unicode-normalize a string column (default NFKC — folds
    ligatures, fullwidth forms, compatibility digits into their plain
    equivalents, the form tokenizer training wants).  Arrow-batched
    Pandas UDF; NULL stays NULL."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    out_col = out_col or text_col
    return df.withColumn(out_col, _normalize_udf(form)(F.col(text_col)))


def _ratio_udf(level: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(x):
            if x is None:
                return None
            b = x.encode("utf-8")
            if not b:
                return None
            return len(zlib.compress(b, level)) / len(b)

        return s.map(one).astype("float64")

    return ratio


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """Append deflate-bytes / utf-8-bytes of the text (fixed zlib
    level ⇒ deterministic).  Natural prose lands ~0.35–0.65; heavy
    repetition (boilerplate, spam, generator junk) falls far below;
    near-random payloads exceed 1.  NULL/empty text → NULL."""
    return df.withColumn(out_col, _ratio_udf(int(level))(F.col(text_col)))
