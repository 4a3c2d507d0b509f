"""Streaming ingest hygiene — the stateless twins of the PII battery
(operators/pii.py) and the URL layer (operators/urls.py): PII is
flagged/redacted and URLs are canonicalized AS DOCUMENTS LAND, before
anything downstream (lake writer, dedup index, decontamination tag)
ever sees a raw email or a tracking-parameter URL.

Reference scope: not in the reference pipeline; completes the
engine's ingest-time curation story (the decontam/LM/classifier
twins gate content, these gate hygiene).

Twin-pattern notes (same contract as streaming/classifier.py):
- every output is pure per-row JVM expression work on that row alone
  (regex + parser calls, zero Python, no state, no watermark), so the
  drained stream BIT-matches the batch operator on the same rows
  under any micro-batching (suite-pinned, one epoch and many);
- ``streaming_domain_filter`` adds the one non-projection: the
  block/allow list is a stream-static BROADCAST join (MB-scale list,
  corpus-side untouched) — still stateless per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.pii import pii_flags, redact_pii
from ..operators.urls import domain_filter, normalize_url
from .pipeline import drain_to_df


def streaming_pii_flags(
    stream_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII counts at ingest (bounded drain; in production
    the same plan runs continuously in front of the DLQ split).
    Output schema matches :func:`operators.pii.pii_flags`."""
    return drain_to_df(pii_flags(stream_docs, id_col, text_col), "append")


def streaming_redact_pii(
    stream_docs: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    types: tuple[str, ...] | None = None,
) -> DataFrame:
    """Typed-placeholder redaction at ingest.  Output schema matches
    :func:`operators.pii.redact_pii`."""
    return drain_to_df(
        redact_pii(stream_docs, text_col, out_col, types), "append"
    )


def streaming_normalize_url(
    stream_docs: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Canonical URL per the batch contract, computed at ingest.
    Output schema matches :func:`operators.urls.normalize_url`."""
    return drain_to_df(normalize_url(stream_docs, url_col, out_col), "append")


def streaming_domain_filter(
    stream_docs: DataFrame,
    domains: DataFrame,
    url_col: str = "url",
    mode: str = "block",
) -> DataFrame:
    """Domain block/allow at ingest: the static list broadcasts into
    every micro-batch (stream-static join — the same NULL semantics as
    the batch operator: block KEEPS unparseable URLs, allow DROPS
    them).  Output schema matches :func:`operators.urls.domain_filter`."""
    return drain_to_df(
        domain_filter(stream_docs, domains, url_col, mode), "append"
    )
