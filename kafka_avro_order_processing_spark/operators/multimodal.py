"""Multimodal (binary) column plumbing.

Images/audio/video are opaque ``binary`` payloads with typed metadata
riding alongside; the Spark-side contract — schema, partition-friendly
metadata extraction, Arrow-batched decode UDFs over mapInPandas — is
real and tested.  Decode is REAL for the formats that need no
external library: ``decode_media_features`` decodes PNG (stdlib zlib,
all five scanline filters) and WAV/PCM (stdlib wave) end-to-end — see
``operators/media_codecs.py``.  JPEG/video decode and image resize
remain STUBBED (they genuinely need PIL/ffmpeg, absent here):
``decode_stub=True`` yields deterministic fake features,
``decode_stub=False`` raises NotImplementedError where the library
import would go.

Scale notes: binary payloads dominate bytes; metadata extraction
(length/hash/magic sniff) is pure Column expressions so pruning a
corpus by size/type never deserializes payloads in Python.  Decode
runs per-partition via mapInPandas with Arrow batches — payload bytes
cross the JVM->Python boundary once, batched, only for rows that
survived the metadata filter.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Well-known magic prefixes for cheap type sniffing (hex).
MAGIC_PREFIXES = {
    "image/png": "89504e47",
    "image/jpeg": "ffd8ff",
    "audio/wav": "52494646",
}

DECODED_SCHEMA = (
    "doc_id long, byte_len long, content_hash string, width int, height int, n_channels int"
)


def binarize_text(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test harness: treat utf-8 text bytes as an opaque payload column
    (stands in for image/audio bytes in this container)."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload"))


def payload_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Typed metadata from the binary column without any Python: byte
    length, content hash, sniffed mime (magic-prefix match)."""
    hexhead = F.lower(F.hex(F.substring(F.col(payload_col), 1, 4)))
    mime = F.lit("application/octet-stream")
    for m, magic in MAGIC_PREFIXES.items():
        mime = F.when(hexhead.startswith(magic.lower()), F.lit(m)).otherwise(mime)
    return df.select(
        F.col(id_col),
        F.length(payload_col).cast("long").alias("byte_len"),
        F.md5(F.col(payload_col)).alias("content_hash"),
        mime.alias("mime"),
    )


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_stub: bool = True,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas.

    Stub features are deterministic functions of the payload bytes
    (so tests are exact); the non-stub branch is where a real decoder
    plugs in.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if not decode_stub:
            raise NotImplementedError(
                "real media decode requires PIL/torchaudio/ffmpeg, "
                "not available in this environment"
            )
        for pdf in batches:
            payloads = pdf[payload_col]
            digests = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_hash": digests,
                    # deterministic fake "image" dims from the digest
                    "width": digests.map(lambda d: int(d[:2], 16) + 1).astype("int32"),
                    "height": digests.map(lambda d: int(d[2:4], 16) + 1).astype("int32"),
                    "n_channels": digests.map(lambda d: (int(d[4], 16) % 3) + 1).astype("int32"),
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


MEDIA_SCHEMA = (
    "doc_id long, mime string, byte_len long, width int, height int, "
    "n_channels int, sample_rate int, n_frames long, duration_ms double, "
    "rms double, mean_pixel double, decode_error string"
)


def decode_media_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL media decode for the formats that need no external library
    (operators/media_codecs.py): PNG (stdlib zlib inflate + all five
    scanline filters) and WAV/PCM (stdlib wave) — dims / channels /
    mean pixel for images, sample rate / frames / duration / RMS for
    audio.  Unsupported payloads (JPEG, video, junk) land in
    `decode_error` instead of failing the batch — at corpus scale a
    poison payload must cost one row, not one task retry loop.

    Same scale contract as the stub path: Arrow-batched mapInPandas,
    payloads cross the JVM->Python boundary once, only for rows that
    survived the column-expression metadata filter.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codecs import PNG_SIGNATURE, decode_png, decode_wav

        def one(doc_id, payload):
            b = bytes(payload)
            row = {
                "doc_id": doc_id, "mime": "application/octet-stream",
                "byte_len": len(b), "width": None, "height": None,
                "n_channels": None, "sample_rate": None, "n_frames": None,
                "duration_ms": None, "rms": None, "mean_pixel": None,
                "decode_error": None,
            }
            try:
                if b[:8] == PNG_SIGNATURE:
                    d = decode_png(b)
                    row.update(
                        mime="image/png", width=d["width"], height=d["height"],
                        n_channels=d["n_channels"], mean_pixel=d["mean_pixel"],
                    )
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    d = decode_wav(b)
                    row.update(
                        mime="audio/wav", n_channels=d["n_channels"],
                        sample_rate=d["sample_rate"], n_frames=d["n_frames"],
                        duration_ms=d["duration_ms"], rms=d["rms"],
                    )
                else:
                    row["decode_error"] = "unsupported format"
            except Exception as e:  # poison payload -> row-level error
                row["decode_error"] = f"{type(e).__name__}: {e}"[:200]
            return row

        for pdf in batches:
            rows = [one(i, p) for i, p in zip(pdf[id_col], pdf[payload_col])]
            yield pd.DataFrame(rows)

    return df.mapInPandas(_decode, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, resized binary"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_offset_ms long, frame binary"


def resize_payloads(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_stub: bool = True,
) -> DataFrame:
    """Resize plumbing: Arrow-batched map, one JVM->Python crossing.

    ``decode_stub=False`` performs a REAL resize for PNG payloads
    (media_codecs.resize_png: stdlib decode -> nearest-neighbor ->
    re-encode); the input contract is rows pre-filtered to
    ``mime = 'image/png'`` via ``payload_metadata`` — a non-PNG payload
    raises, because silently passing junk through a resize is how a
    corpus pipeline corrupts itself.  The stub branch deterministically
    truncates/pads bytes (for JPEG/video shapes a real implementation
    needs PIL/ffmpeg); schema and batch shape are identical in both.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            from .media_codecs import resize_png

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf[id_col],
                        "width": target_w,
                        "height": target_h,
                        "resized": pdf[payload_col].map(
                            lambda b: resize_png(bytes(b), target_w, target_h)
                        ),
                    }
                )
            return
        size = target_w * target_h
        for pdf in batches:
            payloads = pdf[payload_col].map(
                lambda b: (bytes(b) * (size // max(len(b), 1) + 1))[:size]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": target_w,
                    "height": target_h,
                    "resized": payloads,
                }
            )

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling for time-media payloads: one input row fans out
    to ≤max_frames frame rows (1:N mapInPandas — the schema change is
    why this is a map, not a UDF).

    ``decode_stub=False`` is REAL for WAV payloads: the PCM stream is
    windowed into consecutive `every_ms` chunks, each re-encoded as a
    standalone WAV (media_codecs — same rate/channels), which is the
    standard audio pre-featurization step.  Video payloads genuinely
    need ffmpeg/pyav and raise.  Stub frames are deterministic byte
    slices in the same schema/batch shape.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            import io as _io
            import wave as _wave

            import numpy as np

            from .media_codecs import synthesize_wav

            for pdf in batches:
                out = {"doc_id": [], "frame_idx": [], "frame_offset_ms": [], "frame": []}
                for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                    b = bytes(payload)
                    if not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
                        raise NotImplementedError(
                            "real frame sampling: WAV supported; video needs ffmpeg/pyav"
                        )
                    with _wave.open(_io.BytesIO(b), "rb") as w:
                        sr, nch = w.getframerate(), w.getnchannels()
                        pcm = np.frombuffer(
                            w.readframes(w.getnframes()), dtype="<i2"
                        ).reshape(-1, nch)
                    per = max(1, sr * every_ms // 1000)  # frames per chunk
                    n = min(max_frames, -(-len(pcm) // per)) if len(pcm) else 0
                    for i in range(n):
                        chunk = pcm[i * per : (i + 1) * per].reshape(-1)
                        out["doc_id"].append(doc_id)
                        out["frame_idx"].append(i)
                        out["frame_offset_ms"].append(i * every_ms)
                        out["frame"].append(
                            synthesize_wav(chunk, sample_rate=sr, n_channels=nch)
                        )
                yield pd.DataFrame(out)
            return
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset_ms": [], "frame": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n = min(max_frames, max(len(b) // 16, 1))
                for i in range(n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset_ms"].append(i * every_ms)
                    out["frame"].append(b[i * 16:(i + 1) * 16] or b[:16])
            yield pd.DataFrame(out)

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)
