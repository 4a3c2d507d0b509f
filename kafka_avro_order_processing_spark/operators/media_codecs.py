"""Pure-stdlib media codecs: REAL WAV (PCM) and PNG decode, no
external media libraries.

The container has no PIL/soundfile/ffmpeg, but two of the common
training-corpus formats need none of them:

- **WAV/PCM** — stdlib ``wave`` parses RIFF/fmt/data; features are
  sample rate, channel count, frame count, duration, int16 RMS.
- **PNG** — stdlib ``zlib`` + ``struct``: 8-bit greyscale / RGB /
  greyscale+alpha / RGBA, non-interlaced, with ALL five scanline
  filters (None/Sub/Up/Average/Paeth) un-filtered per the spec
  (RFC 2083 §6).  Palette (color type 3), 16-bit depth, and Adam7
  interlace raise ``ValueError`` — narrow, explicit unsupported set.

Matching encoders (``synthesize_wav`` / ``encode_png``) exist so
tests round-trip REAL bytes; ``encode_png`` can write any of the five
filter types, which makes every decoder filter branch testable with
the encoder as forward reference.

JPEG and video stay honestly stubbed in ``multimodal.py`` — a DCT
entropy decoder is a library, not a utility.  Scale posture is
unchanged: these run inside the Arrow-batched ``mapInPandas`` decode
path, payload bytes cross the JVM→Python boundary once, batched, and
only for rows that survived the column-expression metadata filter.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> channel count (palette deliberately absent).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# --------------------------------------------------------------------------
# WAV (PCM)
# --------------------------------------------------------------------------

def synthesize_wav(
    samples, sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """Valid RIFF/WAVE bytes from int16 samples (interleaved if
    multi-channel)."""
    arr = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Real WAV decode: header fields + int16 RMS over all samples."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        sample_width = w.getsampwidth()
        sample_rate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sample_width != 2:
        raise ValueError(f"only 16-bit PCM supported, got width {sample_width}")
    samples = np.frombuffer(raw, dtype="<i2").astype("float64")
    rms = float(np.sqrt(np.mean(samples * samples))) if samples.size else 0.0
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "duration_ms": 1000.0 * n_frames / sample_rate,
        "rms": rms,
    }


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (spec §6.6), vectorized over a scanline."""
    a16 = a.astype("int16")
    b16 = b.astype("int16")
    c16 = c.astype("int16")
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype("uint8")


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder: 8-bit, non-interlaced; every scanline uses
    `filter_type` (0..4) — the knob that makes each decoder filter
    branch testable."""
    arr = np.asarray(pixels, dtype="uint8")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype="uint8")
    for y in range(h):
        line = arr[y].reshape(-1)
        left = np.concatenate([np.zeros(bpp, "uint8"), line[:-bpp]]) if w * c > bpp else np.zeros_like(line)
        ul = np.concatenate([np.zeros(bpp, "uint8"), prev[:-bpp]]) if w * c > bpp else np.zeros_like(line)
        if filter_type == 0:
            filt = line
        elif filter_type == 1:
            filt = line - left
        elif filter_type == 2:
            filt = line - prev
        elif filter_type == 3:
            filt = line - ((left.astype("int16") + prev.astype("int16")) // 2).astype("uint8")
        elif filter_type == 4:
            filt = line - _paeth(left, prev, ul)
        else:
            raise ValueError(f"bad filter {filter_type}")
        raw.append(filter_type)
        raw.extend(filt.astype("uint8").tobytes())
        prev = line

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def resize_png(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Real PNG resize without any image library: decode -> pixel-center
    nearest-neighbor index sampling (numpy) -> re-encode.  Nearest
    neighbor is the standard cheap thumbnailing kernel; swap the index
    map for area averaging when a real pipeline needs it."""
    d = decode_png(payload)
    px = d["pixels"]
    yi = np.minimum(
        ((np.arange(target_h) + 0.5) * d["height"] / target_h).astype(int),
        d["height"] - 1,
    )
    xi = np.minimum(
        ((np.arange(target_w) + 0.5) * d["width"] / target_w).astype(int),
        d["width"] - 1,
    )
    return encode_png(px[yi][:, xi])


def decode_png(payload: bytes) -> dict:
    """Real PNG decode: parse chunks, inflate, un-filter, return dims +
    channel count + pixel array + mean pixel value."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth}")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    c = _PNG_CHANNELS[color_type]
    bpp = c
    stride = w * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype="uint8")
    prev = np.zeros(stride, dtype="uint8")
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype="uint8"
        ).copy()
        if ft == 0:
            recon = line
        elif ft == 2:
            recon = line + prev
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth reference the reconstructed left pixel
            # -> sequential along the row in bpp-sized steps.
            recon = line
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    recon[x] = (int(recon[x]) + int(left)) & 0xFF
                elif ft == 3:
                    recon[x] = (int(recon[x]) + (int(left) + int(up)) // 2) & 0xFF
                else:
                    p = int(left) + int(up) - int(ul)
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                    recon[x] = (int(recon[x]) + int(pred)) & 0xFF
        else:
            raise ValueError(f"bad filter byte {ft}")
        out[y] = recon
        prev = out[y]
    pixels = out.reshape(h, w, c)
    return {
        "width": w,
        "height": h,
        "n_channels": c,
        "pixels": pixels,
        "mean_pixel": float(pixels.astype("float64").mean()),
    }
