"""Real stdlib media codecs (operators/media_codecs.py) and the
Spark-side decode router (multimodal.decode_media_features)."""

from __future__ import annotations

import numpy as np
import pytest

from kafka_avro_order_processing_spark.operators.media_codecs import (
    decode_png,
    decode_wav,
    encode_png,
    synthesize_wav,
)


def _rng_image(h, w, c, seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    return arr if c > 1 else arr[:, :, 0]


class TestWav:
    def test_round_trip_features(self):
        sr = 16000
        t = np.arange(sr // 4)  # 250 ms
        samples = (10000 * np.sin(2 * np.pi * 440 * t / sr)).astype("<i2")
        d = decode_wav(synthesize_wav(samples, sample_rate=sr))
        assert d["sample_rate"] == sr
        assert d["n_channels"] == 1
        assert d["n_frames"] == len(samples)
        assert d["duration_ms"] == 1000.0 * len(samples) / sr
        want_rms = float(np.sqrt(np.mean(samples.astype("float64") ** 2)))
        assert d["rms"] == want_rms  # same arithmetic -> exact

    def test_stereo(self):
        inter = np.array([100, -100, 200, -200, 300, -300], dtype="<i2")
        d = decode_wav(synthesize_wav(inter, sample_rate=8000, n_channels=2))
        assert d["n_channels"] == 2
        assert d["n_frames"] == 3

    def test_empty(self):
        d = decode_wav(synthesize_wav(np.array([], dtype="<i2")))
        assert d["n_frames"] == 0 and d["rms"] == 0.0


class TestPng:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_round_trip_every_filter_and_colortype(self, channels, filter_type):
        """decode must invert encode for every (color type, filter)
        combination — this exercises every un-filter branch including
        the sequential Sub/Average/Paeth reconstruction."""
        arr = _rng_image(5, 7, channels, seed=channels * 10 + filter_type)
        d = decode_png(encode_png(arr, filter_type=filter_type))
        assert (d["width"], d["height"], d["n_channels"]) == (7, 5, channels)
        expect = arr if arr.ndim == 3 else arr[:, :, None]
        assert np.array_equal(d["pixels"], expect)
        assert d["mean_pixel"] == float(expect.astype("float64").mean())

    def test_one_pixel_wide(self):
        """stride == bpp edge: no left neighbor anywhere."""
        arr = _rng_image(4, 1, 3, seed=9)
        for ft in range(5):
            assert np.array_equal(
                decode_png(encode_png(arr, filter_type=ft))["pixels"], arr
            )

    def test_rejects_non_png_and_unsupported(self):
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"\xff\xd8\xffjunkjunk")
        # palette image: patch color type byte inside a valid PNG
        good = bytearray(encode_png(_rng_image(2, 2, 1, seed=1)))
        good[8 + 4 + 4 + 9] = 3  # IHDR color-type byte
        with pytest.raises(ValueError):
            decode_png(bytes(good))


def test_spark_decode_media_features(spark):
    """The Arrow-batched router: PNG and WAV rows decode for real, a
    junk row degrades to a decode_error instead of failing the task."""
    from kafka_avro_order_processing_spark.operators.multimodal import (
        decode_media_features,
    )

    img = _rng_image(3, 4, 3, seed=42)
    png = encode_png(img, filter_type=4)
    wav = synthesize_wav(
        np.array([1000, -1000, 2000, -2000], dtype="<i2"), sample_rate=8000
    )
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav)), (3, bytearray(b"not media"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_media_features(df).collect()}

    assert rows[1]["mime"] == "image/png"
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_channels"]) == (4, 3, 3)
    assert rows[1]["mean_pixel"] == float(img.astype("float64").mean())
    assert rows[1]["decode_error"] is None

    assert rows[2]["mime"] == "audio/wav"
    assert rows[2]["sample_rate"] == 8000 and rows[2]["n_frames"] == 4
    assert rows[2]["duration_ms"] == 0.5  # 4 frames @ 8 kHz
    assert rows[2]["decode_error"] is None

    assert rows[3]["decode_error"] == "unsupported format"


def test_spark_resize_png_real(spark):
    """decode_stub=False resize is a REAL PNG round-trip: output bytes
    re-decode to the nearest-neighbor-sampled pixels."""
    from kafka_avro_order_processing_spark.operators.multimodal import (
        resize_payloads,
    )

    arr = _rng_image(8, 6, 3, seed=7)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(arr)))], "doc_id long, payload binary"
    )
    out = resize_payloads(df, target_w=3, target_h=4, decode_stub=False).collect()
    assert len(out) == 1 and (out[0]["width"], out[0]["height"]) == (3, 4)
    d = decode_png(bytes(out[0]["resized"]))
    yi = np.minimum(((np.arange(4) + 0.5) * 8 / 4).astype(int), 7)
    xi = np.minimum(((np.arange(3) + 0.5) * 6 / 3).astype(int), 5)
    assert np.array_equal(d["pixels"], arr[yi][:, xi])


def test_spark_resize_rejects_non_png_when_real(spark):
    from kafka_avro_order_processing_spark.operators.multimodal import (
        resize_payloads,
    )
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame(
        [(1, bytearray(b"junk"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception) as exc:
        resize_payloads(df, 2, 2, decode_stub=False).collect()
    assert "signature" in str(exc.value) or "PNG" in str(exc.value) or isinstance(
        exc.value, Py4JJavaError
    )


def test_spark_sample_frames_wav_real(spark):
    """decode_stub=False frame sampling windows real PCM: each emitted
    frame is a standalone decodable WAV holding the right slice."""
    from kafka_avro_order_processing_spark.operators.multimodal import (
        sample_frames,
    )

    sr = 1000  # 1 kHz -> every_ms=250 is 250 samples/frame
    samples = np.arange(900, dtype="<i2")  # 900 ms -> 4 frames (last partial)
    df = spark.createDataFrame(
        [(7, bytearray(synthesize_wav(samples, sample_rate=sr)))],
        "doc_id long, payload binary",
    )
    rows = sorted(
        sample_frames(df, every_ms=250, max_frames=8, decode_stub=False).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["frame_offset_ms"] for r in rows] == [0, 250, 500, 750]
    d0 = decode_wav(bytes(rows[0]["frame"]))
    assert d0["sample_rate"] == sr and d0["n_frames"] == 250
    d3 = decode_wav(bytes(rows[3]["frame"]))
    assert d3["n_frames"] == 150  # 900 - 3*250
    # slice content check: frame 1 carries samples 250..499
    with_frames = np.frombuffer(
        bytes(rows[1]["frame"])[44:], dtype="<i2"
    )  # canonical 44-byte header
    assert np.array_equal(with_frames, samples[250:500])
