"""Codec dispatch for the multimodal decode stage: the feature flag must
route to a real decoder when one is available, fall back to byte statistics
when not, and fail loudly when 'real' is demanded but impossible."""

from __future__ import annotations

import pytest

from sri_spark.multimodal import (
    attach_fake_payloads,
    decode_stats,
    resolve_image_decoder,
    set_image_decoder,
)
from sri_spark.sources.testdata import load_table

PIL_AVAILABLE = False
try:  # mirrors the module's import guard
    import PIL  # noqa: F401

    PIL_AVAILABLE = True
except ImportError:
    pass


def _make_toy_decoder():
    """Deterministic stand-in for a real codec. Returned as a closure so
    cloudpickle ships it BY VALUE — test modules aren't importable on
    executor Python workers, so a plain module-level function (pickled by
    reference) would hit ModuleNotFoundError there."""

    def dec(content: bytes) -> dict:
        if not content:
            raise ValueError("empty payload")
        return {
            "width": len(content) % 1000,
            "height": (len(content) // 1000) + 1,
            "pixel_mean": float(content[0]),
            "pixel_std": float(content[-1]),
        }

    return dec


_toy_decoder = _make_toy_decoder()


@pytest.fixture(autouse=True)
def _clean_registry():
    set_image_decoder(None)
    yield
    set_image_decoder(None)


def test_fake_mode_never_decodes():
    set_image_decoder(_toy_decoder)
    assert resolve_image_decoder("fake") is None


@pytest.mark.skipif(PIL_AVAILABLE, reason="image lib present: auto is real here")
def test_auto_falls_back_without_lib(spark, sf_dir):
    assert resolve_image_decoder("auto") is None
    docs = load_table(spark, sf_dir, "documents").limit(5)
    rows = decode_stats(attach_fake_payloads(docs), codec="auto").collect()
    assert len(rows) == 5
    assert all(r["decoded_width"] is None for r in rows)
    assert all(r["byte_mean"] is not None for r in rows)


@pytest.mark.skipif(PIL_AVAILABLE, reason="image lib present: real works here")
def test_real_without_lib_raises():
    with pytest.raises(NotImplementedError, match="codec='real'"):
        resolve_image_decoder("real")


def test_registered_decoder_drives_real_path(spark, sf_dir):
    set_image_decoder(_toy_decoder)
    docs = load_table(spark, sf_dir, "documents").limit(10)
    assets = attach_fake_payloads(docs)
    rows = {r["asset_id"]: r for r in decode_stats(assets, codec="real").collect()}
    texts = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    assert len(rows) == 10
    for aid, payload in texts.items():
        r = rows[aid]
        assert r["decoded_width"] == len(payload) % 1000
        assert r["decoded_height"] == (len(payload) // 1000) + 1
        assert r["pixel_mean"] == float(payload[0])
        # byte statistics are still present alongside the decoded fields
        assert r["n_bytes"] == len(payload)


def test_undecodable_asset_yields_null_decoded_fields(spark):
    set_image_decoder(_toy_decoder)
    assets = attach_fake_payloads(
        spark.createDataFrame([(1, "")], "doc_id long, text string")
    )
    [r] = decode_stats(assets, codec="real").collect()
    assert r["decoded_width"] is None and r["pixel_mean"] is None
    assert r["n_bytes"] == 0  # byte stats still real


def test_invalid_codec_rejected():
    with pytest.raises(ValueError, match="codec must be"):
        resolve_image_decoder("gpu")


# ---- audio contract (same dispatch shape, stdlib-WAV real decoder) --------


def _wav_bytes(
    *, rate: int = 8000, seconds: float = 0.25, amp: int = 1000, n_ch: int = 1
) -> bytes:
    """In-memory 16-bit PCM WAV: a constant-amplitude square-ish signal so
    the expected RMS is exactly `amp`."""
    import io as _io
    import struct
    import wave as _wave

    n = int(rate * seconds)
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = [amp if i % 2 == 0 else -amp for i in range(n * n_ch)]
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


@pytest.fixture(autouse=True)
def _clean_audio_registry():
    from sri_spark.multimodal import set_audio_decoder

    set_audio_decoder(None)
    yield
    set_audio_decoder(None)


def _audio_assets(spark):
    from pyspark.sql import functions as F

    wav = _wav_bytes()
    rows = [(1, "audio", bytearray(wav)), (2, "audio", bytearray(b"not a wav"))]
    return spark.createDataFrame(
        rows, "asset_id long, kind string, content binary"
    ).withColumn("width", F.lit(None).cast("integer"))


def test_audio_real_path_decodes_wav(spark):
    from sri_spark.multimodal import audio_stats

    out = {r["asset_id"]: r for r in audio_stats(_audio_assets(spark)).collect()}
    wav_row = out[1]
    assert wav_row["sample_rate"] == 8000
    assert wav_row["n_channels"] == 1
    assert abs(wav_row["duration_s"] - 0.25) < 1e-9
    assert abs(wav_row["rms"] - 1000.0) < 1e-6
    assert wav_row["n_bytes"] > 0 and len(wav_row["sha256"]) == 64
    # undecodable payload -> null decoded fields, byte stats still present
    bad = out[2]
    assert bad["sample_rate"] is None and bad["rms"] is None
    assert bad["n_bytes"] == 9


def test_audio_fake_mode_never_decodes(spark):
    from sri_spark.multimodal import audio_stats

    out = {
        r["asset_id"]: r
        for r in audio_stats(_audio_assets(spark), codec="fake").collect()
    }
    assert out[1]["sample_rate"] is None and out[1]["rms"] is None
    assert out[1]["n_bytes"] > 0


def test_audio_registered_decoder_takes_precedence(spark):
    from sri_spark.multimodal import audio_stats, set_audio_decoder

    def _make():
        def dec(content: bytes) -> dict:
            return {
                "sample_rate": 42,
                "n_channels": 7,
                "duration_s": 1.5,
                "rms": 2.5,
            }

        return dec

    set_audio_decoder(_make())
    out = {
        r["asset_id"]: r
        for r in audio_stats(_audio_assets(spark), codec="real").collect()
    }
    assert out[1]["sample_rate"] == 42 and out[2]["n_channels"] == 7


def test_audio_invalid_codec_rejected():
    from sri_spark.multimodal import resolve_audio_decoder

    with pytest.raises(ValueError, match="codec"):
        resolve_audio_decoder("mp3")


def test_video_stats_decodes_header_container(spark):
    from pyspark.sql import functions as F

    from sri_spark.multimodal import make_fake_video, video_stats

    payloads = [
        (0, "video", make_fake_video(width=640, height=480, fps=24.0, n_frames=48,
                                     payload=b"x" * 100)),
        (1, "video", make_fake_video(width=1920, height=1080, fps=30.0, n_frames=90)),
        (2, "video", b"not a video at all"),  # undecodable -> null fields
    ]
    assets = spark.createDataFrame(
        payloads, "asset_id long, kind string, content binary"
    )
    rows = {r["asset_id"]: r for r in video_stats(assets).collect()}
    assert rows[0]["width"] == 640 and rows[0]["height"] == 480
    assert rows[0]["n_frames"] == 48 and abs(rows[0]["duration_s"] - 2.0) < 1e-9
    assert rows[1]["fps"] == 30.0 and abs(rows[1]["duration_s"] - 3.0) < 1e-9
    assert rows[2]["width"] is None and rows[2]["duration_s"] is None
    assert rows[2]["n_bytes"] == len(b"not a video at all")  # byte stats always


def test_video_registered_decoder_takes_precedence(spark):
    from sri_spark.multimodal import make_fake_video, set_video_decoder, video_stats

    def fixed(content: bytes) -> dict:
        return {"width": 1, "height": 1, "fps": 1.0, "n_frames": 1,
                "duration_s": 1.0}

    assets = spark.createDataFrame(
        [(0, "video", make_fake_video(width=640, height=480, fps=24.0, n_frames=48))],
        "asset_id long, kind string, content binary",
    )
    set_video_decoder(fixed)
    try:
        r = video_stats(assets).collect()[0]
        assert r["width"] == 1 and r["n_frames"] == 1
    finally:
        set_video_decoder(None)
    # cleared: back to the header parser
    r = video_stats(assets).collect()[0]
    assert r["width"] == 640


def test_video_fake_codec_byte_stats_only(spark):
    from sri_spark.multimodal import make_fake_video, video_stats

    assets = spark.createDataFrame(
        [(0, "video", make_fake_video(width=8, height=8, fps=2.0, n_frames=4))],
        "asset_id long, kind string, content binary",
    )
    r = video_stats(assets, codec="fake").collect()[0]
    assert r["width"] is None and r["n_bytes"] > 0
