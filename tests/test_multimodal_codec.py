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
