"""Multimodal (image/audio/video) column plumbing (mandate item).

Media are opaque `binary` columns with typed metadata; decode / feature
extraction runs as Arrow-batched Pandas iterators (`mapInPandas`) — the
correct Spark shape for per-asset Python work: batches stream through the
Python worker without materializing a partition, and the exchanged schema is
declared up front.

The codec step is pluggable (`codec='auto'|'real'|'fake'`): `real` runs an
image decoder — PIL when importable, or any decoder registered via
`set_image_decoder` — filling the decoded_* columns; `fake` computes only
the deterministic byte-level statistics (size, sha256, byte moments);
`auto` (default) uses the real decoder when one is available and falls back
to the fake otherwise, so the same pipeline runs here (no image libs) and
in production unchanged. The Spark-side contracts — schema, partitioning,
UDF signature, batch shape — are identical in both modes and tested both
ways (tests/test_multimodal_codec.py).
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),  # media metadata (nullable)
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_std", DoubleType()),
        # decoded media fields — filled by the real codec, null in fake mode
        # (one schema for both modes keeps downstream plans mode-independent)
        StructField("decoded_width", IntegerType()),
        StructField("decoded_height", IntegerType()),
        StructField("pixel_mean", DoubleType()),
        StructField("pixel_std", DoubleType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("offset", LongType()),
        StructField("checksum", StringType()),
    ]
)


def attach_fake_payloads(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build an asset table from the documents fixture: utf-8 text bytes as
    the opaque payload (stand-in for real media; JVM-side encode)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "UTF-8").cast("binary").alias("content"),
        F.lit(None).cast("integer").alias("width"),
        F.lit(None).cast("integer").alias("height"),
        F.lit(None).cast("integer").alias("sample_rate"),
    )


# an image decoder takes raw bytes and returns
# {"width": int, "height": int, "pixel_mean": float, "pixel_std": float}
ImageDecoder = Callable[[bytes], dict]

_REGISTERED_DECODER: ImageDecoder | None = None


def set_image_decoder(fn: ImageDecoder | None) -> None:
    """Register (or clear, with None) the real image decoder. Takes
    precedence over the PIL auto-detection; must be picklable — it ships to
    executors inside the mapInPandas closure."""
    global _REGISTERED_DECODER
    _REGISTERED_DECODER = fn


def _pil_decoder() -> ImageDecoder | None:
    """PIL-backed decoder when the library is importable, else None."""
    try:  # import-guard: image libs are optional
        import numpy as np
        from PIL import Image
    except ImportError:
        return None

    def dec(content: bytes) -> dict:
        img = Image.open(io.BytesIO(content))
        arr = np.asarray(img.convert("L"), dtype="float64")
        return {
            "width": img.width,
            "height": img.height,
            "pixel_mean": float(arr.mean()),
            "pixel_std": float(arr.std()),
        }

    return dec


def resolve_image_decoder(codec: str = "auto") -> ImageDecoder | None:
    """Dispatch the codec feature flag: 'fake' -> None, 'real' -> a decoder
    or NotImplementedError, 'auto' -> a decoder if available else None."""
    if codec == "fake":
        return None
    if codec not in ("auto", "real"):
        raise ValueError(f"codec must be auto|real|fake, got {codec!r}")
    dec = _REGISTERED_DECODER or _pil_decoder()
    if dec is None and codec == "real":
        raise NotImplementedError(
            "codec='real' requires an image library (e.g. PIL) or a decoder "
            "registered via set_image_decoder(); none available — use "
            "codec='auto' to fall back to byte statistics"
        )
    return dec


# an audio decoder takes raw bytes and returns
# {"sample_rate": int, "n_channels": int, "duration_s": float, "rms": float}
AudioDecoder = Callable[[bytes], dict]

_REGISTERED_AUDIO_DECODER: AudioDecoder | None = None


def set_audio_decoder(fn: AudioDecoder | None) -> None:
    """Register (or clear, with None) the real audio decoder — same contract
    as set_image_decoder: picklable, ships to executors in the closure,
    takes precedence over the built-in WAV auto-detection."""
    global _REGISTERED_AUDIO_DECODER
    _REGISTERED_AUDIO_DECODER = fn


def _wave_decoder() -> AudioDecoder:
    """Stdlib `wave`-backed decoder for PCM WAV payloads (no external audio
    libs in this container; a production deployment registers a
    librosa/soundfile decoder via set_audio_decoder for other codecs).
    Non-WAV bytes raise inside the decoder, which the batch fn maps to null
    decoded fields — the same undecodable-asset contract as images."""
    import struct
    import wave

    def dec(content: bytes) -> dict:
        with wave.open(io.BytesIO(content), "rb") as w:
            rate = w.getframerate()
            n_frames = w.getnframes()
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            frames = w.readframes(n_frames)
        if width == 2:
            samples = struct.unpack(f"<{len(frames) // 2}h", frames)
        elif width == 1:  # unsigned 8-bit PCM, center at 0
            samples = tuple(b - 128 for b in frames)
        else:
            raise ValueError(f"unsupported sample width {width}")
        rms = (
            (sum(s * s for s in samples) / len(samples)) ** 0.5 if samples else 0.0
        )
        return {
            "sample_rate": rate,
            "n_channels": n_ch,
            "duration_s": n_frames / rate if rate else 0.0,
            "rms": float(rms),
        }

    return dec


def resolve_audio_decoder(codec: str = "auto") -> AudioDecoder | None:
    """Same feature-flag dispatch as resolve_image_decoder: 'fake' -> None
    (byte stats only), 'real'/'auto' -> the registered decoder, else the
    stdlib WAV decoder. Unlike images, a real decoder always exists (wave
    is stdlib), so 'real' never raises NotImplementedError — undecodable
    payloads surface as null decoded fields instead."""
    if codec == "fake":
        return None
    if codec not in ("auto", "real"):
        raise ValueError(f"codec must be auto|real|fake, got {codec!r}")
    return _REGISTERED_AUDIO_DECODER or _wave_decoder()


AUDIO_DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        # decoded audio fields — null when the payload is undecodable or
        # codec='fake' (one schema for all modes, like DECODE_SCHEMA)
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)


def _audio_batch_fn(decoder: AudioDecoder | None):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int64"),
                "sha256": pdf["content"].map(lambda b: hashlib.sha256(b).hexdigest()),
            }
            decoded: dict[str, list] = {
                "sample_rate": [],
                "n_channels": [],
                "duration_s": [],
                "rms": [],
            }
            for b in pdf["content"]:
                d: dict = {}
                if decoder is not None:
                    try:
                        d = decoder(bytes(b))
                    except Exception:
                        d = {}  # undecodable asset -> null decoded fields
                decoded["sample_rate"].append(d.get("sample_rate"))
                decoded["n_channels"].append(d.get("n_channels"))
                decoded["duration_s"].append(d.get("duration_s"))
                decoded["rms"].append(d.get("rms"))
            out.update(decoded)
            yield pd.DataFrame(out)

    return fn


def audio_stats(assets: DataFrame, *, codec: str = "auto") -> DataFrame:
    """Per-asset audio decode pass (sample_rate / channels / duration / RMS
    from bytes): the same Arrow-batched mapInPandas shape as decode_stats,
    one output row per asset, schema identical in every codec mode."""
    return assets.select("asset_id", "kind", "content").mapInPandas(
        _audio_batch_fn(resolve_audio_decoder(codec)), schema=AUDIO_DECODE_SCHEMA
    )


def _decode_batch_fn(decoder: ImageDecoder | None):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int64"),
                "sha256": pdf["content"].map(lambda b: hashlib.sha256(b).hexdigest()),
            }
            # deterministic byte statistics — computed in both modes
            means, stds = [], []
            for b in pdf["content"]:
                if len(b) == 0:
                    means.append(0.0)
                    stds.append(0.0)
                    continue
                s = pd.Series(list(b), dtype="float64")
                means.append(float(s.mean()))
                stds.append(float(s.std(ddof=0)))
            out["byte_mean"] = means
            out["byte_std"] = stds
            decoded: dict[str, list] = {
                "decoded_width": [],
                "decoded_height": [],
                "pixel_mean": [],
                "pixel_std": [],
            }
            for b in pdf["content"]:
                d: dict = {}
                if decoder is not None:
                    try:
                        d = decoder(bytes(b))
                    except Exception:
                        d = {}  # undecodable asset -> null decoded fields
                decoded["decoded_width"].append(d.get("width"))
                decoded["decoded_height"].append(d.get("height"))
                decoded["pixel_mean"].append(d.get("pixel_mean"))
                decoded["pixel_std"].append(d.get("pixel_std"))
            out.update(decoded)
            yield pd.DataFrame(out)

    return fn


def decode_stats(assets: DataFrame, *, codec: str = "auto") -> DataFrame:
    """Per-asset decode/feature-extraction pass: Arrow-batched mapInPandas,
    one output row per asset. `codec` picks the decoder (module docstring);
    the output schema is identical in every mode."""
    return assets.mapInPandas(
        _decode_batch_fn(resolve_image_decoder(codec)), schema=DECODE_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("scale", DoubleType()),
    ]
)


def _resize_batch_fn(factor: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # deterministic fake for the resample kernel: keep every
            # `factor`-th byte (a real implementation calls PIL.Image.resize
            # / librosa.resample here and rewrites width/height/sample_rate)
            resized = pdf["content"].map(lambda b: bytes(b[::factor]))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "content": resized,
                    "n_bytes": resized.map(len).astype("int64"),
                    "scale": 1.0 / factor,
                }
            )

    return fn


def resize(assets: DataFrame, factor: int = 4) -> DataFrame:
    """Resize/resample pass: binary-in → binary-out 1:1 transform — the
    third mapInPandas contract shape (decode_stats is 1→1 feature rows,
    frame_sample is 1→N fan-out, this keeps the payload column binary so
    passes chain: resize → decode_stats → downstream)."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    return assets.select("asset_id", "kind", "content").mapInPandas(
        _resize_batch_fn(factor), schema=RESIZE_SCHEMA
    )


def _frame_batch_fn(stride: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "offset": [], "checksum": []}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                for idx, off in enumerate(range(0, max(len(content), 1), stride)):
                    chunk = content[off : off + stride]
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(idx)
                    rows["offset"].append(off)
                    rows["checksum"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(rows)

    return fn


def frame_sample(assets: DataFrame, stride: int = 64) -> DataFrame:
    """Frame/segment sampling: fan-out rows per asset (video-frame shape) —
    demonstrates the 1->N mapInPandas batch contract."""
    return assets.select("asset_id", "content").mapInPandas(
        _frame_batch_fn(stride), schema=FRAME_SCHEMA
    )


# a video decoder takes raw container bytes and returns
# {"width": int, "height": int, "fps": float, "n_frames": int,
#  "duration_s": float}
VideoDecoder = Callable[[bytes], dict]

_REGISTERED_VIDEO_DECODER: VideoDecoder | None = None

# minimal deterministic container for tests: no video libs ship in this
# environment, so the built-in decoder parses this 21-byte header (magic +
# width/height/fps/n_frames); production registers an
# ffmpeg/PyAV-backed decoder via set_video_decoder, same as images/audio
_VIDEO_MAGIC = b"SRIV1"
_VIDEO_HEADER = "<5sIIfI"  # magic, width, height, fps, n_frames


def set_video_decoder(fn: VideoDecoder | None) -> None:
    """Register (or clear) the real video decoder — picklable, ships to
    executors in the closure, takes precedence over the header parser."""
    global _REGISTERED_VIDEO_DECODER
    _REGISTERED_VIDEO_DECODER = fn


def make_fake_video(
    *, width: int, height: int, fps: float, n_frames: int, payload: bytes = b""
) -> bytes:
    """Build a payload the built-in header decoder understands (test
    fixture; the payload bytes stand in for encoded frame data)."""
    import struct

    return (
        struct.pack(_VIDEO_HEADER, _VIDEO_MAGIC, width, height, fps, n_frames)
        + payload
    )


def _header_video_decoder() -> VideoDecoder:
    import struct

    hdr_len = struct.calcsize(_VIDEO_HEADER)

    def dec(content: bytes) -> dict:
        magic, width, height, fps, n_frames = struct.unpack(
            _VIDEO_HEADER, content[:hdr_len]
        )
        if magic != _VIDEO_MAGIC:
            raise ValueError("not an SRIV1 container")
        return {
            "width": width,
            "height": height,
            "fps": float(fps),
            "n_frames": n_frames,
            "duration_s": n_frames / fps if fps else 0.0,
        }

    return dec


def resolve_video_decoder(codec: str = "auto") -> VideoDecoder | None:
    """'fake' -> None (byte stats only); 'real'/'auto' -> the registered
    decoder or the built-in header parser. Undecodable payloads surface as
    null decoded fields (the shared multimodal contract)."""
    if codec == "fake":
        return None
    if codec not in ("auto", "real"):
        raise ValueError(f"codec must be auto|real|fake, got {codec!r}")
    return _REGISTERED_VIDEO_DECODER or _header_video_decoder()


VIDEO_DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("n_frames", IntegerType()),
        StructField("duration_s", DoubleType()),
    ]
)


def _video_batch_fn(decoder: VideoDecoder | None):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int64"),
                "sha256": pdf["content"].map(lambda b: hashlib.sha256(b).hexdigest()),
            }
            decoded: dict[str, list] = {
                "width": [],
                "height": [],
                "fps": [],
                "n_frames": [],
                "duration_s": [],
            }
            for b in pdf["content"]:
                d: dict = {}
                if decoder is not None:
                    try:
                        d = decoder(bytes(b))
                    except Exception:
                        d = {}
                decoded["width"].append(d.get("width"))
                decoded["height"].append(d.get("height"))
                decoded["fps"].append(d.get("fps"))
                decoded["n_frames"].append(d.get("n_frames"))
                decoded["duration_s"].append(d.get("duration_s"))
            out.update(decoded)
            yield pd.DataFrame(out)

    return fn


def video_stats(assets: DataFrame, *, codec: str = "auto") -> DataFrame:
    """Per-asset video metadata decode (width/height/fps/frames/duration) —
    the third modality through the identical Arrow-batched mapInPandas
    shape as decode_stats (image) and audio_stats."""
    return assets.select("asset_id", "kind", "content").mapInPandas(
        _video_batch_fn(resolve_video_decoder(codec)), schema=VIDEO_DECODE_SCHEMA
    )
