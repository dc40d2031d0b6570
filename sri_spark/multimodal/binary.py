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
