"""Multimodal (image/audio/video) column plumbing (mandate item).

Media are opaque `binary` columns with typed metadata; decode / feature
extraction runs as Arrow-batched Pandas iterators (`mapInPandas`) — the
correct Spark shape for per-asset Python work: batches stream through the
Python worker without materializing a partition, and the exchanged schema is
declared up front.

The actual codec step is STUBBED: image/audio libraries are not available in
this environment, so `decode_stats` computes a deterministic byte-level fake
(size, sha256, byte histogram moments) where a real implementation would call
PIL/ffmpeg, and `decode_image_real` raises NotImplementedError with the
integration point. The Spark-side contracts — schema, partitioning, UDF
signature, batch shape — are real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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


def decode_image_real(content: bytes) -> dict:  # pragma: no cover
    raise NotImplementedError(
        "real decode requires an image/audio library (e.g. PIL, torchaudio, "
        "ffmpeg) not present in this environment; plug it into _decode_batch "
        "in place of the byte-statistics fake"
    )


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {
            "asset_id": pdf["asset_id"],
            "kind": pdf["kind"],
            "n_bytes": pdf["content"].map(len).astype("int64"),
            "sha256": pdf["content"].map(lambda b: hashlib.sha256(b).hexdigest()),
        }
        # deterministic fake for the codec stage (see module docstring)
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
        yield pd.DataFrame(out)


def decode_stats(assets: DataFrame) -> DataFrame:
    """Per-asset decode/feature-extraction pass: Arrow-batched mapInPandas,
    one output row per asset."""
    return assets.mapInPandas(_decode_batch, schema=DECODE_SCHEMA)


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
