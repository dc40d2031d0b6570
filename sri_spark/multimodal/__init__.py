from sri_spark.multimodal.binary import (
    ASSET_SCHEMA,
    attach_fake_payloads,
    decode_stats,
    frame_sample,
    resize,
)

__all__ = [
    "ASSET_SCHEMA",
    "attach_fake_payloads",
    "decode_stats",
    "frame_sample",
    "resize",
]
