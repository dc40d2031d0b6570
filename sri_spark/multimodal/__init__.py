from sri_spark.multimodal.binary import (
    ASSET_SCHEMA,
    attach_fake_payloads,
    decode_stats,
    frame_sample,
    resize,
    resolve_image_decoder,
    set_image_decoder,
)

__all__ = [
    "ASSET_SCHEMA",
    "attach_fake_payloads",
    "decode_stats",
    "frame_sample",
    "resize",
    "resolve_image_decoder",
    "set_image_decoder",
]
