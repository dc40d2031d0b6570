from sri_spark.multimodal.binary import (
    ASSET_SCHEMA,
    AUDIO_DECODE_SCHEMA,
    attach_fake_payloads,
    audio_stats,
    decode_stats,
    frame_sample,
    resize,
    resolve_audio_decoder,
    resolve_image_decoder,
    set_audio_decoder,
    set_image_decoder,
)

__all__ = [
    "ASSET_SCHEMA",
    "AUDIO_DECODE_SCHEMA",
    "attach_fake_payloads",
    "audio_stats",
    "decode_stats",
    "frame_sample",
    "resize",
    "resolve_audio_decoder",
    "resolve_image_decoder",
    "set_audio_decoder",
    "set_image_decoder",
]
