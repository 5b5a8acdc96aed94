"""Multimodal binary-column operators: typed media metadata, Arrow-batched
decode/resize/feature-extraction/frame-sampling over mapInPandas (decode
backends stubbed with a deterministic toy codec; plumbing is real)."""

from .columns import (
    DECODED_IMAGE_SCHEMA,
    MEDIA_METADATA_SCHEMA,
    decode_images,
    encode_image,
    extract_byte_features,
    generate_media,
    resize_images,
    sample_video_frames,
)

__all__ = [
    "DECODED_IMAGE_SCHEMA",
    "MEDIA_METADATA_SCHEMA",
    "decode_images",
    "encode_image",
    "extract_byte_features",
    "generate_media",
    "resize_images",
    "sample_video_frames",
]
