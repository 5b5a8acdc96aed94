"""Multimodal binary-column operators: typed media metadata, Arrow-batched
decode/resize/feature-extraction/frame-sampling over mapInPandas. BMP,
PNG, GIF, JPEG (baseline + progressive) and WAV (PCM/float plus G.711
mu-law/A-law and IMA ADPCM compressed audio) decode natively (numpy);
remaining formats (MP3, H.264, ...) are stubbed behind
NotImplementedError (PIL/librosa/ffmpeg absent here)."""

from .audiohash import AUDIO_HASH_SCHEMA, audio_hashes, audio_near_pairs
from .phash import IMAGE_HASH_SCHEMA, image_hashes, image_near_pairs
from .columns import (
    DECODED_IMAGE_SCHEMA,
    MEDIA_METADATA_SCHEMA,
    decode_images,
    encode_bmp,
    encode_image,
    encode_wav,
    extract_byte_features,
    generate_media,
    resize_images,
    sample_video_frames,
)

__all__ = [
    "AUDIO_HASH_SCHEMA",
    "audio_hashes",
    "audio_near_pairs",
    "DECODED_IMAGE_SCHEMA",
    "IMAGE_HASH_SCHEMA",
    "image_hashes",
    "image_near_pairs",
    "MEDIA_METADATA_SCHEMA",
    "decode_images",
    "encode_bmp",
    "encode_image",
    "encode_wav",
    "extract_byte_features",
    "generate_media",
    "resize_images",
    "sample_video_frames",
]
