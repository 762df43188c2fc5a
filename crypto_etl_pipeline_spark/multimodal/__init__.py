"""Multimodal column surface (SURVEY.md §2.13)."""

from crypto_etl_pipeline_spark.multimodal.binary import (  # noqa: F401
    MEDIA_SCHEMA,
    attach_fake_payloads,
    decode_image_stub,
    extract_features_stub,
    sample_frames_stub,
)
