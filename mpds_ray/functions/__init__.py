"""Per-session feature extractors and scalar helpers (reference parity layer)."""

from .extractors import (
    extract_accel_features,
    extract_audio_features,
    extract_react_features,
    extract_tap_features,
)

__all__ = [
    "extract_accel_features",
    "extract_audio_features",
    "extract_react_features",
    "extract_tap_features",
]
