"""Checkpoint manifests + resumable partitioned sinks."""

from .manifest import Manifest, write_partitioned_resumable

__all__ = ["Manifest", "write_partitioned_resumable"]
