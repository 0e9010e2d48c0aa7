"""Multimodal (image/audio/video) column stages — Ray-side plumbing.

Media payloads are opaque ``binary`` columns with typed metadata, processed
by actor-pool ``map_batches`` stages with SMALL batch sizes (payload bytes
dominate — SURVEY §7.5.7). The decode kernels themselves are STUBBED: the
image/audio codec libraries are not in this container, so ``DecodeImage``
raises ``NotImplementedError`` unless given ``fake=True``, which substitutes
a deterministic decode (payload-hash-seeded dimensions/features) so the
pipeline shape — schema, actor signature, batch sizing, output layout — is
real and tested end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_sample_rate", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.bytes(int(rng.integers(256, 4096))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n)),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta_width": pa.array(rng.integers(32, 512, n).astype(np.int32)),
            "meta_height": pa.array(rng.integers(32, 512, n).astype(np.int32)),
            "meta_sample_rate": pa.array(np.full(n, 16_000, dtype=np.int32)),
        }
    )


class DecodeImage:
    """Actor-pool stage: payload -> decoded feature columns.

    Real decode requires an image codec (PIL/cv2 — NOT in this container):
    constructing with ``fake=False`` raises ``NotImplementedError`` at the
    first batch, by design. ``fake=True`` derives deterministic pseudo-decode
    features from the payload bytes so downstream plumbing is exercised.

    Batch sizing rule: batches of media rows must satisfy
    ``batch_size * avg_payload_bytes * concurrency << worker heap``; callers
    pass ``batch_size<=64`` for megabyte-scale payloads.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError(
                "image codecs unavailable in this environment; construct "
                "DecodeImage(fake=True) for the deterministic test decode"
            )
        payloads = batch["payload"]
        h = np.array(
            [np.frombuffer(p, dtype=np.uint8).sum() for p in payloads], dtype=np.float64
        )
        n_bytes = payloads.map(len).to_numpy()
        return pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "decoded_mean": np.round(h / np.maximum(n_bytes, 1), 6),
                "decoded_bytes": n_bytes.astype(np.int64),
                "thumb_width": np.minimum(batch["meta_width"].to_numpy(), 64).astype(np.int32),
                "thumb_height": np.minimum(batch["meta_height"].to_numpy(), 64).astype(np.int32),
            }
        )


class FrameSampler:
    """Video frame-sampling plumbing (stub decode): emits ``n_frames`` rows
    per video row with deterministic frame offsets — the flat_map shape for
    frame-level pipelines."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        if not fake:
            raise NotImplementedError("video codecs unavailable; use fake=True")
        self.n_frames = n_frames

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        reps = np.repeat(np.arange(len(batch)), self.n_frames)
        out = batch.iloc[reps][["media_id"]].reset_index(drop=True)
        out["frame_idx"] = np.tile(np.arange(self.n_frames), len(batch))
        sizes = batch["payload"].map(len).to_numpy()
        out["frame_offset"] = (
            (sizes[reps] * out["frame_idx"].to_numpy()) // self.n_frames
        ).astype(np.int64)
        return out


def decode_pipeline(media_ds, fake: bool = True, batch_size: int = 64, concurrency: int = 2):
    """media table -> decoded features via an actor pool (setup once/actor)."""
    return media_ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
