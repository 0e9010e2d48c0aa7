"""Multimodal decode query surface (large-scale-pipeline brief: multimodal
binary columns as first-class operators).

The driver testdata ships no media table, so the query synthesizes one
deterministically (seeded; REAL binary PPM and WAV payloads) and runs the
REAL codec actor pools over it: netpbm images decode in pure numpy, WAV/PCM
audio through the stdlib ``wave`` module (stages/multimodal.py). The oracle
is an independent golden built by looping the codec functions directly —
no Ray, no actor pool (oracle/independent.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MEDIA_N = 96
MEDIA_SEED = 13


def media_decode_features(sf_dir: str) -> pd.DataFrame:
    """Decode the synthetic media table with the REAL codecs via actor-pool
    ``map_batches`` (small batches — payload bytes dominate): image rows get
    true pixel means/dims, audio rows true duration/RMS; video rows are
    excluded (no pure-python codec exists — the one remaining stub)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.multimodal import DecodeAudio, decode_pipeline, synth_media_table

    t = synth_media_table(MEDIA_N, seed=MEDIA_SEED, real=True)
    imgs = t.filter(pc.equal(t["kind"], "image"))
    auds = t.filter(pc.equal(t["kind"], "audio"))
    img_out = decode_pipeline(rd.from_arrow(imgs), fake=False, batch_size=16).to_pandas()
    aud_out = (
        rd.from_arrow(auds)
        .map_batches(DecodeAudio, batch_format="pandas", batch_size=16,
                     concurrency=(1, 16))
        .to_pandas()
    )
    img_part = pd.DataFrame(
        {
            "media_id": img_out["media_id"].astype(np.int64),
            "kind": "image",
            "decoded_mean": img_out["decoded_mean"],
            "duration_s": np.nan,
            "rms": np.nan,
        }
    )
    aud_part = pd.DataFrame(
        {
            "media_id": aud_out["media_id"].astype(np.int64),
            "kind": "audio",
            "decoded_mean": np.nan,
            "duration_s": aud_out["duration_s"],
            "rms": aud_out["rms"],
        }
    )
    return (
        pd.concat([img_part, aud_part], ignore_index=True)
        .sort_values("media_id")
        .reset_index(drop=True)
    )


def video_frame_features(sf_dir: str) -> pd.DataFrame:
    """REAL video decode: sample 4 evenly-spaced frames per y4m payload via
    the ``FrameSampler`` actor pool and emit per-frame luma stats. Oracle is
    an independent scalar replay of the y4m byte layout
    (oracle/independent.py — never calls FrameSampler/decode_y4m)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.multimodal import FrameSampler, synth_media_table

    t = synth_media_table(MEDIA_N, seed=MEDIA_SEED, real=True)
    vids = t.filter(pc.equal(t["kind"], "video"))
    out = (
        rd.from_arrow(vids)
        .map_batches(
            FrameSampler,
            fn_constructor_kwargs={"n_frames": 4, "fake": False},
            batch_format="pandas",
            batch_size=16,
            concurrency=(1, 16),
        )
        .to_pandas()
    )
    return (
        out.sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
        .astype({"media_id": np.int64, "frame_idx": np.int64,
                 "n_frames_total": np.int64, "width": np.int64,
                 "height": np.int64})
    )


QUERIES = {
    "media_decode_features": media_decode_features,
    "video_frame_features": video_frame_features,
}
