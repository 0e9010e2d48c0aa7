"""Distributed per-session feature extraction (SURVEY §3.1 entry point A).

The reference extracts one feature row per recording session
(extractAccelTestV2 et al.). Engine form: a sessions table of samples
``(session_key, modality, t, c1..ck)`` -> ``groupby(session_key).map_groups``
applying the matching extractor -> one wide feature row per session. Sessions
are bounded (one recording), so per-group extraction is the right granularity;
the extractors themselves are the library functions (mpds_ray.functions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.extractors import (
    extract_accel_features,
    extract_audio_features,
    extract_react_features,
    extract_tap_features,
)

EXTRACTORS = {
    "accel": (extract_accel_features, ["t", "x", "y", "z"]),
    "tap": (extract_tap_features, ["t", "x", "y"]),
    "react": (extract_react_features, ["t", "c1", "c2", "btn_visiable", "btn_pressed"]),
}


def extract_session_group(g: pd.DataFrame) -> pd.DataFrame:
    """One session's samples (sorted by t) -> one feature row."""
    modality = g["modality"].iloc[0]
    if modality == "audio":
        # waveform sessions carry (t, amp, fs): ordered samples + sample rate
        g = g.sort_values("t")
        header, feats = extract_audio_features(
            g["amp"].to_numpy(dtype=np.float64), float(g["fs"].iloc[0])
        )
    else:
        fn, cols = EXTRACTORS[modality]
        data = g.sort_values("t")[cols].to_numpy(dtype=np.float64)
        header, feats = fn(data)
    row = {"session_key": g["session_key"].iloc[0], "modality": modality}
    row.update({h: float(v) for h, v in zip(header, feats)})
    return pd.DataFrame([row])


def extract_features_ray(samples_ds):
    """sessions table -> per-session feature rows, one group per session.
    NB: different modalities have different schemas; callers typically filter
    to one modality per pass (the reference runs one extractor per test type)."""
    return samples_ds.groupby("session_key").map_groups(
        extract_session_group, batch_format="pandas"
    )


def synth_sessions_table(n_sessions: int = 12, modality: str = "accel", seed: int = 42) -> pd.DataFrame:
    """Deterministic multi-session samples fixture (FIXTURES.md F3 shapes)."""
    rng = np.random.default_rng(seed)
    frames = []
    for s in range(n_sessions):
        n = int(rng.integers(400, 900))
        t = np.cumsum(rng.uniform(0.015, 0.025, n))
        if modality == "accel":
            f0 = rng.uniform(0.8, 3.0)
            df = pd.DataFrame(
                {
                    "t": t,
                    "x": 9.8 + 0.1 * rng.normal(size=n),
                    "y": 0.4 + 0.6 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.normal(size=n),
                    "z": 0.2 * rng.normal(size=n),
                }
            )
        elif modality == "tap":
            side = (np.arange(n) // 2) % 2
            df = pd.DataFrame(
                {
                    "t": np.cumsum(rng.uniform(0.1, 0.4, n)),
                    "x": np.where(side == 0, 100, 800) + 20 * rng.random(n),
                    "y": 500 + 30 * rng.normal(size=n),
                }
            )
        elif modality == "audio":
            fs = 8000.0
            n = int(fs * rng.uniform(11, 14))
            wav = 0.001 * rng.normal(size=n)
            lo, hi = int(fs * 2), int(fs * 8)
            tt = np.arange(hi - lo) / fs
            wav[lo:hi] += 0.5 * np.sin(2 * np.pi * rng.uniform(200, 400) * tt)
            df = pd.DataFrame({"t": np.arange(n, dtype=np.float64) / fs, "amp": wav, "fs": fs})
        else:  # react
            visible = (np.arange(n) // 10) % 2
            pressed = np.roll(visible, 3)
            pressed[:3] = visible[:3]
            df = pd.DataFrame(
                {"t": t, "c1": 0.0, "c2": 0.0, "btn_visiable": visible, "btn_pressed": pressed}
            )
        df["session_key"] = f"s{s:04d}"
        df["modality"] = modality
        frames.append(df)
    return pd.concat(frames, ignore_index=True)
