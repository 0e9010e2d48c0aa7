"""Distributed per-session extraction == local library extraction (entry
point A parity through the Ray surface)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mpds_ray.functions.extractors import extract_tap_features
from mpds_ray.stages.session_features import (
    extract_features_ray,
    synth_sessions_table,
)


@pytest.mark.parametrize("modality,width", [("tap", 151 + 2), ("react", 15 + 2)])
def test_ray_extraction_matches_local(ray_session, modality, width):
    import ray.data as rd

    samples = synth_sessions_table(6, modality=modality)
    out = extract_features_ray(rd.from_pandas(samples)).to_pandas()
    assert len(out) == 6
    assert out.shape[1] == width  # features + session_key + modality
    # spot-check one session against the local extractor
    if modality == "tap":
        g = samples[samples["session_key"] == "s0003"].sort_values("t")
        h, f = extract_tap_features(g[["t", "x", "y"]].to_numpy(dtype=np.float64))
        row = out.loc[out["session_key"] == "s0003"].iloc[0]
        np.testing.assert_allclose(
            row[h].to_numpy(dtype=np.float64), f, rtol=1e-12, equal_nan=True
        )


def test_deterministic_across_runs(ray_session):
    import ray.data as rd

    samples = synth_sessions_table(4, modality="react")
    a = extract_features_ray(rd.from_pandas(samples)).to_pandas().sort_values("session_key")
    b = extract_features_ray(rd.from_pandas(samples)).to_pandas().sort_values("session_key")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_audio_sessions_extracted(ray_session):
    import ray.data as rd

    samples = synth_sessions_table(3, modality="audio")
    out = extract_features_ray(rd.from_pandas(samples)).to_pandas()
    assert len(out) == 3
    assert "pitch" in out.columns and out["pitch"].between(150, 450).all()
    assert out["length"].between(4, 8).all()
