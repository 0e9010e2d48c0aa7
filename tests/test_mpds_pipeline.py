"""Entry point B end-to-end (notebook cells 5-28 shapes) on the F5 fixture."""

from __future__ import annotations

import numpy as np
import pytest

from mpds_ray.pipelines.mpds_pipeline import (
    MODALITY_SLICES,
    evaluate,
    run_mpds_training,
    synth_design_matrix,
)


@pytest.fixture(scope="module")
def design():
    return synth_design_matrix()


def test_fixture_shape_and_parity(design):
    # 435 features + 6 index cols; before block then after block
    assert design.shape[1] == 441
    half = len(design) // 2
    assert (design["day_order"].iloc[:half] == 0).all()
    assert (design["day_order"].iloc[half:] == 1).all()


def test_training_recovers_medication_effect(design):
    res = run_mpds_training(design)
    # before-medication rows rank above after rows on held-out patients
    assert res["mean_test_acc"] > 0.8
    # mPDS clamped to [0, 100]
    m = res["scores"]["mpds"]
    assert m.min() >= 0 and m.max() <= 100
    assert res["top_weights"].shape == (30, 2)


def test_modality_subscores_sum_to_total(design):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 435))
    w = rng.normal(size=435)
    ev = evaluate(x, w)
    parts = sum(ev[f"score_{m}"] for m in MODALITY_SLICES)
    np.testing.assert_allclose(parts, ev["score"], atol=1e-10)


def test_deterministic(design):
    a = run_mpds_training(design)
    b = run_mpds_training(design)
    np.testing.assert_allclose(a["scores"]["mpds"], b["scores"]["mpds"])
    assert a["mean_test_acc"] == b["mean_test_acc"]
