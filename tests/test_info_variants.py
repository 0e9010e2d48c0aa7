"""W5 information-theory variants (joint/conditional/NMI/NVI) vs identities."""

from __future__ import annotations

import numpy as np
import pytest

from mpds_ray.kernels import (
    conditional_entropy,
    entropy,
    joint_entropy,
    nmi,
    nvi,
)

rng = np.random.default_rng(42)


def test_joint_entropy_of_independent_sums():
    x = rng.integers(0, 4, 20000)
    y = rng.integers(0, 4, 20000)
    hx = entropy(x.astype(float))
    hy = entropy(y.astype(float))
    assert joint_entropy(x, y) == pytest.approx(hx + hy, abs=0.01)


def test_joint_entropy_identical_equals_marginal():
    x = rng.integers(0, 8, 5000)
    assert joint_entropy(x, x) == pytest.approx(entropy(x.astype(float)), abs=1e-9)


def test_conditional_entropy_chain_rule():
    x = rng.integers(0, 4, 5000)
    y = (x + rng.integers(0, 2, 5000)) % 4
    # H(x|y) = H(x,y) - H(y), and 0 <= H(x|y) <= H(x)
    hxy = conditional_entropy(x, y)
    assert -1e-9 <= hxy <= entropy(x.astype(float)) + 1e-9


def test_nmi_bounds_and_identity():
    x = rng.integers(0, 6, 5000)
    assert nmi(x, x) == pytest.approx(1.0, abs=1e-6)
    y = rng.integers(0, 6, 5000)
    assert -0.05 <= nmi(x, y) <= 0.2  # independent -> near 0


def test_nvi_identity_and_independence():
    x = rng.integers(0, 6, 5000)
    assert nvi(x, x) == pytest.approx(0.0, abs=1e-6)
    y = rng.integers(0, 6, 5000)
    assert nvi(x, y) > 0.8  # independent -> near 1
