"""Window-statistics kernel registry.

The user-extension surface mirrors the reference's convention of crossing
stat names x axis names into feature headers (extractAccelTestV2.m:49-59):
``STAT_KERNELS`` maps a stat name to a ``fn(window: np.ndarray) -> float``;
pipelines compose them into per-window feature vectors, and register new ones
with :func:`register_kernel`.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from .dfa import fastdfa
from .info import (
    conditional_entropy,
    corrcoef_pair,
    cross_entropy_feature,
    joint_entropy,
    mi,
    nmi,
    nvi,
)
from .lomb import dominant_frequency, lomb_scargle
from .stats import (
    EPS,
    ar1,
    entropy,
    mean_tkeo,
    normalize_z,
    prctile,
    relative_entropy,
    w_iqr,
    w_kurtosis,
    w_mean,
    w_median,
    w_mode,
    w_mse,
    w_q1,
    w_q3,
    w_range,
    w_skewness,
    w_std,
    w_sum,
    zcr,
    zcr_normalized,
)
from .welch import get_pitch, pwelch

# the reference's 18-stat block (extractAccelTestV2.m:49-51) minus the two
# spectral stats (dfc, dfc_amp) which need timestamps and are composed
# separately via kernels.lomb.dominant_frequency.
STAT_KERNELS: dict[str, Callable[[np.ndarray], float]] = {
    "mean": w_mean,
    "std": w_std,
    "q1": w_q1,
    "q3": w_q3,
    "iqr": w_iqr,
    "median": w_median,
    "mode": w_mode,
    "range": w_range,
    "s": w_skewness,
    "k": w_kurtosis,
    "mse": w_mse,
    "En": entropy,
    "zcr": zcr_normalized,
    "meanTKEO": mean_tkeo,
    "ar1": ar1,
    "dfa": fastdfa,
    "sum": w_sum,
}

# cross-feature kernels over channel pairs (extractAccelTestV2.m:103)
CROSS_KERNELS: dict[str, Callable[[np.ndarray, np.ndarray], float]] = {
    "xcorr": corrcoef_pair,
    "mi": mi,
    "xEn": cross_entropy_feature,
}


def register_kernel(name: str, fn: Callable[[np.ndarray], float]) -> None:
    if name in STAT_KERNELS:
        raise ValueError(f"kernel {name!r} already registered")
    STAT_KERNELS[name] = fn


__all__ = [
    "EPS",
    "STAT_KERNELS",
    "CROSS_KERNELS",
    "register_kernel",
    "ar1",
    "conditional_entropy",
    "corrcoef_pair",
    "cross_entropy_feature",
    "dominant_frequency",
    "entropy",
    "fastdfa",
    "get_pitch",
    "joint_entropy",
    "lomb_scargle",
    "mean_tkeo",
    "mi",
    "nmi",
    "normalize_z",
    "nvi",
    "prctile",
    "pwelch",
    "relative_entropy",
    "w_iqr",
    "w_kurtosis",
    "w_mean",
    "w_median",
    "w_mode",
    "w_mse",
    "w_q1",
    "w_q3",
    "w_range",
    "w_skewness",
    "w_std",
    "w_sum",
    "zcr",
    "zcr_normalized",
]
