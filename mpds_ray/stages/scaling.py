"""Global two-pass scalers & imputers (M5/M6/M7): aggregate pass -> broadcast
constants -> vectorized map pass. No mutable state; the fitted params are a
plain dict shipped into ``map_batches`` (ray.put for big models).

- RobustScaler (sklearn semantics: linear-interp quantiles) — notebook cell
  16/28; mPDS rescale = clamp(50 z + 50, 0, 100).
- Center+rescale by 1/range with zero-range guard — mimicUsefulFunction.R:122-149.
- Median imputation with manual overrides — mimicUsefulFunction.R:583-628.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .sketch import column_moments, column_quantiles


def fit_robust_scaler(ds, cols: list[str], quantile_range=(25.0, 75.0)) -> dict:
    """Pass 1: per-column median + quantile range via the mergeable quantile
    summary (stages/sketch.py) — exact (bit-identical to np.percentile) while
    batches fit RAW_LIMIT, bounded-error weighted sketch beyond. The raw
    column is never collected on the driver."""
    lo, hi = quantile_range
    q = column_quantiles(ds, cols, [0.5, lo / 100.0, hi / 100.0])
    params = {}
    for c, (med, qlo, qhi) in ((c, q[c]) for c in cols):
        scale = float(qhi - qlo)
        params[c] = {"center": float(med), "scale": scale if scale != 0 else 1.0}
    return params


def apply_robust_scaler(ds, params: dict, suffix: str = "_scaled"):
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        for c, p in params.items():
            b[c + suffix] = (b[c] - p["center"]) / p["scale"]
        return b

    return ds.map_batches(fn, batch_format="pandas")


def mpds_rescale(z: np.ndarray) -> np.ndarray:
    """notebook cell 28: clamp(50*z + 50, 0, 100)."""
    return np.clip(50.0 * np.asarray(z, dtype=np.float64) + 50.0, 0.0, 100.0)


def fit_center_rescale(ds, cols: list[str]) -> dict:
    """M6 (mimicUsefulFunction.R:122-149): per-column mean and 1/range with
    zero-range guard (scale 1 when max==min). Exact mergeable moments — one
    map pass of (sum, n, min, max) partials."""
    m = column_moments(ds, cols)
    params = {}
    for c in cols:
        rng = float(m[c]["max"] - m[c]["min"]) if m[c]["n"] else 1.0
        params[c] = {"center": m[c]["mean"] if m[c]["n"] else 0.0,
                     "scale": rng if rng != 0 else 1.0}
    return params


def fit_median_impute(ds, cols: list[str], overrides: dict[str, float] | None = None) -> dict:
    """M7 (mimicUsefulFunction.R:583-628): population median per column with
    manual clinical overrides; NaN medians (all-null column) are a hard error
    like the reference's NA-in-defaults stop (:623-625). Median via the
    mergeable quantile summary."""
    q = column_quantiles(ds, cols, [0.5])
    defaults = {c: float(q[c][0]) for c in cols}
    defaults.update(overrides or {})
    bad = [c for c, d in defaults.items() if np.isnan(d)]
    if bad:
        raise ValueError(f"median_impute: NaN defaults for columns {bad}")
    return defaults


def apply_impute(ds, defaults: dict[str, float]):
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        for c, d in defaults.items():
            b[c] = b[c].fillna(d)
        return b

    return ds.map_batches(fn, batch_format="pandas")
