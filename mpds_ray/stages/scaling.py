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


def _collect_columns(ds, cols: list[str]) -> dict[str, np.ndarray]:
    out = {c: [] for c in cols}
    for b in ds.iter_batches(batch_size=1 << 20, batch_format="pandas"):
        for c in cols:
            out[c].append(b[c].to_numpy(dtype=np.float64, na_value=np.nan))
    return {c: np.concatenate(v) if v else np.empty(0) for c, v in out.items()}


def fit_robust_scaler(ds, cols: list[str], quantile_range=(25.0, 75.0)) -> dict:
    """Pass 1: per-column median + quantile range. Exact at test scale via a
    single collected column pass; the contract (linear-interpolated
    quantiles) is what a t-digest replaces at 10^12 rows."""
    data = _collect_columns(ds, cols)
    lo, hi = quantile_range
    params = {}
    for c, v in data.items():
        v = v[~np.isnan(v)]
        med = float(np.percentile(v, 50.0))
        qlo, qhi = np.percentile(v, [lo, hi])
        scale = float(qhi - qlo)
        params[c] = {"center": med, "scale": scale if scale != 0 else 1.0}
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
    zero-range guard (scale 1 when max==min)."""
    data = _collect_columns(ds, cols)
    params = {}
    for c, v in data.items():
        v = v[~np.isnan(v)]
        rng = float(v.max() - v.min()) if v.size else 1.0
        params[c] = {"center": float(v.mean()) if v.size else 0.0,
                     "scale": rng if rng != 0 else 1.0}
    return params


def fit_median_impute(ds, cols: list[str], overrides: dict[str, float] | None = None) -> dict:
    """M7 (mimicUsefulFunction.R:583-628): population median per column with
    manual clinical overrides; NaN medians (all-null column) are a hard error
    like the reference's NA-in-defaults stop (:623-625)."""
    data = _collect_columns(ds, cols)
    defaults = {}
    for c, v in data.items():
        v = v[~np.isnan(v)]
        defaults[c] = float(np.median(v)) if v.size else float("nan")
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
