"""The mPDS training & scoring pipeline — entry point B end-to-end
(DSSL_Training_and_Evaluation.ipynb, SURVEY §3.2).

Replicates the notebook's dataflow over the F5 design-matrix fixture:

    cell 5   before/after medication split = even/odd row parity
    cell 16  per K-fold over patient ids:
               RobustScaler fit on train, applied train/test
               OrderPairs  = (i, i + n/2) row pairing
               SmoothnessPairs = consecutive same-id rows in (id, tsp) order
               train linear DSSL on the diff matrices
               evaluate: scores = X @ w + 5 modality sub-scores (column slices)
    cell 18  model select: per-fold train accuracy -> mean test accuracy
    cell 28  mPDS = clamp(50 * RobustScaler(15,85)(scores) + 50, 0, 100)

The 435-wide feature layout is the notebook's: voice[0:17) balance[17:143)
gait[143:269) tap[269:420) react[420:435).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.dssl import (
    calculate_diff_matrix,
    make_order_pairs,
    make_smoothness_pairs,
    train_dssl_linear,
)
from ..functions.metrics import sign_agreement_accuracy

MODALITY_SLICES = {
    "voice": (0, 17),
    "balance": (17, 143),
    "gait": (143, 269),
    "tap": (269, 420),
    "react": (420, 435),
}
N_FEATURES = 435
INDEX_COLS = ["id", "date", "time", "session", "tsp", "day_order"]


def synth_design_matrix(n_patients: int = 8, n_pairs: int = 12, seed: int = 42) -> pd.DataFrame:
    """F5 fixture: rows in before/after pairs (even/odd parity), 435 feature
    columns with a planted severity direction (medication lowers severity)."""
    rng = np.random.default_rng(seed)
    w_true = rng.normal(size=N_FEATURES) / np.sqrt(N_FEATURES)
    rows = []
    tsp0 = 1_500_000_000.0
    for p in range(n_patients):
        pid = f"{p:04d}"
        for k in range(n_pairs):
            base = rng.normal(size=N_FEATURES)
            sev_off = 1.0 + 0.1 * rng.normal()  # before medication: higher severity
            sev_on = sev_off - 0.8 - 0.1 * abs(rng.normal())
            for parity, sev in ((0, sev_off), (1, sev_on)):
                x = base + sev * w_true * 3.0 + 0.3 * rng.normal(size=N_FEATURES)
                rows.append(
                    {
                        "id": pid,
                        "date": f"2017-{(k % 12) + 1:02d}-01",
                        "time": "10:00",
                        "session": k,
                        "tsp": tsp0 + p * 1e6 + k * 3600 + parity * 1800,
                        "day_order": parity,
                        **{f"f{j}": x[j] for j in range(N_FEATURES)},
                    }
                )
    # notebook cell 5 layout: before block rows come first per parity split
    df = pd.DataFrame(rows)
    before = df[df["day_order"] == 0]
    after = df[df["day_order"] == 1]
    return pd.concat([before, after], ignore_index=True)


def robust_scale_fit(x: np.ndarray, qlo: float = 25.0, qhi: float = 75.0):
    med = np.percentile(x, 50.0, axis=0)
    scale = np.percentile(x, qhi, axis=0) - np.percentile(x, qlo, axis=0)
    scale[scale == 0] = 1.0
    return med, scale


def evaluate(x_scaled: np.ndarray, w: np.ndarray) -> dict[str, np.ndarray]:
    """notebook cell 14: total score + per-modality sub-scores (M11 slices)."""
    out = {"score": x_scaled @ w}
    for name, (lo, hi) in MODALITY_SLICES.items():
        out[f"score_{name}"] = x_scaled[:, lo:hi] @ w[lo:hi]
    return out


def kfold_patients(ids: np.ndarray, k: int = 4) -> list[tuple[np.ndarray, np.ndarray]]:
    """Deterministic entity-level folds (hash split, O7)."""
    uniq = np.unique(ids)
    fold_of = (np.arange(len(uniq)) * 2654435761 % (1 << 32)) % k
    folds = []
    for f in range(k):
        test_ids = set(uniq[fold_of == f])
        test_mask = np.isin(ids, list(test_ids))
        folds.append((~test_mask, test_mask))
    return folds


def run_mpds_training(df: pd.DataFrame, k_folds: int = 4, creg1: float = 10.0,
                      creg2: float = 1.0) -> dict:
    feat_cols = [c for c in df.columns if c not in INDEX_COLS]
    assert len(feat_cols) == N_FEATURES
    ids = df["id"].to_numpy()
    half = len(df) // 2

    fold_results = []
    all_test_scores = []
    for train_mask, test_mask in kfold_patients(ids, k_folds):
        x_train = df.loc[train_mask, feat_cols].to_numpy(dtype=np.float64)
        med, scale = robust_scale_fit(x_train)  # scaler state per fold (M5)
        x_tr = (x_train - med) / scale

        # OrderPairs within the TRAIN subset: before rows pair with their
        # after rows (row i <-> i + half in the full frame; cell 12)
        tr_idx = np.flatnonzero(train_mask)
        pos_of = {g: i for i, g in enumerate(tr_idx)}
        op = []
        for i in tr_idx:
            j = i + half
            if i < half and j in pos_of:
                op.append((pos_of[i], pos_of[j]))
        order_pairs = np.asarray(op, dtype=np.int64)
        smooth_pairs = make_smoothness_pairs(ids[train_mask])
        diff_o = calculate_diff_matrix(x_tr, order_pairs)
        diff_s = calculate_diff_matrix(x_tr, smooth_pairs)
        tsp = df.loc[train_mask, "tsp"].to_numpy(dtype=np.float64)
        dt_s = np.maximum(np.abs(tsp[smooth_pairs[:, 0]] - tsp[smooth_pairs[:, 1]]), 1.0)

        w = train_dssl_linear(diff_o, diff_s, dt_s, creg1=creg1, creg2=creg2, max_iter=300)

        train_acc = sign_agreement_accuracy(diff_o @ w)
        x_te = (df.loc[test_mask, feat_cols].to_numpy(dtype=np.float64) - med) / scale
        ev = evaluate(x_te, w)
        te_idx = np.flatnonzero(test_mask)
        pos_te = {g: i for i, g in enumerate(te_idx)}
        test_pairs = np.asarray(
            [(pos_te[i], pos_te[i + half]) for i in te_idx if i < half and (i + half) in pos_te],
            dtype=np.int64,
        )
        test_acc = (
            sign_agreement_accuracy(ev["score"][test_pairs[:, 0]] - ev["score"][test_pairs[:, 1]])
            if len(test_pairs)
            else float("nan")
        )
        scores_df = df.loc[test_mask, ["id", "tsp"]].copy()
        for kname, v in ev.items():
            scores_df[kname] = v
        all_test_scores.append(scores_df)
        fold_results.append({"weights": w, "train_acc": train_acc, "test_acc": test_acc})

    scores = pd.concat(all_test_scores, ignore_index=True)
    # cell 28: global RobustScaler(15,85) -> mPDS = clamp(50 z + 50, 0, 100)
    s = scores["score"].to_numpy()
    med = np.percentile(s, 50.0)
    rng_ = np.percentile(s, 85.0) - np.percentile(s, 15.0)
    scores["mpds"] = np.clip(50.0 * (s - med) / (rng_ if rng_ else 1.0) + 50.0, 0.0, 100.0)

    # cell 20-23: top-k |weight| report (O3)
    w_mean = np.mean([f["weights"] for f in fold_results], axis=0)
    top = np.argsort(-np.abs(w_mean))[:30]
    weight_report = pd.DataFrame(
        {"feature": [feat_cols[i] for i in top], "weight": np.round(w_mean[top], 6)}
    )
    return {
        "folds": fold_results,
        "mean_test_acc": float(np.nanmean([f["test_acc"] for f in fold_results])),
        "scores": scores,
        "top_weights": weight_report,
    }
