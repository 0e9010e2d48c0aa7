"""Nonlinear DSSL: functional gradient boosting + sliced-ensemble scoring
(SURVEY L3/L4/A12).

Mirrors the reference's GBRT-DSSL dataflow (dssFunctionLibrary.R:487-776):
per iteration, evaluate the ranking-loss functional gradient at the current
scores (segment-sums over the pair table — the A4 shuffle shape), fit a weak
learner to the negative gradient, pick a step by Armijo backtracking
(:640-669), damp, and stop on relative improvement. The reference's weak
learner is an ``rpart`` tree; this engine uses depth-limited axis-aligned
regression trees built with vectorized NumPy — the learner is replaceable,
the loop's dataflow is the surface.

A12 sliced scoring (dssFunctionLibrary.R:1946-2011): an ensemble is scored as
``sum over slices of partial scores`` — each slice is an independent
actor-pool pass whose partial-score columns sum associatively, so a model
larger than worker RAM streams through in slices.
"""

from __future__ import annotations

import numpy as np

from .dssl import huber_ramp


class RegressionStump:
    """Depth-d axis-aligned regression tree, vectorized histogram splits."""

    def __init__(self, max_depth: int = 2, min_leaf: int = 20, n_cuts: int = 16):
        self.max_depth = max_depth
        self.min_leaf = min_leaf
        self.n_cuts = n_cuts
        self.nodes: list[tuple] = []  # (feature, threshold, left, right) or (None, value)

    def _fit_node(self, x: np.ndarray, y: np.ndarray, depth: int) -> int:
        idx = len(self.nodes)
        self.nodes.append(None)  # placeholder
        if depth >= self.max_depth or y.size < 2 * self.min_leaf:
            self.nodes[idx] = (None, float(y.mean()) if y.size else 0.0, -1, -1)
            return idx
        best = None
        base = float(((y - y.mean()) ** 2).sum())
        for f in range(x.shape[1]):
            col = x[:, f]
            cuts = np.quantile(col, np.linspace(0.05, 0.95, self.n_cuts))
            for c in np.unique(cuts):
                mask = col <= c
                nl = int(mask.sum())
                if nl < self.min_leaf or y.size - nl < self.min_leaf:
                    continue
                yl = y[mask]
                yr = y[~mask]
                sse = float(((yl - yl.mean()) ** 2).sum() + ((yr - yr.mean()) ** 2).sum())
                if best is None or sse < best[0]:
                    best = (sse, f, float(c), mask)
        if best is None or best[0] >= base:
            self.nodes[idx] = (None, float(y.mean()), -1, -1)
            return idx
        _, f, c, mask = best
        left = self._fit_node(x[mask], y[mask], depth + 1)
        right = self._fit_node(x[~mask], y[~mask], depth + 1)
        self.nodes[idx] = (f, c, left, right)
        return idx

    def fit(self, x: np.ndarray, y: np.ndarray) -> "RegressionStump":
        self.nodes = []
        self._fit_node(np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64), 0)
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        out = np.empty(x.shape[0])
        stack = [(0, np.arange(x.shape[0]))]
        while stack:
            node, rows = stack.pop()
            f, c, left, right = self.nodes[node]
            if f is None:
                out[rows] = c
                continue
            mask = x[rows, f] <= c
            stack.append((left, rows[mask]))
            stack.append((right, rows[~mask]))
        return out


def ranking_loss_and_grad(
    scores: np.ndarray, pairs: np.ndarray, mu: float, h: float
) -> tuple[float, np.ndarray]:
    """Huber ranking loss over score differences + its functional gradient
    w.r.t. per-row scores: the A4 segment-sum/scatter-add shape
    (dssFunctionLibrary.R:586-637)."""
    diff = scores[pairs[:, 0]] - scores[pairs[:, 1]]
    margin = mu - diff
    loss = float(huber_ramp(margin, h).sum()) / max(len(pairs), 1)
    # dloss/ddiff: zone3 -> -1; zone2 -> -(margin+h)/(2h); zone1 -> 0
    d = np.zeros_like(margin)
    z3 = margin > h
    z2 = (margin >= -h) & (margin <= h)
    d[z3] = -1.0
    d[z2] = -(margin[z2] + h) / (2 * h)
    grad = np.zeros_like(scores)
    np.add.at(grad, pairs[:, 0], d)
    np.add.at(grad, pairs[:, 1], -d)
    return loss, grad / max(len(pairs), 1)


def train_gbrt_dssl(
    x: np.ndarray,
    pairs: np.ndarray,
    mu: float = 1.0,
    h: float = 0.5,
    max_trees: int = 50,
    max_depth: int = 2,
    damping: float = 0.5,
    rel_tol: float = 1e-5,
) -> dict:
    """Functional gradient boosting loop (dssFunctionLibrary.R:699-773):
    trees fit to -grad, Armijo backtracking step, damping, early stop."""
    n = x.shape[0]
    scores = np.zeros(n)
    trees: list[RegressionStump] = []
    steps: list[float] = []
    loss, grad = ranking_loss_and_grad(scores, pairs, mu, h)
    history = [loss]
    prev_step = 1.0
    for _ in range(max_trees):
        tree = RegressionStump(max_depth=max_depth).fit(x, -grad)
        direction = tree.predict(x)
        gd = float(grad @ direction)
        if gd >= 0:
            break
        step = min(max(2.0 * prev_step, 1.0), 1e4)  # warm-start the line search
        while step > 1e-10:
            new_loss, _ = ranking_loss_and_grad(scores + step * direction, pairs, mu, h)
            if new_loss <= loss + 1e-4 * step * gd:  # Armijo (gd < 0)
                break
            step *= 0.5
        prev_step = step
        step *= damping
        scores = scores + step * direction
        new_loss, grad = ranking_loss_and_grad(scores, pairs, mu, h)
        trees.append(tree)
        steps.append(step)
        if loss - new_loss <= rel_tol * max(abs(loss), 1e-12):
            loss = new_loss
            history.append(loss)
            break
        loss = new_loss
        history.append(loss)
    return {"trees": trees, "steps": steps, "loss_history": history, "train_scores": scores}


def optimize_ranks(
    n: int,
    pairs: np.ndarray,
    mu: float = 1.0,
    h: float = 0.5,
    max_iter: int = 200,
    lr: float = 1.0,
    tol: float = 1e-9,
) -> np.ndarray:
    """L4 optimal-rank solver (dssFunctionLibrary.R:1104-1335): plain gradient
    descent directly on the per-row score (rank) vector under the same Huber
    ranking loss — the model-free upper bound the reference uses to sanity-
    check learners."""
    scores = np.zeros(n)
    loss, grad = ranking_loss_and_grad(scores, pairs, mu, h)
    step = lr
    for _ in range(max_iter):
        gnorm2 = float(grad @ grad)
        if gnorm2 < tol:
            break
        step = min(step * 2.0, 1e3)
        while step > 1e-12:
            new_scores = scores - step * grad
            new_loss, new_grad = ranking_loss_and_grad(new_scores, pairs, mu, h)
            if new_loss <= loss - 1e-4 * step * gnorm2:
                break
            step *= 0.5
        if abs(loss - new_loss) <= tol * max(1.0, abs(loss)):
            scores, loss, grad = new_scores, new_loss, new_grad
            break
        scores, loss, grad = new_scores, new_loss, new_grad
    return scores


def negative_downsample(
    labels: np.ndarray, ratio: int = 10, seed: int = 42
) -> np.ndarray:
    """O6 (dssFunctionLibrary.R:1518): keep all positives + a seeded sample of
    ``ratio * n_pos`` negatives; returns the kept row indices, sorted."""
    labels = np.asarray(labels)
    pos = np.flatnonzero(labels == 1)
    neg = np.flatnonzero(labels != 1)
    k = min(ratio * pos.size, neg.size)
    rng = np.random.default_rng(seed)
    keep_neg = rng.choice(neg, k, replace=False) if k else np.empty(0, dtype=np.int64)
    return np.sort(np.r_[pos, keep_neg])


def score_ensemble(model: dict, x: np.ndarray) -> np.ndarray:
    """Full-model scoring: sum of step-weighted tree outputs."""
    out = np.zeros(x.shape[0])
    for tree, a in zip(model["trees"], model["steps"]):
        out += a * tree.predict(x)
    return out


def slice_ensemble(model: dict, n_slices: int) -> list[dict]:
    """A12: split the ensemble into independently scoreable slices
    (SliceGBRT, dssFunctionLibrary.R:1946-1972)."""
    trees = model["trees"]
    steps = model["steps"]
    bounds = np.linspace(0, len(trees), n_slices + 1).astype(int)
    return [
        {"trees": trees[bounds[i] : bounds[i + 1]], "steps": steps[bounds[i] : bounds[i + 1]]}
        for i in range(n_slices)
    ]


class EnsembleSliceScorer:
    """Actor-pool stage (A12): holds ONE model slice (fetched once per actor
    via ray.get in __init__), emits the slice's partial score per batch; the
    pipeline sums partial-score columns across slice passes (associative)."""

    def __init__(self, slice_ref, feature_cols: list[str]):
        import ray

        self.model = ray.get(slice_ref) if not isinstance(slice_ref, dict) else slice_ref
        self.cols = feature_cols

    def __call__(self, batch):
        import pandas as pd

        x = batch[self.cols].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {"row_key": batch["row_key"], "partial_score": score_ensemble(self.model, x)}
        )
