"""Distributed connected components via iterative min-label propagation.

The scale path for near-dup clustering (pipelines/traindata.py:dup_clusters):
when the verified-pair set outgrows one node, a driver union-find is no
longer an option. Min-label propagation needs only bucketed exchanges:

    state   : labels (node -> current component label), hash-bucketed by node
    iterate : edges bucketed by SOURCE endpoint join their bucket's labels ->
              candidate label (u's label) for each neighbour v -> candidates
              re-bucket by v -> per-bucket min-fold against current labels
    stop    : no label changed anywhere (per-bucket changed flags OR-folded)

Every structure is bucketed by node hash; per-iteration traffic is one
(node, label) row per edge — never the node or edge set on one task. The
iteration count is the graph diameter (near-dup components are tiny and
dense, so 2-4 rounds in practice).

Node ids are int64; labels start as the node id, so the fixpoint label is
the component MINIMUM node id — identical to the union-find contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _bucket(x: np.ndarray, num_buckets: int) -> np.ndarray:
    # splitmix-free stable bucket: same contract as stages.partition for ints
    return (x.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int64)


@ray.remote
def _propose(edges: pd.DataFrame, labels: pd.DataFrame, num_buckets: int):
    """One edge bucket (bucketed by u) x its label bucket -> per-target-bucket
    candidate (node=v, label=lbl(u)) tables."""
    lbl = edges.merge(labels, left_on="u", right_on="node", how="left")
    cand = pd.DataFrame({"node": lbl["v"].to_numpy(), "label": lbl["label"].to_numpy()})
    cand = cand.groupby("node", as_index=False)["label"].min()
    b = _bucket(cand["node"].to_numpy(), num_buckets)
    return tuple(cand[b == i] for i in range(num_buckets)) if num_buckets > 1 else cand


@ray.remote
def _fold(labels: pd.DataFrame, *cands: pd.DataFrame):
    """Min-fold candidate labels into one label bucket; returns (new labels,
    changed?)."""
    nonempty = [c for c in cands if len(c)]
    if not nonempty:
        return labels, False
    allc = pd.concat([labels] + [c.rename(columns={"label": "label"}) for c in nonempty])
    new = allc.groupby("node", as_index=False)["label"].min()
    merged = labels.merge(new, on="node", suffixes=("_old", ""))
    changed = bool((merged["label"] < merged["label_old"]).any())
    return new, changed


def connected_components_labelprop(
    pairs: pd.DataFrame, num_buckets: int = 8, max_iters: int = 64
) -> pd.DataFrame:
    """(doc_a, doc_b) edge list -> (doc_id, cluster_id=min node id of its
    component), for nodes appearing in at least one edge. Semantics identical
    to the driver union-find; structure is bucketed exchanges only."""
    a = pairs["doc_a"].to_numpy(dtype=np.int64)
    b = pairs["doc_b"].to_numpy(dtype=np.int64)
    # undirected: propagate both ways
    u = np.concatenate([a, b])
    v = np.concatenate([b, a])
    eb = _bucket(u, num_buckets)
    edge_refs = [
        ray.put(pd.DataFrame({"u": u[eb == i], "v": v[eb == i]}))
        for i in range(num_buckets)
    ]
    nodes = np.unique(u)
    nb = _bucket(nodes, num_buckets)
    label_refs = [
        ray.put(pd.DataFrame({"node": nodes[nb == i], "label": nodes[nb == i]}))
        for i in range(num_buckets)
    ]

    for _ in range(max_iters):
        # propose: edge bucket i needs label bucket i (both bucketed by u)
        proposals = [
            _propose.options(num_returns=num_buckets).remote(
                edge_refs[i], label_refs[i], num_buckets
            )
            for i in range(num_buckets)
        ]
        if num_buckets == 1:
            proposals = [[p] for p in proposals]
        # fold: label bucket j consumes candidates[i][j] for all i
        folded = [
            _fold.options(num_returns=2).remote(
                label_refs[j], *[proposals[i][j] for i in range(num_buckets)]
            )
            for j in range(num_buckets)
        ]
        label_refs = [f[0] for f in folded]
        changed = ray.get([f[1] for f in folded])
        if not any(changed):
            break

    out = pd.concat(ray.get(list(label_refs)), ignore_index=True)
    return (
        out.rename(columns={"node": "doc_id", "label": "cluster_id"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
