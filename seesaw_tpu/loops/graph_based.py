"""Graph-based loop: KnnProp2 — rank by propagated label scores.

Mirrors the reference (`/root/reference/seesaw/loops/graph_based.py:18-121`):
build/restrict the kNN graph, RBF-weight + symmetrize it, and on every round
propagate the user labels over it; ranking runs the frame-augmentation tail
over the propagated per-tile scores. Weight structures are memoized
process-wide (the reference used a Ray cache actor).
"""
from __future__ import annotations

import threading
from typing import Optional

import numpy as np
from pydantic import BaseModel

from ..knn_graph import KNNGraph, forward_weights, rbf_kernel, symmetrize_weights
from .knn_methods import LabelPropagationRanker2
from .loop_base import LoopBase


class WeightMatrixOptions(BaseModel):
    knn_path: str = ""
    knn_k: int
    edist: float
    self_edges: bool = False
    normalized_weights: bool = False
    symmetric: bool = True
    xlx_matrix: bool = False


_wm_cache: dict = {}
_wm_lock = threading.Lock()


def lookup_weights(opts: WeightMatrixOptions, *, use_cache: bool = True,
                   X_vectors: Optional[np.ndarray] = None):
    """Symmetric weight structure (or XLX matrix) for a graph path, cached."""
    key = opts.model_dump_json()
    with _wm_lock:
        if use_cache and key in _wm_cache:
            return _wm_cache[key]
    knng = KNNGraph.from_file(opts.knn_path).restrict_k(k=opts.knn_k)
    if opts.symmetric:
        weights = symmetrize_weights(knng, rbf_kernel(opts.edist))
    else:
        # uniform-degree forward adjacency (self included, weight 0) — the
        # shape the ENS planner requires; see knn_graph.forward_weights
        weights = forward_weights(knng, rbf_kernel(opts.edist))
    if opts.xlx_matrix:
        assert X_vectors is not None
        out = weights.xlx(X_vectors, normalize_by_trace=True)
    else:
        out = weights
    with _wm_lock:
        if use_cache:
            _wm_cache[key] = out
    return out


def get_weights_from_index(idx, weight_matrix_options: dict, xlx_matrix: bool = False,
                           X_vectors=None):
    opts = WeightMatrixOptions(**weight_matrix_options)
    opts.xlx_matrix = xlx_matrix
    opts.knn_path = str(idx.get_knng_path(name=weight_matrix_options.get("knn_path", "")))
    use_cache = "subset" not in opts.knn_path
    return lookup_weights(opts, use_cache=use_cache,
                          X_vectors=X_vectors if xlx_matrix else None)


def get_label_prop(q, label_prop_params: dict) -> LabelPropagationRanker2:
    weights = get_weights_from_index(q.index, label_prop_params["matrix_options"])
    kwargs = {k: v for k, v in label_prop_params.items() if k != "matrix_options"}
    layout = None
    if kwargs.pop("windowed", False):
        # serving-scale lane-shuffle propagation (ops.pallas_spmv). The
        # layout is built on the index's OWN vector order — multiscale
        # graphs have natural window locality (a tile's kNN neighbors are
        # often sibling tiles of the same/adjacent frames); the layout's
        # coverage field quantifies it, and out-of-window edges fall back
        # to the exact XLA gather, so results stay correct regardless.
        # serving scale builds the layout ON the accelerator (the host
        # build is ~35 passes over (N,K) arrays — minutes at 1M x 32 on a
        # small host; the device twin is oracle-tested field-for-field
        # equal); _auto escalates the window once when the graph's
        # post-ordering bandwidth exceeds the swept default, RCM-relabels
        # internally when the input order has no locality at all, and
        # returns None (= the exact XLA path) when even that leaves
        # coverage below the windowed/XLA breakeven (~0.55)
        from ..ops.pallas_spmv import build_windowed_layout_auto

        layout = build_windowed_layout_auto(
            weights.nbr, weights.w, device=weights.nvecs >= 100_000
        )
    return LabelPropagationRanker2(weights=weights, windowed_layout=layout,
                                   **kwargs)


class KnnProp2(LoopBase):
    def __init__(self, gdm, q, params, knn_model):
        super().__init__(gdm, q, params)
        self.state.knn_model = knn_model

    @staticmethod
    def from_params(gdm, q, p):
        return KnnProp2(gdm, q, p, get_label_prop(q, p.interactive_options))

    def set_text_vec(self, tvec):
        super().set_text_vec(tvec)
        # device-built serving indexes return DEVICE scores here, which
        # flips the ranker into device mode (device-persistent labels +
        # device prior, loops/knn_methods.py); host-built indexes return
        # host scores and keep the differential-tested reference path
        score = getattr(self.index, "score_device", self.index.score)
        self.state.knn_model.set_base_scores(score(tvec))

    def next_batch(self):
        p = self.params
        model = self.state.knn_model
        res = self.index.rank_by_scores(
            model.current_scores_any(),  # device array when propagation ran on device
            topk=p.batch_size,
            shortlist_size=p.shortlist_size,
            exclude=self.q.returned,
            agg_method=p.agg_method,
            aug_larger=p.aug_larger,
            aug_weight=p.aug_weight or "level_max",
        )
        self.q.returned.update(res["dbidxs"])
        return res

    def refine(self, change=None):
        pos, neg = self.q.getXy(get_positions=True)
        idxs = np.concatenate([pos, neg])
        labels = np.concatenate([np.ones_like(pos), np.zeros_like(neg)])
        self.state.knn_model.update(idxs, labels)
