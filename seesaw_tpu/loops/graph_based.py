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
_layout_cache: dict = {}
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


def _windowed_layout_cached(knn_path: str, opts: WeightMatrixOptions,
                            weights):
    """Windowed layout for a serving graph, with the selection DECISIONS
    persisted in a sidecar npz next to the kNN graph: the auto builder's
    one-time costs (RCM relabel ~45-215s host at 1M, ~10 selection probe
    dispatches) are paid once per graph, not once per process. Only the
    few-KB decision (B, W, cap, order, fingerprint) is stored — the
    GB-scale slabs rebuild on device in seconds. A `none` sidecar records
    the below-breakeven verdict (use the XLA path). Stale sidecars (graph
    rebuilt under the same name) are detected by an nbr fingerprint; a
    wrong-but-same-shape order would still be CORRECT (it is just a
    permutation), only slower."""
    import dataclasses
    from pathlib import Path

    from ..ops.pallas_spmv import (
        apply_order,
        build_windowed_layout,
        build_windowed_layout_auto,
        build_windowed_layout_device,
        with_routed_overflow,
    )

    device = weights.nvecs >= 100_000
    nbr, w = np.asarray(weights.nbr), np.asarray(weights.w)
    fp = np.int64(nbr.sum(dtype=np.int64)) + 7919 * nbr.shape[0] + nbr.shape[1]
    # layouts are shared process-wide like the weight structures: the
    # WindowedSpmv object caches its device slabs (~0.5GB at 1M x 32), so
    # concurrent KnnProp2 sessions over one graph must get ONE object, not
    # one rebuild+upload each
    # edist is part of the key: the layout's weight slab is baked from
    # weights.w, which varies with the RBF width even when nbr (and hence
    # fp) is identical — two sessions differing only in edist must not
    # share a WindowedSpmv (the sidecar is immune: it stores only the
    # B/W/cap/order decision and slabs rebuild from the caller's weights)
    cache_key = (knn_path, opts.knn_k, opts.symmetric, float(opts.edist), int(fp))
    cacheable = bool(knn_path) and "subset" not in knn_path
    if cacheable:
        with _wm_lock:
            if cache_key in _layout_cache:
                return _layout_cache[cache_key]
    side = (
        Path(knn_path) / f"windowed_k{opts.knn_k}_"
        f"{'sym' if opts.symmetric else 'fwd'}.npz"
        if knn_path and "subset" not in knn_path
        else None
    )
    def _publish(lay):
        if cacheable:
            with _wm_lock:
                _layout_cache.setdefault(cache_key, lay)
        return lay

    if side is not None and side.exists():
        try:
            z = np.load(side)
            if int(z["fp"]) == int(fp):
                if bool(z["none"]):
                    return _publish(None)
                order = z["order"] if z["order"].size else None
                nbr2, w2 = nbr, w
                if order is not None:
                    nbr2, w2, _ = apply_order(nbr, w, order)
                build = (build_windowed_layout_device if device
                         else build_windowed_layout)
                lay = build(nbr2, w2, B=int(z["B"]), W=int(z["W"]),
                            cap=int(z["cap"]))
                if order is not None:
                    lay = dataclasses.replace(lay, order=order)
                return _publish(with_routed_overflow(lay))
        except Exception:
            pass  # unreadable/stale sidecar: fall through to a fresh build
    layout = build_windowed_layout_auto(nbr, w, device=device)
    if side is not None:
        try:
            import os

            tmp = side.with_name(side.name + f".tmp{os.getpid()}")
            if layout is None:
                np.savez(tmp, fp=fp, none=True, B=0, W=0, cap=0,
                         order=np.zeros(0, np.int64))
            else:
                np.savez(
                    tmp, fp=fp, none=False, B=layout.B, W=layout.W,
                    cap=layout.cap,
                    order=(np.asarray(layout.order, np.int64)
                           if layout.order is not None
                           else np.zeros(0, np.int64)),
                )
            # np.savez appends .npz to names without it; atomic publish so
            # concurrent sessions never read a partial file
            os.replace(str(tmp) + ".npz", side)
        except OSError:
            pass  # read-only index dir: just skip persisting
    return _publish(layout)


def get_label_prop(q, label_prop_params: dict) -> LabelPropagationRanker2:
    weights = get_weights_from_index(q.index, label_prop_params["matrix_options"])
    kwargs = {k: v for k, v in label_prop_params.items() if k != "matrix_options"}
    layout = None
    if kwargs.pop("windowed", False):
        # serving-scale lane-shuffle propagation (ops.pallas_spmv). The
        # layout is built on the index's OWN vector order — multiscale
        # graphs have natural window locality (a tile's kNN neighbors are
        # often sibling tiles of the same/adjacent frames); the auto
        # builder probes the graph's occupancy histogram to pick (B, W,
        # cap), RCM-relabels internally when the input order has no
        # locality at all, and returns None (= the exact XLA path) when
        # even that leaves coverage below the windowed/XLA breakeven
        # (~0.55). Decisions persist in a sidecar next to the graph.
        mo = WeightMatrixOptions(**label_prop_params["matrix_options"])
        knn_path = str(q.index.get_knng_path(
            name=label_prop_params["matrix_options"].get("knn_path", "")
        ))
        layout = _windowed_layout_cached(knn_path, mo, weights)
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
