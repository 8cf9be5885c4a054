"""LabelPropagation: host wrapper over the device Jacobi program.

API mirrors the reference class (`/root/reference/seesaw/
label_propagation.py:6-79`): construct with a weight structure + reg_lambda,
call fit_transform with labeled ids/values, prior (reg) values and an
optional warm start. Bounds-checking matches the reference's invariants
(scores stay within [min(0, prior_min), max(1, prior_max)]).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .knn_graph import SymmetricWeights
from .ops.propagation import propagate


class LabelPropagation:
    def __init__(
        self,
        weights: SymmetricWeights,
        *,
        reg_lambda: float,
        max_iter: int = 300,
        epsilon: float = 1e-5,
        verbose: int = 0,
        mesh=None,
        dispatch_iters: int | None = 100,
        windowed_layout=None,
    ):
        assert reg_lambda >= 0
        self.weights = weights
        self.n = weights.nvecs
        self.reg_lambda = reg_lambda
        self.max_iter = max_iter
        self.epsilon = epsilon
        # bounded iterations per device dispatch (bit-identical to a single
        # dispatch; see ops.propagation.propagate) — a 300-iter while_loop
        # over 1M+ tiles is an ~84s device program that trips watchdogs
        self.dispatch_iters = dispatch_iters
        # opt-in serving-scale formulation: ops.pallas_spmv.WindowedSpmv
        # built from this graph (build_windowed_layout_auto: measured layout
        # selection + internal RCM relabel) replaces the XLA scalar gather
        # with the lane-shuffle kernel — 287 -> 4.5 ms/iter on a real 1M
        # x 32 kNN graph; numerics differ from the default path only in f32
        # summation order
        self.windowed_layout = windowed_layout
        self.verbose = verbose
        # metadata of the most recent single-device propagation
        # (ops.propagation.PropagationResult with device scalars; fetching
        # n_iter/converged forces a sync) — None before the first run and
        # for mesh-sharded runs
        self.last_result = None
        # with a multi-device mesh the Jacobi loop runs row-sharded
        # (parallel.sharded_graph), numerically identical to single-device
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) else None

    # device uploads are LAZY and come from the weight structure's own cache
    # (knn_graph.SymmetricWeights.device_arrays): weights are shared across
    # sessions, so concurrent rankers reuse one device copy — and the
    # windowed path never touches nbr/w at all (only degree), so a windowed
    # serving session skips the ~256MB (N,K) upload entirely.
    @property
    def _deg(self):
        return self._weight_field("degree")

    @property
    def _nbr(self):
        return self._weight_field("nbr")

    @property
    def _w(self):
        return self._weight_field("w")

    def _weight_field(self, name: str):
        get = getattr(self.weights, "_device_field", None)
        if get is not None:
            return get(name)
        cache = getattr(self, "_dev_cache", None)
        if cache is None:
            cache = self._dev_cache = {}
        if name not in cache:
            cache[name] = jnp.asarray(getattr(self.weights, name))
        return cache[name]

    def fit_transform_device(
        self,
        *,
        labels: "jnp.ndarray",  # (N,) f32, meaningful where labeled
        is_labeled: "jnp.ndarray",  # (N,) bool
        reg_values: "jnp.ndarray",  # (N,) f32 prior
        start: "jnp.ndarray",  # (N,) f32 warm start
    ) -> "jnp.ndarray":
        """`fit_transform` with ALL state already device-resident: no host
        array assembly, no (N,) uploads, device scores out. The serving path
        (loops/knn_methods device mode) keeps labels/is_labeled persistent on
        device and scatter-updates the few clicked entries per feedback
        round, so a round's propagation ships only delta ordinals — the
        reference's scipy loop re-reads full host arrays every round
        (`label_propagation.py:44-66`). Bounds sanitation is the caller's
        job (loops/knn_methods.py current_scores applies it on first host
        materialization). Not supported for mesh-sharded propagation (that
        path assembles host shards)."""
        assert self.mesh is None, "device-state propagation is single-device"
        if self.windowed_layout is not None:
            from .ops.propagation import propagate_windowed

            res = propagate_windowed(
                self.windowed_layout, self._deg, reg_values, labels,
                is_labeled, start,
                reg_lambda=float(self.reg_lambda),
                max_iter=self.max_iter, epsilon=self.epsilon,
                dispatch_iters=self.dispatch_iters,
            )
        else:
            res = propagate(
                self._nbr, self._w, self._deg, reg_values, labels,
                is_labeled, start,
                reg_lambda=float(self.reg_lambda),
                max_iter=self.max_iter, epsilon=self.epsilon,
                dispatch_iters=self.dispatch_iters,
            )
        # observability: keep the (device-scalar) result metadata without
        # forcing a sync — consumers (bench, verbose paths) fetch lazily
        self.last_result = res
        if self.verbose and not bool(res.converged):
            print(
                f"warning: propagation did not converge after "
                f"{int(res.n_iter)} iters"
            )
        return res.scores

    def fit_transform(
        self,
        *,
        label_ids: np.ndarray,
        label_values: np.ndarray,
        reg_values: Optional[np.ndarray] = None,
        start_value: Optional[np.ndarray] = None,
        device_out: bool = False,
    ) -> np.ndarray:
        """device_out=True returns the (N,) scores as a DEVICE array with no
        host download: at serving scale (1M+ tiles) the scores feed straight
        into `rank_by_scores`' device ranking tail, so a feedback round never
        round-trips N floats through the host (the reference's scipy loop is
        host-resident by construction, `label_propagation.py:30-79`). The
        prior-bound sanitizer runs only on the host path; the ranker
        (loops/knn_methods.py current_scores) re-applies it when a host
        consumer materializes a device-resident result."""
        if reg_values is None:
            assert self.reg_lambda == 0
            reg_values = np.zeros(self.n, dtype=np.float32)
        reg_values = np.asarray(reg_values, dtype=np.float32)
        assert reg_values.shape[0] == self.n

        labels = np.zeros(self.n, dtype=np.float32)
        is_labeled = np.zeros(self.n, dtype=bool)
        ids = np.asarray(label_ids).reshape(-1).astype(np.int64)
        labels[ids] = np.asarray(label_values, dtype=np.float32).reshape(-1)
        is_labeled[ids] = True

        if start_value is not None:
            start = np.asarray(start_value, dtype=np.float32)
        else:
            start = reg_values.copy()

        res = None
        if self.windowed_layout is not None and self.mesh is None:
            from .ops.propagation import propagate_windowed

            res = propagate_windowed(
                self.windowed_layout, self._deg,
                jnp.asarray(reg_values), jnp.asarray(labels),
                jnp.asarray(is_labeled), jnp.asarray(start),
                reg_lambda=float(self.reg_lambda),
                max_iter=self.max_iter, epsilon=self.epsilon,
                dispatch_iters=self.dispatch_iters,
            )
            if device_out:
                self.last_result = res
                return res.scores
            out = np.asarray(res.scores)
        elif self.mesh is not None:
            if self.windowed_layout is not None:
                from .parallel.sharded_graph import (
                    sharded_propagate_windowed,
                )

                out = sharded_propagate_windowed(
                    self.windowed_layout, self.weights.degree,
                    reg_values, labels, is_labeled, start, self.mesh,
                    reg_lambda=float(self.reg_lambda),
                    max_iter=self.max_iter, epsilon=self.epsilon,
                )
            else:
                from .parallel.sharded_graph import sharded_propagate

                out = sharded_propagate(
                    self.weights.nbr, self.weights.w, self.weights.degree,
                    reg_values, labels, is_labeled, start, self.mesh,
                    reg_lambda=float(self.reg_lambda),
                    max_iter=self.max_iter, epsilon=self.epsilon,
                )
        else:
            res = propagate(
                self._nbr, self._w, self._deg,
                jnp.asarray(reg_values), jnp.asarray(labels), jnp.asarray(is_labeled),
                jnp.asarray(start),
                reg_lambda=float(self.reg_lambda),
                max_iter=self.max_iter,
                epsilon=self.epsilon,
                dispatch_iters=self.dispatch_iters,
            )
            if device_out:
                self.last_result = res
                return res.scores
            out = np.asarray(res.scores)
        if res is not None:
            self.last_result = res
        lo = min(0.0, float(reg_values.min(initial=0.0)))
        hi = max(1.0, float(reg_values.max(initial=1.0)))
        assert (out >= lo - 1e-5).all(), "scores must stay within prior bounds"
        assert (out <= hi + 1e-5).all(), "scores must stay within prior bounds"
        if self.verbose and res is not None and not bool(res.converged):
            print(f"warning: propagation did not converge after {int(res.n_iter)} iters")
        return out
