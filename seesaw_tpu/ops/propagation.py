"""Label propagation as a jitted Jacobi iteration over padded adjacency.

Replaces the reference's scipy CSR SpMV loop (`/root/reference/seesaw/
label_propagation.py:30-79`, up to 300 iterations over all N vectors per
feedback round — SURVEY.md 'TPU kernel target #3'). With the fixed-degree
padded graph (knn_graph.SymmetricWeights), one step is a gather + weighted
row-sum on the VPU; the whole convergence loop runs on device inside a
single lax.while_loop, with the same update rule, clamping and convergence
test as the reference:

    f <- (W f + lambda * prior) / (degree + lambda);  f[labeled] = label
    stop when max (f_new - f_old)^2 < epsilon or max_iter reached.

On convergence the PRE-step iterate is returned, exactly like the reference
(`label_propagation.py:66-79` breaks out of the loop before `old_fvalues =
new_fvalues`); only a non-converged run returns the last computed iterate.
The full-session differential (test_ref_session_differential.py) is
sensitive to this one-step difference (~sqrt(epsilon) in score units).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PropagationResult(NamedTuple):
    scores: jnp.ndarray
    n_iter: jnp.ndarray
    converged: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _propagate_segment(
    nbr, w, degree, prior, labels, is_labeled,
    f0, f_prev0, i0, done0, stop_at,
    *,
    reg_lambda: float,
    max_iter: int,
    epsilon: float,
):
    """Run the Jacobi while_loop from a carried state until convergence,
    `stop_at` iterations, or max_iter — the resumable core shared by the
    single-dispatch and chunked entries."""
    idx = jnp.clip(nbr, 0, None)
    valid = nbr >= 0
    denom = degree + reg_lambda
    denom = jnp.where(denom > 0, denom, 1.0)

    def step(f):
        gathered = jnp.where(valid, f[idx], 0.0)
        wf = (w * gathered).sum(axis=1)
        new_f = (wf + reg_lambda * prior) / denom
        return jnp.where(is_labeled, labels, new_f)

    def cond(state):
        f, f_prev, i, done = state
        return (~done) & (i < max_iter) & (i < stop_at)

    def body(state):
        f, _, i, _ = state
        new_f = step(f)
        done = jnp.max((new_f - f) ** 2) < epsilon
        return (new_f, f, i + 1, done)

    f, f_prev, i, done = jax.lax.while_loop(
        cond, body, (f0, f_prev0, i0, done0)
    )
    # the converged-result select happens INSIDE the dispatch (the reference
    # returns the pre-step iterate on convergence); a host-side jnp.where
    # would cost one extra dispatch round-trip per serving round
    return f, f_prev, i, done, jnp.where(done, f_prev, f)


def propagate(
    nbr: jnp.ndarray,  # (N, Kp) int32, -1 padding
    w: jnp.ndarray,  # (N, Kp) float32
    degree: jnp.ndarray,  # (N,)
    prior: jnp.ndarray,  # (N,) regularization targets
    labels: jnp.ndarray,  # (N,) label values (meaningful where labeled)
    is_labeled: jnp.ndarray,  # (N,) bool
    start: jnp.ndarray,  # (N,) initial scores
    *,
    reg_lambda: float,
    max_iter: int = 300,
    epsilon: float = 1e-5,
    dispatch_iters: int | None = None,
) -> PropagationResult:
    """Jacobi propagation, optionally CHUNKED into bounded device dispatches.

    `dispatch_iters` caps the iterations per dispatch; the host loop resumes
    from the carried state, so results are bit-identical to one dispatch.
    Needed at serving scale: a 1M-tile 300-iteration while_loop is a single
    ~84s device program, which trips execution watchdogs (the axon worker
    kills it; any runtime may). ~N/dispatch_iters extra dispatch round-trips
    are noise next to the iteration cost."""
    f0 = jnp.where(is_labeled, labels, start)
    state = (f0, f0 + 1.0, jnp.asarray(0), jnp.asarray(False))
    c = max_iter if not dispatch_iters else min(dispatch_iters, max_iter)
    start_i = 0
    while True:
        f, f_prev, i, done, sel = _propagate_segment(
            nbr, w, degree, prior, labels, is_labeled,
            *state, jnp.asarray(start_i + c),
            reg_lambda=reg_lambda, max_iter=max_iter, epsilon=epsilon,
        )
        state = (f, f_prev, i, done)
        # ONE host fetch per segment (i and done travel together)
        i_h, done_h = jax.device_get((i, done))
        start_i = int(i_h)
        if bool(done_h) or start_i >= max_iter:
            break
    # converged -> the reference returns the value from BEFORE the last step
    # (`sel` was chosen inside the final segment's dispatch)
    return PropagationResult(scores=sel, n_iter=i, converged=done)


@functools.partial(
    jax.jit,
    static_argnames=("max_iter", "n", "B", "W", "cap", "interpret"),
)
def _propagate_segment_windowed(
    cidx, wslab, ovf_src, ovf_nbr, ovf_w, routed,
    degree, prior, labels, is_labeled,
    f0, f_prev0, i0, done0, stop_at,
    *,
    reg_lambda: float,
    max_iter: int,
    epsilon: float,
    n: int,
    B: int,
    W: int,
    cap: int,
    interpret: bool,
):
    from .pallas_spmv import windowed_spmv

    denom = degree + reg_lambda
    denom = jnp.where(denom > 0, denom, 1.0)

    def step(f):
        wf = windowed_spmv(
            f, cidx, wslab, ovf_src, ovf_nbr, ovf_w, routed,
            n=n, B=B, W=W, cap=cap, interpret=interpret,
        )
        new_f = (wf + reg_lambda * prior) / denom
        return jnp.where(is_labeled, labels, new_f)

    def cond(state):
        f, f_prev, i, done = state
        return (~done) & (i < max_iter) & (i < stop_at)

    def body(state):
        f, _, i, _ = state
        new_f = step(f)
        done = jnp.max((new_f - f) ** 2) < epsilon
        return (new_f, f, i + 1, done)

    f, f_prev, i, done = jax.lax.while_loop(
        cond, body, (f0, f_prev0, i0, done0)
    )
    return f, f_prev, i, done, jnp.where(done, f_prev, f)


def propagate_windowed(
    layout,  # ops.pallas_spmv.WindowedSpmv (or arrays already on device)
    degree: jnp.ndarray,
    prior: jnp.ndarray,
    labels: jnp.ndarray,
    is_labeled: jnp.ndarray,
    start: jnp.ndarray,
    *,
    reg_lambda: float,
    max_iter: int = 300,
    epsilon: float = 1e-5,
    dispatch_iters: int | None = 50,
    interpret: bool | None = None,
) -> PropagationResult:
    """`propagate` with the windowed-SpMV Pallas step (ops.pallas_spmv):
    287 -> 28.5 ms/iter at 1M x K=32 on chip for window-local graphs
    (`layout.coverage` reports the fraction the kernel serves; layouts from
    `build_windowed_layout_auto` bake in an RCM relabeling when the input
    order lacks locality). Numerics match the XLA step up to f32 summation
    order — use the default path where bit-parity with the reference
    matters."""
    if interpret is None:
        # Mosaic only compiles for real TPU backends; CPU (tests / virtual
        # meshes) runs the kernel in interpret mode
        interpret = jax.default_backend() == "cpu"
    # uploaded once per layout and cached — per-call uploads of the ~0.5GB
    # slabs would dominate every serving round through a slow link
    cidx, wslab, *ovf = layout.device_arrays()
    routed = (layout.routed_arrays()
              if hasattr(layout, "routed_arrays") else None)
    f0 = jnp.where(is_labeled, labels, start)
    # layouts with a baked-in relabeling (order[new] = old): run the whole
    # Jacobi loop in the relabeled space — ONE fused permute dispatch in,
    # one gather out; summation order changes, which the windowed contract
    # already allows
    reorder = layout.order_arrays() if getattr(layout, "order", None) is not None else None
    if reorder is not None:
        order_d, inv_d = reorder
        degree, prior, labels, is_labeled, f0 = _permute_inputs(
            order_d, degree, prior, labels, is_labeled, f0
        )
    state = (f0, f0 + 1.0, jnp.asarray(0), jnp.asarray(False))
    c = max_iter if not dispatch_iters else min(dispatch_iters, max_iter)
    start_i = 0
    while True:
        f, f_prev, i, done, sel = _propagate_segment_windowed(
            cidx, wslab, *ovf, routed, degree, prior, labels, is_labeled,
            *state, jnp.asarray(start_i + c),
            reg_lambda=reg_lambda, max_iter=max_iter, epsilon=epsilon,
            n=layout.n, B=layout.B, W=layout.W, cap=layout.cap,
            interpret=interpret,
        )
        state = (f, f_prev, i, done)
        i_h, done_h = jax.device_get((i, done))
        start_i = int(i_h)
        if bool(done_h) or start_i >= max_iter:
            break
    if reorder is not None:
        sel = _gather(sel, inv_d)  # back to original vertex ids
    return PropagationResult(scores=sel, n_iter=i, converged=done)


@jax.jit
def _permute_inputs(order, degree, prior, labels, is_labeled, f0):
    return (degree[order], prior[order], labels[order], is_labeled[order],
            f0[order])


@jax.jit
def _gather(x, idx):
    return x[idx]


class DeferredPropagation:
    """Round-deferred label propagation for the graph loop's serving path.

    `LabelPropagationRanker2.update` stages the round's clicks instead of
    propagating eagerly; `current_scores_any()` then hands this marker to
    `MultiscaleIndex.rank_by_scores`, which fuses click-scatter -> windowed
    Jacobi propagation -> ranking tail into ONE device program
    (`propagate_rank_windowed`) — the same one-dispatch feedback-round shape
    Rocchio/LogReg2/MultiReg already get from the DeferredVector family
    (ops/frame_scoring.py). The reference runs these as separate host steps
    (`loops/graph_based.py:102-121` then `multiscale_index.py` ranking).
    Consumers that cannot fuse (host `top_k`, sharded/host-built indexes)
    call `materialize()`, which runs the eager device path unchanged."""

    def __init__(self, ranker):
        self.ranker = ranker

    @property
    def shape(self):  # quacks like the (N,) score array for shape checks
        return (self.ranker.nvecs,)

    def materialize(self):
        return self.ranker._flush_propagation()


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iter", "n", "B", "W", "cap", "interpret", "has_order",
        "shortlist_size", "topk", "aug_larger", "aug_weight", "agg_method",
        "max_zoom",
    ),
)
def propagate_rank_windowed(
    cidx, wslab, ovf_src, ovf_nbr, ovf_w,  # windowed layout device arrays
    routed,  # RoutedOverflow.device_arrays() 6-tuple or None
    order, inv,  # (N,) int32 baked-in relabeling, or (0,) when has_order=False
    degree, prior, labels0, is_labeled0,  # (N,) persistent ranker state
    new_ids, new_vals,  # padded click scatter (id >= N drops)
    start,  # (N,) warm start (the prior, matching the eager path)
    valid, boxes, zoom,  # ranking-tail index arrays
    excluded, new_excluded_ids,  # incremental exclusion protocol
    reg_lambda, epsilon, stop_at,
    *,
    max_iter: int,
    n: int,
    B: int,
    W: int,
    cap: int,
    interpret: bool,
    has_order: bool,
    shortlist_size: int,
    topk: int,
    aug_larger: str,
    aug_weight: str,
    agg_method: str,
    max_zoom: int,
):
    """ONE-dispatch KnnProp2 feedback round: scatter the round's clicks into
    the persistent label state, run the windowed-SpMV Jacobi loop to
    convergence, and feed the propagated scores straight into the shared
    shortlist/augment/top-k tail — no intermediate host round-trips. The
    Jacobi loop is bounded by the runtime scalar `stop_at` (the caller's
    dispatch budget — lp.dispatch_iters — NOT the full max_iter bound: at
    10M tiles a windowed step is ~116 ms, so 300 iterations in one program
    would be a ~35 s dispatch, the long-program class execution watchdogs
    kill). When the loop stops un-converged the returned ranking is over the
    partial iterate and the caller MUST resume propagation segment-by-
    segment and re-rank (`MultiscaleIndex._rank_deferred_propagation` does;
    the common case — convergence within one budget — stays one dispatch).
    Returns (QueryResult, new exclusion mask, scores, labels, is_labeled,
    n_iter, converged); the caller commits the updated persistent state
    after the fetch."""
    from .frame_scoring import _rank_frames, apply_new_exclusions

    labels = labels0.at[new_ids].set(new_vals, mode="drop")
    is_labeled = is_labeled0.at[new_ids].set(True, mode="drop")
    f0 = jnp.where(is_labeled, labels, start)
    deg_p, prior_p, lab_p, il_p, f0_p = degree, prior, labels, is_labeled, f0
    if has_order:
        deg_p, prior_p, lab_p, il_p, f0_p = (
            degree[order], prior[order], labels[order], is_labeled[order],
            f0[order],
        )
    f, f_prev, i, done, sel = _propagate_segment_windowed(
        cidx, wslab, ovf_src, ovf_nbr, ovf_w, routed,
        deg_p, prior_p, lab_p, il_p,
        f0_p, f0_p + 1.0, jnp.asarray(0), jnp.asarray(False),
        stop_at,
        reg_lambda=reg_lambda, max_iter=max_iter, epsilon=epsilon,
        n=n, B=B, W=W, cap=cap, interpret=interpret,
    )
    scores = sel[inv] if has_order else sel
    s_pad = jnp.where(valid.reshape(-1), scores, -jnp.inf)
    excluded = apply_new_exclusions(excluded, new_excluded_ids)
    res = _rank_frames(
        s_pad, valid, boxes, zoom, excluded,
        shortlist_size=shortlist_size, topk=topk, aug_larger=aug_larger,
        aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
    )
    return res, excluded, scores, labels, is_labeled, i, done
