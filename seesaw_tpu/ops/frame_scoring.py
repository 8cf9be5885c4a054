"""Fused query program: score, distinct-frame top-k, frame augmentation.

This is the device-side heart of the search loop. The reference implements it
as a numpy matvec + full argsort + a pandas per-frame box-join/groupby rescore
(`/root/reference/seesaw/indices/multiscale/multiscale_index.py:112-150,
291-403`). Here the whole per-click query is one jit-compiled XLA program:

    scores   = V @ q  (- V @ q2)                       # MXU matvec (bf16)
    fmax     = reshape(F, T) masked max                # distinct-image top-k
    shortist = top-k of masked fmax                    # exclusion mask
    adjusted = frame augmentation across zoom levels   # vmapped (B, T)
    result   = top-k frames by adjusted score + top-tile activations

Layout: the index stores vectors FRAME-MAJOR PADDED — every image's tiles
occupy a fixed-size block of `tile_bound` rows (invalid rows masked). That
makes "distinct top-k images by best tile" a free reshape + row-max: the
whole shortlist stage runs at HBM bandwidth. (The earlier segment-max and
gather formulations cost 90ms / 78ms respectively at 10M rows on v5e; the
reshape formulation is ~6ms. Padding trades HBM capacity for that: the pad
ratio is bounded by the pyramid config and measured at index build.)

Frame augmentation reproduces the reference's `score_frame2` semantics
(box join on IoU>0, per-zoom-level IoU-argmax then mean, or containment-
softmax weighting) as dense masked ops over a (T, T) tile-pair matrix.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -jnp.inf


def pairwise_iou_cont(boxes: jnp.ndarray):
    """(T,4) boxes -> (T,T) iou and containment (of row-box in col-box)."""
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
    cont = jnp.where(
        area[:, None] > 0, inter / jnp.where(area[:, None] > 0, area[:, None], 1.0), 0.0
    )
    return iou, cont


@functools.partial(jax.jit, static_argnames=("aug_larger", "aug_weight", "agg_method", "max_zoom"))
def augment_tile_scores(
    boxes: jnp.ndarray,  # (T,4)
    zoom: jnp.ndarray,  # (T,) int32
    scores: jnp.ndarray,  # (T,)
    valid: jnp.ndarray,  # (T,) bool
    *,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
) -> jnp.ndarray:
    """Per-tile augmented scores for one frame (reference `score_frame2`).

    For each tile i, joins all tiles j in the same frame with IoU(i,j) > 0,
    filtered by `aug_larger` ('greater': zoom_j >= zoom_i, 'adjacent':
    zoom_j == zoom_i, 'all'). Then:
      - aug_weight='level_max':   per zoom level take the joined tile with
        max IoU; the augmented score is the mean of those tiles' scores over
        levels that joined anything (ties -> lowest tile index, matching the
        pandas idxmax-first convention).
      - aug_weight='cont_weighted': softmax over containment of i in j,
        weighted sum of joined scores.
    agg_method='plain_score' bypasses augmentation entirely; every OTHER
    agg_method value (incl. 'avg_vector') runs the aug_weight augmentation —
    exactly the reference's live path (`score_frame2`,
    `multiscale_index.py:112-150`, branches only on plain_score; the
    avg_vector distinction existed only in the legacy `augment_score2`).
    Invalid (padding) tiles produce NEG_INF.
    """
    if agg_method == "plain_score":
        return jnp.where(valid, scores, NEG_INF)

    iou, cont = pairwise_iou_cont(boxes)
    pair_valid = valid[:, None] & valid[None, :]
    join = (iou > 0.0) & pair_valid
    if aug_larger == "greater":
        join = join & (zoom[None, :] >= zoom[:, None])
    elif aug_larger == "adjacent":
        join = join & (zoom[None, :] == zoom[:, None])
    elif aug_larger != "all":
        raise ValueError(f"unknown aug_larger {aug_larger!r}")

    if aug_weight == "level_max":
        level_sum = jnp.zeros_like(scores)
        level_cnt = jnp.zeros_like(scores)
        for lvl in range(1, max_zoom + 1):
            join_l = join & (zoom[None, :] == lvl)
            any_l = join_l.any(axis=1)
            masked_iou = jnp.where(join_l, iou, NEG_INF)
            best_j = jnp.argmax(masked_iou, axis=1)  # first max, like idxmax
            level_sum = level_sum + jnp.where(any_l, scores[best_j], 0.0)
            level_cnt = level_cnt + any_l.astype(scores.dtype)
        adjusted = level_sum / jnp.maximum(level_cnt, 1.0)
        adjusted = jnp.where(level_cnt > 0, adjusted, NEG_INF)
    elif aug_weight == "cont_weighted":
        logits = jnp.where(join, cont, NEG_INF)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.where(join, jnp.exp(logits - jnp.where(jnp.isfinite(m), m, 0.0)), 0.0)
        denom = e.sum(axis=1, keepdims=True)
        w = e / jnp.where(denom > 0, denom, 1.0)
        adjusted = (w * jnp.where(join, scores[None, :], 0.0)).sum(axis=1)
        adjusted = jnp.where(join.any(axis=1), adjusted, NEG_INF)
    else:
        raise ValueError(f"unknown aug_weight {aug_weight!r}")

    return jnp.where(valid, adjusted, NEG_INF)


class QueryResult(NamedTuple):
    """Top-k frames with activation data, all device arrays.

    frame_ids: (k,) int32 frame ordinals (-1 past the end of valid results)
    frame_scores: (k,) float32 augmented frame scores
    act_boxes: (k,4) float32 top-tile box per frame
    act_scores: (k,) float32 top-tile augmented score
    n_valid: () int32 number of usable rows
    """

    frame_ids: jnp.ndarray
    frame_scores: jnp.ndarray
    act_boxes: jnp.ndarray
    act_scores: jnp.ndarray
    n_valid: jnp.ndarray


def scoring_matvec(
    vectors: jnp.ndarray, qvec: jnp.ndarray, row_scale: jnp.ndarray | None = None
) -> jnp.ndarray:
    """V @ q with dtype-appropriate MXU paths.

    int8 vectors take the true int8xint8 MXU path (int32 accumulate): the
    query is quantized symmetrically per call and the result rescaled —
    HBM traffic quarters vs f32 and the MXU runs at double rate.
    `row_scale` (N,) carries per-row dequantization scales (each row was
    quantized by its own max, the standard near-free accuracy win); without
    it the caller owns a single global matrix scale (bakes it into qvec)."""
    if vectors.dtype == jnp.int8:
        qmax = jnp.max(jnp.abs(qvec)) + 1e-12
        q_i8 = jnp.clip(jnp.round(qvec / qmax * 127.0), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            vectors, q_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * (qmax / 127.0)
        return out * row_scale if row_scale is not None else out
    assert row_scale is None, (
        f"row_scale is only meaningful for int8 vectors (got {vectors.dtype}); "
        "passing it with a float matrix would be silently ignored"
    )
    # f32 accumulation (like scoring_matmat): bf16-rounding the scores here
    # would let a solo query and a coalesced batch of the same query rank
    # near-ties differently
    return jax.lax.dot_general(
        vectors, qvec.astype(vectors.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


class DeferredVector:
    """Marker base for query vectors resolved ON DEVICE inside the query
    dispatch itself (one-dispatch feedback rounds). Subclasses provide
    `materialize(index)` for indexes that cannot fuse."""


class DeferredLogistic(DeferredVector):
    """Deferred logistic-probe fit: the labeled-row gather + centering +
    LBFGS solve (`learners.logistic_regression._fit_ce_rows`) runs inside
    the SAME dispatch as the query over its coefficient — one device
    dispatch per LogReg2 feedback round. Built by
    `LogisticRegression.deferred_fit_rows`; the fitted (params, mu, loss)
    ride back in the query result ('fit') and are applied to the model via
    `apply_fit_result`."""

    __slots__ = (
        "prows", "valid", "y", "sw", "n_real", "pos_weight", "reg_weight",
        "anchor", "params0", "fit_intercept", "max_iter", "has_anchor",
        "center", "model",
    )

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw[k])

    def materialize(self, index) -> np.ndarray:
        # prows is the padded pow2 bucket (zeros past n_real) — the exact
        # labeled-row list is not recoverable here, so there is no host
        # fallback fit
        raise NotImplementedError(
            "DeferredLogistic is only built for fusable indexes "
            "(LogReg2.refine checks supports_deferred_query first)"
        )


class DeferredMultiReg(DeferredVector):
    """Deferred multi-regularized 'seesaw' fit: labeled-row gather +
    centering + the 4-term LBFGS objective (`learners.multi_reg._fit_reg`)
    + the query over the fitted coefficient, as ONE device dispatch
    (MultiscaleIndex._query_multireg). Built by `RegFit.deferred_fit_rows`."""

    __slots__ = (
        "prows", "valid", "y", "sw", "qvec_hat", "xlx",
        "rank_loss_margin", "pos_weight_value", "pos_weight_balanced",
        "label_loss_type",
        "reg_data_lambda", "reg_norm_lambda", "reg_query_lambda", "max_iter",
    )

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw[k])

    def materialize(self, index) -> np.ndarray:
        raise NotImplementedError(
            "DeferredMultiReg is only built for fusable indexes "
            "(MultiReg.refine checks supports_deferred_query first)"
        )


class DeferredRocchio(DeferredVector):
    """Deferred Rocchio query vector: q = alpha*q0 + beta*mean(pos rows) -
    gamma*mean(neg rows), resolved ON DEVICE inside the same dispatch as
    the query itself (MultiscaleIndex._query_rocchio) — a feedback round
    then costs ONE device dispatch instead of two (class-sum gather +
    query), which matters wherever dispatch latency is non-trivial
    (the reference pays a full scatter/gather round per refine,
    `rocchio_update.py:19-44`). Indexes that cannot fuse (sharded, host
    mirrors, other AccessMethods) materialize via `materialize(index)` —
    identical math through `sum_vectors_for_rows`."""

    __slots__ = ("q0", "pos_rows", "neg_rows", "alpha", "beta", "gamma")

    def __init__(self, q0, pos_rows, neg_rows, alpha, beta, gamma):
        self.q0 = np.asarray(q0, np.float32).reshape(-1)
        self.pos_rows = np.asarray(pos_rows, np.int64).reshape(-1)
        self.neg_rows = np.asarray(neg_rows, np.int64).reshape(-1)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.gamma = float(gamma)

    def materialize(self, index) -> np.ndarray:
        sums = index.sum_vectors_for_rows([self.pos_rows, self.neg_rows])
        mean_rel = sums[0] / max(self.pos_rows.shape[0], 1)
        mean_nrel = sums[1] / max(self.neg_rows.shape[0], 1)
        return (
            self.alpha * self.q0 + self.beta * mean_rel
            - self.gamma * mean_nrel
        ).astype(np.float32)


def scoring_matmat(
    vectors: jnp.ndarray, qvecs: jnp.ndarray, row_scale: jnp.ndarray | None = None
) -> jnp.ndarray:
    """(N, D) @ (D, Q) multi-query scores — the matrix HBM read amortized
    over Q concurrent sessions' queries. int8 matrices quantize each query
    with PER-QUERY symmetric scales, so column q equals the solo
    `scoring_matvec(vectors, qvecs[q])` result exactly."""
    if vectors.dtype == jnp.int8:
        qmax = jnp.max(jnp.abs(qvecs), axis=1, keepdims=True) + 1e-12  # (Q,1)
        q_i8 = jnp.clip(jnp.round(qvecs / qmax * 127.0), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            vectors, q_i8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (N, Q) int32
        out = acc.astype(jnp.float32) * (qmax[:, 0] / 127.0)[None, :]
        return out * row_scale[:, None] if row_scale is not None else out
    assert row_scale is None, (
        f"row_scale is only meaningful for int8 vectors (got {vectors.dtype})"
    )
    return jax.lax.dot_general(
        vectors, qvecs.astype(vectors.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _rank_frames(
    scores: jnp.ndarray,  # (F*T,) f32 per-tile scores (padded layout)
    valid: jnp.ndarray,
    boxes: jnp.ndarray,
    zoom: jnp.ndarray,
    excluded: jnp.ndarray,
    *,
    shortlist_size: int,
    topk: int,
    aug_larger: str,
    aug_weight: str,
    agg_method: str,
    max_zoom: int,
) -> QueryResult:
    """Shared ranking tail: shortlist by frame max, augment, final top-k."""
    F, T = valid.shape
    # -- stage 1: shortlist frames by best raw tile score ------------------
    s_ft = jnp.where(valid, scores.reshape(F, T), NEG_INF)
    fmax = jnp.max(s_ft, axis=1)
    fmax = jnp.where(excluded, NEG_INF, fmax)
    short_scores, short_fids = jax.lax.top_k(fmax, shortlist_size)
    short_valid = short_scores > NEG_INF

    # -- stage 2: gather shortlisted frames' tiles (fixed-size blocks) -----
    rows = short_fids[:, None] * T + jnp.arange(T, dtype=jnp.int32)[None, :]
    tile_valid = valid[short_fids] & short_valid[:, None]
    t_scores = jnp.where(tile_valid, s_ft[short_fids], NEG_INF)

    return _augment_and_topk(
        t_scores, boxes[rows], zoom[rows], tile_valid,
        short_fids, short_valid,
        topk=topk, shortlist_size=shortlist_size,
        aug_larger=aug_larger, aug_weight=aug_weight,
        agg_method=agg_method, max_zoom=max_zoom,
    )


def _augment_and_topk(
    t_scores, t_boxes, t_zoom, tile_valid, short_fids, short_valid,
    *, topk, shortlist_size, aug_larger, aug_weight, agg_method, max_zoom,
) -> QueryResult:
    """Shortlist -> QueryResult tail shared by every query formulation
    (full-scan `_rank_frames`, Pallas/batch `rank_from_frame_max`): frame
    augmentation (vmapped), per-frame top tile, final top-k."""
    aug = jax.vmap(
        lambda b, z, s, v: augment_tile_scores(
            b, z, s, v,
            aug_larger=aug_larger, aug_weight=aug_weight,
            agg_method=agg_method, max_zoom=max_zoom,
        )
    )(t_boxes, t_zoom, t_scores, tile_valid)  # (B, T)

    frame_score = jnp.max(aug, axis=1)
    top_tile = jnp.argmax(aug, axis=1)  # first max — pandas head(1) convention
    bidx = jnp.arange(aug.shape[0])
    act_box = t_boxes[bidx, top_tile]
    act_score = aug[bidx, top_tile]

    frame_score = jnp.where(short_valid, frame_score, NEG_INF)
    final_scores, final_pos = jax.lax.top_k(frame_score, min(topk, shortlist_size))
    n_valid = (final_scores > NEG_INF).sum()

    return QueryResult(
        frame_ids=jnp.where(final_scores > NEG_INF, short_fids[final_pos], -1),
        frame_scores=final_scores,
        act_boxes=act_box[final_pos],
        act_scores=act_score[final_pos],
        n_valid=n_valid,
    )


def apply_new_exclusions(excluded: jnp.ndarray, new_ids: jnp.ndarray) -> jnp.ndarray:
    """Merge newly-excluded frame ordinals (padded with -1) into the (F,)
    device mask — the device-persistent exclusion update (SURVEY §7 hard
    part: the reference rebuilds + re-uploads the whole mask per click,
    `multiscale_index.py:314-352` exclude translation; here the mask lives
    on device and the per-click delta is a handful of ints)."""
    F = excluded.shape[0]
    slot = jnp.where(new_ids >= 0, new_ids, F)  # -1 padding -> scratch slot
    upd = jnp.zeros(F + 1, dtype=bool).at[slot].set(True)[:F]
    return excluded | upd


_RANK_STATICS = ("shortlist_size", "topk", "aug_larger", "aug_weight", "agg_method", "max_zoom")


@functools.partial(jax.jit, static_argnames=_RANK_STATICS)
def query_program(
    vectors: jnp.ndarray,  # (F*T, D) frame-major padded
    valid: jnp.ndarray,  # (F, T) bool
    boxes: jnp.ndarray,  # (F*T, 4) float32
    zoom: jnp.ndarray,  # (F*T,) int32
    qvec: jnp.ndarray,  # (D,)
    qvec2: jnp.ndarray | None,  # (D,) or None — subtracted (discount) score
    excluded: jnp.ndarray,  # (F,) bool — frames to skip
    row_scale: jnp.ndarray | None = None,  # (F*T,) int8 per-row dequant scales
    *,
    shortlist_size: int,
    topk: int,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
) -> QueryResult:
    """The full per-click query as one XLA program. See module docstring."""
    scores = scoring_matvec(vectors, qvec, row_scale)
    if qvec2 is not None:
        scores = scores - scoring_matvec(vectors, qvec2, row_scale)
    return _rank_frames(
        scores, valid, boxes, zoom, excluded,
        shortlist_size=shortlist_size, topk=topk, aug_larger=aug_larger,
        aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
    )


@functools.partial(jax.jit, static_argnames=_RANK_STATICS)
def query_program_incr(
    vectors: jnp.ndarray,
    valid: jnp.ndarray,
    boxes: jnp.ndarray,
    zoom: jnp.ndarray,
    qvec: jnp.ndarray,
    qvec2: jnp.ndarray | None,
    excluded: jnp.ndarray,  # (F,) bool device-persistent mask
    new_excluded_ids: jnp.ndarray,  # (M,) int32 frame ordinals, -1 padded
    row_scale: jnp.ndarray | None = None,
    *,
    shortlist_size: int,
    topk: int,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
) -> tuple[QueryResult, jnp.ndarray]:
    """query_program with the incremental exclusion update fused into the
    same dispatch; returns (result, updated mask) — the mask round-trips
    device-to-device across clicks."""
    excluded = apply_new_exclusions(excluded, new_excluded_ids)
    scores = scoring_matvec(vectors, qvec, row_scale)
    if qvec2 is not None:
        scores = scores - scoring_matvec(vectors, qvec2, row_scale)
    res = _rank_frames(
        scores, valid, boxes, zoom, excluded,
        shortlist_size=shortlist_size, topk=topk, aug_larger=aug_larger,
        aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
    )
    return res, excluded


@functools.partial(jax.jit, static_argnames=_RANK_STATICS)
def rank_frames_from_scores(
    scores: jnp.ndarray,  # (F*T,) f32 — e.g. propagated label scores
    valid: jnp.ndarray,
    boxes: jnp.ndarray,
    zoom: jnp.ndarray,
    excluded: jnp.ndarray,
    *,
    shortlist_size: int,
    topk: int,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
) -> QueryResult:
    """Ranking tail over externally produced per-tile scores (graph loops)."""
    return _rank_frames(
        scores, valid, boxes, zoom, excluded,
        shortlist_size=shortlist_size, topk=topk, aug_larger=aug_larger,
        aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
    )


@functools.partial(jax.jit, static_argnames=_RANK_STATICS)
def rank_frames_from_scores_incr(
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    boxes: jnp.ndarray,
    zoom: jnp.ndarray,
    excluded: jnp.ndarray,
    new_excluded_ids: jnp.ndarray,  # (M,) int32 frame ordinals, -1 padded
    *,
    shortlist_size: int,
    topk: int,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
) -> tuple[QueryResult, jnp.ndarray]:
    """rank_frames_from_scores with the fused incremental exclusion update."""
    excluded = apply_new_exclusions(excluded, new_excluded_ids)
    res = _rank_frames(
        scores, valid, boxes, zoom, excluded,
        shortlist_size=shortlist_size, topk=topk, aug_larger=aug_larger,
        aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
    )
    return res, excluded


@functools.partial(jax.jit, static_argnames=_RANK_STATICS)
def query_program_batch(
    vectors: jnp.ndarray,  # (F*T, D) frame-major padded
    valid: jnp.ndarray,  # (F, T) bool
    boxes: jnp.ndarray,  # (F*T, 4)
    zoom: jnp.ndarray,  # (F*T,)
    qvecs: jnp.ndarray,  # (Q, D) — one query per concurrent session
    excluded: jnp.ndarray,  # (Q, F) bool — per-session exclusion masks
    row_scale: jnp.ndarray | None = None,
    *,
    shortlist_size: int,
    topk: int,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
) -> QueryResult:
    """MULTI-QUERY serving: Q concurrent sessions' re-ranks in ONE dispatch.

    The scan becomes a true (N, D) @ (D, Q) MXU matmul — the HBM read of the
    matrix is amortized over all Q queries, so Q sessions cost barely more
    than one (the reference served concurrency with an actor per session,
    `web/session_manager.py:46-54`; here sessions share the device scan).
    The per-query ranking tail (shortlist/augment/top-k over tiny arrays) is
    vmapped. Returns a QueryResult with a leading Q axis on every field.
    """
    scores_nq = scoring_matmat(vectors, qvecs, row_scale)

    def tail(scores, excl):
        return _rank_frames(
            scores, valid, boxes, zoom, excl,
            shortlist_size=shortlist_size, topk=topk, aug_larger=aug_larger,
            aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
        )

    return jax.vmap(tail, in_axes=(1, 0))(scores_nq, excluded)


@functools.partial(
    jax.jit, static_argnames=_RANK_STATICS + ("tile_bound",)
)
def rank_from_frame_max(
    vectors: jnp.ndarray,  # (Fp*T, D) frame-major padded
    valid: jnp.ndarray,  # (F, T)
    boxes: jnp.ndarray,  # (F*T, 4)
    zoom: jnp.ndarray,  # (F*T,)
    qvec: jnp.ndarray,  # (D,)
    fmax: jnp.ndarray,  # (F,) per-frame max raw score, -inf = excluded
    row_scale: jnp.ndarray | None = None,  # (Fp*T,) int8 per-row scales
    frame_scale: jnp.ndarray | None = None,  # (F,) int8 per-frame scales
    *,
    shortlist_size: int,
    topk: int,
    tile_bound: int,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
) -> QueryResult:
    """Shortlist tail shared by the Pallas fused query and the int8 batch
    path: top-`shortlist_size` frames by `fmax`, recompute their B*T tile
    scores exactly, augment, final top-k. The (N,) score vector is never
    materialized — only shortlisted rows are rescored."""
    T = tile_bound
    short_scores, short_fids = jax.lax.top_k(fmax, shortlist_size)
    short_valid = short_scores > NEG_INF

    rows = short_fids[:, None] * T + jnp.arange(T, dtype=jnp.int32)[None, :]
    tile_valid = valid[short_fids] & short_valid[:, None]
    t_vecs = vectors[rows.reshape(-1)]  # (B*T, D)
    if frame_scale is not None:
        t_scale = jnp.repeat(frame_scale[short_fids], T)
    elif row_scale is not None:
        t_scale = row_scale[rows.reshape(-1)]
    else:
        t_scale = None
    t_scores = scoring_matvec(t_vecs, qvec, t_scale).reshape(shortlist_size, T)
    t_scores = jnp.where(tile_valid, t_scores, NEG_INF)

    return _augment_and_topk(
        t_scores, boxes[rows], zoom[rows], tile_valid,
        short_fids, short_valid,
        topk=topk, shortlist_size=shortlist_size,
        aug_larger=aug_larger, aug_weight=aug_weight,
        agg_method=agg_method, max_zoom=max_zoom,
    )


@functools.partial(jax.jit, static_argnames=_RANK_STATICS)
def query_program_batch_framescale(
    vectors: jnp.ndarray,  # (F*T, D) int8 frame-major padded
    valid: jnp.ndarray,  # (F, T) bool
    boxes: jnp.ndarray,  # (F*T, 4)
    zoom: jnp.ndarray,  # (F*T,)
    qvecs: jnp.ndarray,  # (Q, D)
    excluded: jnp.ndarray,  # (Q, F) bool
    frame_scale: jnp.ndarray,  # (F,) per-FRAME dequant scales
    *,
    shortlist_size: int,
    topk: int,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
) -> QueryResult:
    """Multi-query int8 serving with PER-FRAME quantization scales: the tile
    max runs in int32 BEFORE dequantization (max commutes with one positive
    scale per frame), which keeps XLA's matmul->max fusion intact — the
    per-row-scale dequant chain de-fuses and materializes the (N, Q) f32
    scores (28.0 ms vs 14.2 ms at 10M Q=16, perf_probe stage K; bf16 is
    19.1 ms — per-frame int8 makes int8 the fastest BATCH scan too, on top
    of its matvec win and half-HBM footprint)."""
    assert vectors.dtype == jnp.int8
    F, T = valid.shape
    qmax = jnp.max(jnp.abs(qvecs), axis=1, keepdims=True) + 1e-12  # (Q,1)
    q_i8 = jnp.clip(jnp.round(qvecs / qmax * 127.0), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        vectors, q_i8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (N, Q) int32
    a = acc.reshape(F, T, acc.shape[1])
    a = jnp.where(valid[..., None], a, jnp.int32(-(2**31) + 1))
    fmax_i = jnp.max(a, axis=1)  # (F, Q) int32
    # multiply in scoring_matvec's order ((acc * q_scale) * row_scale) so
    # results are bit-identical to the per-row-scale f32 formulation
    fmax = (
        fmax_i.astype(jnp.float32) * (qmax[:, 0] / 127.0)[None, :]
    ) * frame_scale[:, None]
    fmax = jnp.where(excluded.T | ~valid.any(axis=1)[:, None], NEG_INF, fmax)

    return jax.vmap(
        lambda q, fm: rank_from_frame_max(
            vectors, valid, boxes, zoom, q, fm,
            None, frame_scale,
            shortlist_size=shortlist_size, topk=topk, tile_bound=T,
            aug_larger=aug_larger, aug_weight=aug_weight,
            agg_method=agg_method, max_zoom=max_zoom,
        ),
        in_axes=(0, 1),
    )(qvecs, fmax)


@functools.partial(jax.jit, static_argnames=_RANK_STATICS)
def query_program_batch_incr(
    vectors, valid, boxes, zoom, qvecs,
    excluded,  # (Q, F) bool — per-session device-persistent masks
    new_ids,  # (Q, M) int32 per-session new frame ordinals, -1 padded
    row_scale=None,
    *,
    shortlist_size: int,
    topk: int,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
) -> tuple[QueryResult, jnp.ndarray]:
    """query_program_batch with each session's incremental exclusion update
    fused into the same dispatch (the batched counterpart of
    query_program_incr); returns (results, updated (Q, F) masks) — each row
    commits back to its session's device-persistent entry."""
    excluded = jax.vmap(apply_new_exclusions)(excluded, new_ids)
    res = query_program_batch(
        vectors, valid, boxes, zoom, qvecs, excluded, row_scale,
        shortlist_size=shortlist_size, topk=topk, aug_larger=aug_larger,
        aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
    )
    return res, excluded


@functools.partial(jax.jit, static_argnames=_RANK_STATICS)
def query_program_batch_framescale_incr(
    vectors, valid, boxes, zoom, qvecs, excluded, new_ids, frame_scale,
    *,
    shortlist_size: int,
    topk: int,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
) -> tuple[QueryResult, jnp.ndarray]:
    """Frame-scale int8 batch path with fused per-session exclusion updates
    (see query_program_batch_incr)."""
    excluded = jax.vmap(apply_new_exclusions)(excluded, new_ids)
    res = query_program_batch_framescale(
        vectors, valid, boxes, zoom, qvecs, excluded, frame_scale,
        shortlist_size=shortlist_size, topk=topk, aug_larger=aug_larger,
        aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
    )
    return res, excluded


@jax.jit
def score_frames_max(
    vectors: jnp.ndarray, valid: jnp.ndarray, qvec: jnp.ndarray,
    row_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Max tile score per frame — `index.score` analogue at frame granularity."""
    F, T = valid.shape
    scores = scoring_matvec(vectors, qvec, row_scale)
    return jnp.max(jnp.where(valid, scores.reshape(F, T), NEG_INF), axis=1)


@jax.jit
def score_vectors(
    vectors: jnp.ndarray, qvec: jnp.ndarray, row_scale: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Raw per-vector scores V @ q (reference `multiscale_index.py:284`)."""
    return scoring_matvec(vectors, qvec, row_scale)
