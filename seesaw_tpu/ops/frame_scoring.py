"""Fused query program: score, distinct-frame top-k, frame augmentation.

This is the device-side heart of the search loop. The reference implements it
as a numpy matvec + full argsort + a pandas per-frame box-join/groupby rescore
(`/root/reference/seesaw/indices/multiscale/multiscale_index.py:112-150,
291-403`). Here the whole per-click query is one jit-compiled XLA program:

    scores   = V @ q  (- V @ q2)                       # MXU matvec
    fmax     = segment-max over contiguous frame rows  # distinct-image top-k
    shortist = top-k of masked fmax                    # exclusion mask
    tiles    = gather shortlisted frames' tile rows    # padded (B, T)
    adjusted = frame augmentation across zoom levels   # vmapped (B, T)
    result   = top-k frames by adjusted score + top-tile activations

Because vectors are sorted by dbidx (indices/meta.py), "distinct top-k images
by best tile" is exactly "top-k frames by segment max" — no uniquing on
device, no data-dependent shapes. Frame augmentation reproduces the
reference's `score_frame2` semantics (box join on IoU>0, per-zoom-level
IoU-argmax then mean, or containment-softmax weighting) as dense masked ops
over a (T, T) tile-pair matrix; T is the padded per-frame tile bound.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

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
    agg_method='plain_score' bypasses augmentation entirely.
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


def _segment_max(scores: jnp.ndarray, frame_id: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    return jax.ops.segment_max(
        scores, frame_id, num_segments=n_frames, indices_are_sorted=True
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_frames", "shortlist_size", "topk", "tile_bound",
        "aug_larger", "aug_weight", "agg_method", "max_zoom",
    ),
)
def query_program(
    vectors: jnp.ndarray,  # (N, D)
    frame_id: jnp.ndarray,  # (N,) int32
    frame_starts: jnp.ndarray,  # (F+1,) int32
    boxes: jnp.ndarray,  # (N, 4) float32
    zoom: jnp.ndarray,  # (N,) int32
    qvec: jnp.ndarray,  # (D,)
    qvec2: jnp.ndarray | None,  # (D,) or None — subtracted (discount) score
    excluded: jnp.ndarray,  # (F,) bool — frames to skip
    *,
    n_frames: int,
    shortlist_size: int,
    topk: int,
    tile_bound: int,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
) -> QueryResult:
    """The full per-click query as one XLA program. See module docstring."""
    compute_dtype = jnp.float32
    scores = vectors @ qvec.astype(vectors.dtype)
    scores = scores.astype(compute_dtype)
    if qvec2 is not None:
        scores = scores - (vectors @ qvec2.astype(vectors.dtype)).astype(compute_dtype)

    # -- stage 1: shortlist frames by best raw tile score ------------------
    fmax = _segment_max(scores, frame_id, n_frames)
    fmax = jnp.where(excluded, NEG_INF, fmax)
    short_scores, short_fids = jax.lax.top_k(fmax, shortlist_size)
    short_valid = short_scores > NEG_INF

    # -- stage 2: gather shortlisted frames' tiles (padded) ----------------
    starts = frame_starts[short_fids]
    lengths = frame_starts[short_fids + 1] - starts
    offs = jnp.arange(tile_bound, dtype=jnp.int32)
    rows = starts[:, None] + offs[None, :]  # (B, T)
    tile_valid = (offs[None, :] < lengths[:, None]) & short_valid[:, None]
    rows = jnp.clip(rows, 0, scores.shape[0] - 1)

    t_boxes = boxes[rows]  # (B, T, 4)
    t_zoom = zoom[rows]
    t_scores = jnp.where(tile_valid, scores[rows], NEG_INF)

    # -- stage 3: frame augmentation (vmapped over shortlist) --------------
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

    # -- stage 4: final top-k frames by augmented score --------------------
    frame_score = jnp.where(short_valid, frame_score, NEG_INF)
    final_scores, final_pos = jax.lax.top_k(frame_score, topk)
    n_valid = (final_scores > NEG_INF).sum()

    return QueryResult(
        frame_ids=jnp.where(final_scores > NEG_INF, short_fids[final_pos], -1),
        frame_scores=final_scores,
        act_boxes=act_box[final_pos],
        act_scores=act_score[final_pos],
        n_valid=n_valid,
    )


@functools.partial(jax.jit, static_argnames=("n_frames",))
def score_frames_max(
    vectors: jnp.ndarray, frame_id: jnp.ndarray, qvec: jnp.ndarray, *, n_frames: int
) -> jnp.ndarray:
    """Max tile score per frame — `index.score` analogue at frame granularity."""
    scores = (vectors @ qvec.astype(vectors.dtype)).astype(jnp.float32)
    return _segment_max(scores, frame_id, n_frames)


@jax.jit
def score_vectors(vectors: jnp.ndarray, qvec: jnp.ndarray) -> jnp.ndarray:
    """Raw per-vector scores V @ q (reference `multiscale_index.py:284`)."""
    return (vectors @ qvec.astype(vectors.dtype)).astype(jnp.float32)
