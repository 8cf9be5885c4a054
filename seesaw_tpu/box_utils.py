"""Vectorized box geometry.

Pairwise IoU / containment and relational box joins over struct-of-array box
sets. Replaces the reference's torchvision-backed `box_iou`
(`/root/reference/seesaw/box_utils.py:336-420`) with pure numpy on the host
and mirrored jnp forms used inside device kernels (`seesaw_tpu.ops.frame_aug`).

Boxes are (x1, y1, x2, y2) with x2 >= x1, y2 >= y1, in pixels.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def boxes_from_df(df) -> np.ndarray:
    """(K,4) float array [x1,y1,x2,y2] from a dataframe with box columns."""
    return np.stack(
        [
            np.asarray(df["x1"], dtype=np.float64),
            np.asarray(df["y1"], dtype=np.float64),
            np.asarray(df["x2"], dtype=np.float64),
            np.asarray(df["y2"], dtype=np.float64),
        ],
        axis=1,
    )


def box_area(b: np.ndarray) -> np.ndarray:
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def pairwise_intersection(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    """(N,M) intersection areas between two box sets."""
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    return wh[..., 0] * wh[..., 1]


def box_iou(b1, b2, return_containment: bool = False):
    """Pairwise IoU between two box sets; optionally also containment of b1.

    Accepts either (K,4) arrays or dataframes with x1/y1/x2/y2 columns.
    ``containment[i,j] = area(b1_i ∩ b2_j) / area(b1_i)`` — how much of box i
    lies inside box j (reference `box_utils.py:336-350`).
    """
    if not isinstance(b1, np.ndarray):
        b1 = boxes_from_df(b1)
    if not isinstance(b2, np.ndarray):
        b2 = boxes_from_df(b2)
    inter = pairwise_intersection(b1, b2)
    a1 = box_area(b1)[:, None]
    a2 = box_area(b2)[None, :]
    union = a1 + a2 - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        ious = np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)
        containment = np.where(a1 > 0, inter / np.where(a1 > 0, a1, 1.0), 0.0)
    if return_containment:
        return ious, containment
    return ious


@dataclass
class BoxJoin:
    """Sparse result of joining two box sets on IoU > threshold."""

    iloc_left: np.ndarray  # (E,) int
    iloc_right: np.ndarray  # (E,) int
    iou: np.ndarray  # (E,) float
    cont: np.ndarray  # (E,) float — containment of left box within right box


def box_join(b1, b2, iou_gt: float = 0.0) -> BoxJoin:
    """All pairs (i, j) with IoU(b1_i, b2_j) strictly greater than ``iou_gt``.

    Relational analogue of the reference's `box_join`
    (`box_utils.py:364-372`), returned as index arrays instead of a merged
    dataframe."""
    ious, cont = box_iou(b1, b2, return_containment=True)
    ii, jj = np.where(ious > iou_gt)
    return BoxJoin(
        iloc_left=ii, iloc_right=jj, iou=ious[ii, jj], cont=cont[ii, jj]
    )


def max_iou_per_left(b1, b2) -> np.ndarray:
    """For every box in b1, the maximum IoU against any box in b2 (0 if b2 empty).

    Drives label→tile matching (`left_iou_join`, reference
    `box_utils.py:406-420`)."""
    b1 = b1 if isinstance(b1, np.ndarray) else boxes_from_df(b1)
    if b2 is None or (hasattr(b2, "__len__") and len(b2) == 0):
        return np.zeros(b1.shape[0])
    ious = box_iou(b1, b2)
    if ious.shape[1] == 0:
        return np.zeros(b1.shape[0])
    return ious.max(axis=1)
