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


class Segment:
    """Batch of 1-D segments as (middle, radius) pairs — vectorized interval
    arithmetic for box cropping (reference `box_utils.py:5-126`)."""

    def __init__(self, middle: np.ndarray, radius: np.ndarray):
        self.middle = np.asarray(middle, dtype=np.float64)
        self.radius = np.asarray(radius, dtype=np.float64)

    @staticmethod
    def from_x1x2(*, x1x2: np.ndarray = None, x1=None, x2=None) -> "Segment":
        if x1x2 is not None:
            x1, x2 = x1x2[:, 0], x1x2[:, 1]
        x1, x2 = np.asarray(x1, np.float64), np.asarray(x2, np.float64)
        assert (x1 <= x2).all()
        return Segment((x1 + x2) / 2, (x2 - x1) / 2)

    @staticmethod
    def from_midrad(mid, rad) -> "Segment":
        rad = np.asarray(rad, np.float64)
        assert (rad >= 0).all()
        return Segment(mid, rad)

    def to_x1x2(self) -> np.ndarray:
        return np.stack([self.x1(), self.x2()], axis=1)

    def mid(self):
        return self.middle

    def rad(self):
        return self.radius

    def x1(self):
        return self.middle - self.radius

    def x2(self):
        return self.middle + self.radius

    def num_segments(self) -> int:
        return self.middle.shape[0]

    def length(self) -> np.ndarray:
        return 2 * self.radius

    def clip(self, minx, maxx) -> "Segment":
        minx, maxx = np.asarray(minx, np.float64), np.asarray(maxx, np.float64)
        return Segment.from_x1x2(
            x1=np.clip(self.x1(), minx, maxx), x2=np.clip(self.x2(), minx, maxx)
        )

    def intersection(self, other: "Segment") -> "Segment":
        assert self.num_segments() == other.num_segments()
        x1 = np.maximum(self.x1(), other.x1())
        x2 = np.minimum(self.x2(), other.x2())
        return Segment.from_x1x2(x1=np.minimum(x1, x2), x2=x2)

    def fits(self, minx=None, maxx=None) -> bool:
        ok = np.ones(self.num_segments(), dtype=bool)
        if minx is not None:
            ok &= self.x1() >= np.asarray(minx) - 1e-9
        if maxx is not None:
            ok &= self.x2() <= np.asarray(maxx) + 1e-9
        return bool(ok.all())

    def pad(self, padding, minx, maxx) -> "Segment":
        padding = np.asarray(padding, np.float64)
        assert (padding >= 0).all()
        return Segment.from_midrad(self.mid(), self.rad() + padding).clip(minx, maxx)

    def best_seg(self, new_len, minx, maxx) -> "Segment":
        """New segment of the target length inside [minx, maxx] with maximal
        overlap, centered as close to the original middle as bounds allow."""
        minx, maxx = np.asarray(minx, np.float64), np.asarray(maxx, np.float64)
        assert (maxx >= minx).all()
        assert self.fits(minx, maxx)
        new_len = np.minimum(np.asarray(new_len, np.float64), maxx - minx)
        raw = Segment.from_midrad(self.mid(), new_len / 2.0)
        left_excess = np.clip(minx - raw.x1(), 0, None)
        right_excess = np.clip(raw.x2() - maxx, 0, None)
        assert (~((left_excess > 0) & (right_excess > 0))).all()
        shifted = Segment.from_midrad(
            mid=raw.mid() + left_excess - right_excess, rad=raw.rad()
        )
        return shifted.clip(minx, maxx)


class BoxBatch:
    """Batch of axis-aligned boxes as an (x-segment, y-segment) pair
    (reference `box_utils.py:136-222`)."""

    def __init__(self, xseg: Segment, yseg: Segment):
        self.xseg = xseg
        self.yseg = yseg

    @staticmethod
    def from_xyxy(xyxy: np.ndarray) -> "BoxBatch":
        xyxy = np.asarray(xyxy, np.float64)
        return BoxBatch(
            Segment.from_x1x2(x1=xyxy[:, 0], x2=xyxy[:, 2]),
            Segment.from_x1x2(x1=xyxy[:, 1], x2=xyxy[:, 3]),
        )

    def to_xyxy(self) -> np.ndarray:
        return np.stack([self.x1(), self.y1(), self.x2(), self.y2()], axis=1)

    def x1(self):
        return self.xseg.x1()

    def x2(self):
        return self.xseg.x2()

    def y1(self):
        return self.yseg.x1()

    def y2(self):
        return self.yseg.x2()

    def width(self):
        return self.xseg.length()

    def height(self):
        return self.yseg.length()

    def area(self):
        return self.width() * self.height()

    def intersection(self, other: "BoxBatch") -> "BoxBatch":
        return BoxBatch(
            self.xseg.intersection(other.xseg), self.yseg.intersection(other.yseg)
        )

    def pad(self, padding, xmax, ymax) -> "BoxBatch":
        return BoxBatch(
            self.xseg.pad(padding, 0, xmax), self.yseg.pad(padding, 0, ymax)
        )

    def _frame_wh(self):
        """Display frame for the HTML repr: the boxes' extent (subclasses
        bound to an image override with its true dimensions)."""
        return (float(np.max(self.x2(), initial=1.0)),
                float(np.max(self.y2(), initial=1.0)))

    def _repr_html_(self) -> str:
        """Notebook table with a mini-SVG per box (reference styles a
        DataFrame with shapely polygon svgs, `box_utils.py:218-222`; ours
        is a dependency-free HTML table, same at-a-glance content)."""
        w, h = self._frame_wh()
        disp = 96.0 / max(w, h, 1e-9)
        rows = []
        for i, b in enumerate(self.to_xyxy()):
            cells = "".join(f"<td>{v:.1f}</td>" for v in b)
            mini = (
                f'<svg xmlns="http://www.w3.org/2000/svg" '
                f'width="{w * disp:.0f}" height="{h * disp:.0f}" '
                f'viewBox="0 0 {w:.2f} {h:.2f}">'
                f'<rect x="0" y="0" width="{w:.2f}" height="{h:.2f}" '
                f'fill="none" stroke="#888" stroke-width="1"/>'
                f"{_rects_svg(b.reshape(1, 4))}</svg>"
            )
            rows.append(f"<tr><td>{i}</td>{cells}<td>{mini}</td></tr>")
        return (
            "<table><thead><tr><th></th><th>x1</th><th>y1</th><th>x2</th>"
            "<th>y2</th><th>shape</th></tr></thead><tbody>"
            + "".join(rows) + "</tbody></table>"
        )

    def best_square_box(self, xmax=np.inf, ymax=np.inf, min_side=0) -> "BoxBatch":
        """Square crop within bounds with maximal overlap, near-centered —
        used to cut square training patches around labeled boxes."""
        xmax, ymax = np.asarray(xmax, np.float64), np.asarray(ymax, np.float64)
        min_side = np.asarray(min_side, np.float64)
        max_container = np.minimum(xmax, ymax)
        box_side = np.maximum(self.height(), self.width())
        target = np.maximum(
            np.minimum(box_side, max_container), np.minimum(min_side, max_container)
        )
        return BoxBatch(
            self.xseg.best_seg(target, minx=0, maxx=xmax),
            self.yseg.best_seg(target, minx=0, maxx=ymax),
        )


class BoundingBoxBatch(BoxBatch):
    """BoxBatch bound to image dimensions (reference `box_utils.py:234-272`)."""

    def __init__(self, xseg, yseg, im_width, im_height):
        super().__init__(xseg, yseg)
        self.im_width = np.asarray(im_width, np.float64)
        self.im_height = np.asarray(im_height, np.float64)

    @staticmethod
    def from_boxbatch(bx: BoxBatch, im_width, im_height) -> "BoundingBoxBatch":
        return BoundingBoxBatch(bx.xseg, bx.yseg, im_width, im_height)

    def pad(self, padding) -> "BoundingBoxBatch":
        bbx = super().pad(padding, xmax=self.im_width, ymax=self.im_height)
        return BoundingBoxBatch.from_boxbatch(bbx, self.im_width, self.im_height)

    def best_square_box(self, min_side=0) -> "BoundingBoxBatch":
        bb = super().best_square_box(
            xmax=self.im_width, ymax=self.im_height, min_side=min_side
        )
        return BoundingBoxBatch(bb.xseg, bb.yseg, self.im_width, self.im_height)

    def _frame_wh(self):
        return (float(np.max(self.im_width)), float(np.max(self.im_height)))


def _rects_svg(xyxy: np.ndarray, fill: str = "#66c2a5") -> str:
    """SVG <rect> elements for an (N, 4) xyxy array (no shapely — the
    reference renders via shapely's polygon svg, `box_utils.py:128-134`;
    plain rects carry the same information for axis-aligned boxes)."""
    parts = []
    for x1, y1, x2, y2 in np.asarray(xyxy, np.float64).reshape(-1, 4):
        parts.append(
            f'<rect x="{x1:.2f}" y="{y1:.2f}" width="{x2 - x1:.2f}" '
            f'height="{y2 - y1:.2f}" fill="{fill}" fill-opacity="0.35" '
            f'stroke="#1b7837" stroke-width="1"/>'
        )
    return "".join(parts)


def boxes_svg(xyxy: np.ndarray, width: float, height: float) -> str:
    """Standalone SVG document showing boxes inside a width x height frame."""
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width:.0f}" '
        f'height="{height:.0f}" viewBox="0 0 {width:.2f} {height:.2f}">'
        f'<rect x="0" y="0" width="{width:.2f}" height="{height:.2f}" '
        f'fill="none" stroke="#888" stroke-width="1"/>'
        f"{_rects_svg(xyxy)}</svg>"
    )


class BoxOverlay:
    """Overlays one box on its image for notebook display (reference
    `box_utils.py:273-327` — shapely-free: the SVG is assembled directly).

    `max_display_size` caps the rendered size; the box stays in image
    coordinates via an SVG group transform, exactly like the reference's
    `matrix(scale,0,0,scale,0,0)`."""

    def __init__(self, x1, y1, x2, y2, im_width, im_height, im_url=None,
                 max_display_size=None):
        self.box = np.array([[x1, y1, x2, y2]], np.float64)
        self.im_width = float(im_width)
        self.im_height = float(im_height)
        if max_display_size is None:
            self.scale_factor = 1.0
        else:
            self.scale_factor = round(
                min(max(im_width, im_height), max_display_size)
                / max(im_width, im_height), 2,
            )
        self.im_url = im_url

    @staticmethod
    def from_dfrow(dfrow, im_url=None, max_display_size=None) -> "BoxOverlay":
        return BoxOverlay(
            dfrow.x1, dfrow.y1, dfrow.x2, dfrow.y2, dfrow.im_width,
            dfrow.im_height, im_url=im_url,
            max_display_size=max_display_size,
        )

    def _repr_html_(self) -> str:
        width = round(self.scale_factor * self.im_width)
        height = round(self.scale_factor * self.im_height)
        image_str = (
            f'<img width="{width}" height="{height}" src="{self.im_url}"/>'
            if self.im_url else ""
        )
        style_str = "position:absolute;top:0;left:0" if self.im_url else ""
        frame = (
            f'<rect x="0" y="0" width="{self.im_width:.2f}" '
            f'height="{self.im_height:.2f}" fill="none" stroke="#888" '
            f'stroke-width="1"/>'
        )
        svg_str = (
            f'<svg style="{style_str}" width="{width}" height="{height}" '
            f'viewBox="0 0 {width} {height}">'
            f'<g transform="matrix({self.scale_factor:.02f},0,0,'
            f'{self.scale_factor:.02f},0,0)">{frame}{_rects_svg(self.box)}'
            f"</g></svg>"
        )
        return (
            f'<div style="position:relative;">{image_str}{svg_str}</div>'
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
