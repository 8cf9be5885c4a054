import numpy as np
import pytest

from seesaw_tpu import box_utils


def _iou_single(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def test_box_iou_matches_scalar_reference():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 100, size=(7, 2))
    wh = rng.uniform(1, 50, size=(7, 2))
    b1 = np.concatenate([xy, xy + wh], axis=1)
    xy = rng.uniform(0, 100, size=(5, 2))
    wh = rng.uniform(1, 50, size=(5, 2))
    b2 = np.concatenate([xy, xy + wh], axis=1)
    ious = box_utils.box_iou(b1, b2)
    for i in range(7):
        for j in range(5):
            assert ious[i, j] == pytest.approx(_iou_single(b1[i], b2[j]))


def test_containment():
    outer = np.array([[0.0, 0, 10, 10]])
    inner = np.array([[2.0, 2, 4, 4]])
    ious, cont = box_utils.box_iou(inner, outer, return_containment=True)
    assert cont[0, 0] == pytest.approx(1.0)  # inner fully contained
    assert ious[0, 0] == pytest.approx(4.0 / 100.0)
    # containment is asymmetric
    _, cont2 = box_utils.box_iou(outer, inner, return_containment=True)
    assert cont2[0, 0] == pytest.approx(4.0 / 100.0)


def test_empty_sets():
    b = np.zeros((0, 4))
    other = np.array([[0.0, 0, 1, 1]])
    assert box_utils.box_iou(b, other).shape == (0, 1)
    assert box_utils.max_iou_per_left(other, b).tolist() == [0.0]


def test_box_join_strict_threshold():
    b1 = np.array([[0.0, 0, 2, 2], [10.0, 10, 12, 12]])
    b2 = np.array([[1.0, 1, 3, 3], [20.0, 20, 22, 22]])
    j = box_utils.box_join(b1, b2)
    # only the overlapping pair (0,0) survives iou > 0
    assert j.iloc_left.tolist() == [0]
    assert j.iloc_right.tolist() == [0]
    assert j.iou[0] == pytest.approx(1.0 / 7.0)


def test_max_iou_per_left():
    tiles = np.array([[0.0, 0, 4, 4], [4.0, 0, 8, 4]])
    labels = np.array([[0.0, 0, 4, 4]])
    out = box_utils.max_iou_per_left(tiles, labels)
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(0.0)


def test_svg_reprs_well_formed():
    """The notebook display helpers (reference `box_utils.py:128-134,
    218-222, 273-327`) emit well-formed markup with the box geometry in
    image coordinates: BoxBatch/BoundingBoxBatch HTML tables and the
    BoxOverlay image overlay (shapely-free)."""
    import re
    import xml.etree.ElementTree as ET

    bb = box_utils.BoxBatch.from_xyxy(
        np.array([[10.0, 20, 110, 70], [0.0, 0, 50, 50]])
    )
    html = bb._repr_html_()
    assert html.count("<tr>") == 3  # header + 2 boxes
    svgs = re.findall(r"<svg.*?</svg>", html)
    assert len(svgs) == 2
    rect = ET.fromstring(svgs[0]).findall(
        "{http://www.w3.org/2000/svg}rect"
    )
    # frame rect + box rect; box keeps image coordinates
    assert float(rect[1].get("x")) == 10.0
    assert float(rect[1].get("width")) == 100.0

    bbb = box_utils.BoundingBoxBatch.from_boxbatch(bb, 640, 480)
    assert 'viewBox="0 0 640.00 480.00"' in bbb._repr_html_()

    ov = box_utils.BoxOverlay(10, 20, 110, 70, 640, 480,
                              im_url="http://x/im.jpg",
                              max_display_size=320)
    h = ov._repr_html_()
    assert ov.scale_factor == 0.5
    assert '<img width="320" height="240"' in h
    assert "matrix(0.50,0,0,0.50,0,0)" in h
    # overlay without an image url renders standalone (no absolute pos)
    h2 = box_utils.BoxOverlay(0, 0, 5, 5, 10, 10)._repr_html_()
    assert "position:absolute" not in h2

    doc = box_utils.boxes_svg(np.array([[1.0, 2, 3, 4]]), 10, 10)
    ET.fromstring(doc)  # parses as XML
