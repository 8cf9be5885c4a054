"""Segment / BoxBatch / best_square_box cases incl. the reference test's
transpose symmetry (seesaw/test_box_utils.py)."""
import numpy as np
import pytest

from seesaw_tpu.box_utils import BoundingBoxBatch, BoxBatch, Segment


def test_segment_roundtrip_and_ops():
    s = Segment.from_x1x2(x1=np.array([0.0, 2.0]), x2=np.array([4.0, 8.0]))
    np.testing.assert_allclose(s.mid(), [2, 5])
    np.testing.assert_allclose(s.length(), [4, 6])
    np.testing.assert_allclose(s.to_x1x2(), [[0, 4], [2, 8]])

    clipped = s.clip(1, 5)
    np.testing.assert_allclose(clipped.to_x1x2(), [[1, 4], [2, 5]])

    inter = s.intersection(Segment.from_x1x2(x1=np.array([3.0, 0.0]), x2=np.array([10.0, 1.0])))
    np.testing.assert_allclose(inter.x1(), [3, 1])  # disjoint -> empty at boundary
    assert inter.length()[1] == 0

    padded = s.pad(np.array([1.0, 1.0]), 0, 10)
    np.testing.assert_allclose(padded.to_x1x2(), [[0, 5], [1, 9]])


def test_best_seg_centering_and_edges():
    s = Segment.from_x1x2(x1=np.array([4.0]), x2=np.array([6.0]))
    # grow to length 4, room on both sides: stays centered
    out = s.best_seg(np.array([4.0]), 0, 10)
    np.testing.assert_allclose(out.to_x1x2(), [[3, 7]])
    # near the left edge: shifts right to fit
    s2 = Segment.from_x1x2(x1=np.array([0.0]), x2=np.array([2.0]))
    out2 = s2.best_seg(np.array([6.0]), 0, 10)
    np.testing.assert_allclose(out2.to_x1x2(), [[0, 6]])
    # target longer than the container: capped
    out3 = s2.best_seg(np.array([50.0]), 0, 10)
    np.testing.assert_allclose(out3.to_x1x2(), [[0, 10]])


def _square_case(xyxy, w, h, min_side=0):
    bb = BoundingBoxBatch.from_boxbatch(
        BoxBatch.from_xyxy(np.array([xyxy], dtype=np.float64)), w, h
    )
    out = bb.best_square_box(min_side=min_side)
    return out.to_xyxy()[0]


def test_best_square_box_properties():
    out = _square_case([10, 20, 30, 60], 100, 100)
    w, h = out[2] - out[0], out[3] - out[1]
    assert w == pytest.approx(h)  # square
    assert w == pytest.approx(40)  # max(box w, h)
    # contains the original box
    assert out[0] <= 10 and out[1] <= 20 and out[2] >= 30 and out[3] >= 60
    assert 0 <= out[0] and out[2] <= 100


def test_best_square_box_transpose_symmetry():
    """Transposing x/y must transpose the result (reference
    `transpose_test_case`, seesaw/test_box_utils.py:5)."""
    a = _square_case([5, 40, 25, 90], 120, 100)
    b = _square_case([40, 5, 90, 25], 100, 120)
    np.testing.assert_allclose(a, [b[1], b[0], b[3], b[2]])


def test_best_square_box_min_side_and_bounds():
    out = _square_case([2, 2, 4, 4], 50, 50, min_side=20)
    assert out[2] - out[0] == pytest.approx(20)
    assert out[0] >= 0 and out[1] >= 0
    # short image: square capped at the smaller image dimension
    out2 = _square_case([1, 1, 9, 5], 10, 6)
    assert out2[3] - out2[1] == pytest.approx(6)
    assert out2[2] - out2[0] == pytest.approx(6)
