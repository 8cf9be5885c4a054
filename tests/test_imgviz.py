"""imgviz: box/activation drawing and session montage render."""
import numpy as np
import PIL.Image

from seesaw_tpu.basic_types import ActivationData, Box, Imdata
from seesaw_tpu.imgviz import draw_activations, draw_boxes, draw_imdata, montage


def _img(h=60, w=80):
    return PIL.Image.fromarray(np.zeros((h, w, 3), np.uint8))


def test_draw_boxes_marks_pixels():
    im = draw_boxes(_img(), np.array([[10, 10, 40, 30]]), labels=["dog"])
    arr = np.asarray(im)
    assert arr[10, 10:40].any()  # outline drawn
    assert arr.shape == (60, 80, 3)


def test_draw_activations_and_imdata():
    acts = [dict(x1=5, y1=5, x2=25, y2=25, score=0.73)]
    im = draw_activations(_img(), acts)
    assert np.asarray(im)[5, 5:25].any()

    imd = Imdata(
        url="u", dbidx=3,
        boxes=[Box(x1=2, y1=2, x2=20, y2=20, description=None, marked_accepted=True)],
        activations=[ActivationData(box=Box(x1=5, y1=5, x2=25, y2=25), score=0.5)],
    )
    cell = draw_imdata(_img(), imd)
    arr = np.asarray(cell)
    # accepted -> green border
    assert tuple(arr[0, 0]) == (65, 195, 99)

    rejected = Imdata(url="u", dbidx=4, boxes=[], activations=None)
    cell2 = draw_imdata(_img(), rejected)
    assert tuple(np.asarray(cell2)[0, 0]) == (217, 83, 79)


def test_montage_shape():
    cells = [_img(50, 50) for _ in range(5)]
    m = montage(cells, cols=3, cell=50, pad=4)
    assert m.width == 3 * 54 + 4 and m.height == 2 * 54 + 4
