"""Ingestion tests: tiling geometry/reconstruction, end-to-end index build
with the tiny flax CLIP, coarse derivation."""
import numpy as np
import PIL.Image
import pytest

from seesaw_tpu.ingest.tiling import (
    generate_multiscale_tiling,
    pyramid_levels,
    strided_tiles,
)


def checkerboard(w, h, block=16):
    """Deterministic structured image: every pixel encodes its position."""
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    r = (xx % 256).astype(np.uint8)
    g = (yy % 256).astype(np.uint8)
    b = ((xx // block + yy // block) % 2 * 255).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_pyramid_levels_bounds():
    fs = pyramid_levels(900, factor=0.5, abs_min=224)
    # descending; smallest copy hits exactly abs_min; grid anchored at
    # abs_min (factor-of-2 steps), so the top may exceed 1.0
    assert fs == sorted(fs, reverse=True)
    assert fs[-1] == pytest.approx(224 / 900)
    for a, b in zip(fs, fs[1:]):
        assert a / b == pytest.approx(2.0, rel=1e-6)
    # single-level case: image already at min size
    fs1 = pyramid_levels(224, factor=0.5, abs_min=224)
    assert len(fs1) == 1 and fs1[0] == pytest.approx(1.0)
    # smaller than min: upscales
    fs2 = pyramid_levels(100, factor=0.5, abs_min=224)
    assert all(f >= 1.0 for f in fs2)


def test_strided_tiles_exact_content():
    arr = checkerboard(64, 48)
    tiles, boxes = strided_tiles(arr, tile_size=16)
    assert tiles.shape[0] == boxes.shape[0] > 0
    for t, b in zip(tiles, boxes):
        x1, y1, x2, y2 = map(int, b)
        np.testing.assert_array_equal(t, arr[y1:y2, x1:x2])
    # shift coverage: both 0- and 8-offset grids present
    assert 0.0 in boxes[:, 0] and 8.0 in boxes[:, 0]


def test_multiscale_tiling_reconstruction():
    # 448x336 image: pyramid has 2 levels (448->224 short side)
    arr = checkerboard(448, 336)
    im = PIL.Image.fromarray(arr)
    # min_tile_size 112 keeps both pyramid levels (the larger copy's
    # effective tile is 224/1.333 = 168px in original coordinates)
    ts = generate_multiscale_tiling(im, tile_size=224, factor=0.5, min_tile_size=112)
    assert ts.max_zoom_level >= 2
    assert set(np.unique(ts.zoom_level)) >= {1, ts.max_zoom_level}
    # all boxes inside original image bounds
    assert (ts.boxes[:, 0] >= -1e-3).all() and (ts.boxes[:, 1] >= -1e-3).all()
    assert (ts.boxes[:, 2] <= 448 + 1e-3).all()
    assert (ts.boxes[:, 3] <= 336 + 1e-3).all()
    # zoom-1 tiles are native resolution: their content equals the crop
    z1 = np.where(ts.zoom_level == 1)[0]
    assert len(z1) > 0
    sf = ts.scale_factor[z1[0]]
    if abs(sf - 1.0) < 1e-6:
        t = ts.tiles[z1[0]]
        x1, y1, x2, y2 = map(int, np.round(ts.boxes[z1[0]]))
        np.testing.assert_array_equal(t, arr[y1:y2, x1:x2])
    # most-zoomed-out level covers most of the image width
    zmax_boxes = ts.boxes[ts.zoom_level == ts.max_zoom_level]
    assert zmax_boxes[:, 2].max() >= 448 * 0.6


def test_small_image_single_level():
    arr = checkerboard(200, 180)
    ts = generate_multiscale_tiling(PIL.Image.fromarray(arr), tile_size=224)
    # upscaled to min side 224 -> exactly one zoom level, >= 1 tile
    assert ts.max_zoom_level == 1
    assert ts.tiles.shape[0] >= 1


@pytest.fixture(scope="module")
def image_dataset(tmp_path_factory):
    from seesaw_tpu.dataset import GlobalDataManager

    root = tmp_path_factory.mktemp("ingest_root")
    img_dir = root / "raw_images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        w, h = int(rng.integers(64, 129)), int(rng.integers(64, 129))
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(img_dir / f"img_{i}.png")
    gdm = GlobalDataManager(str(root / "seesaw_root"))
    ds = gdm.create_dataset("imgs", image_src=str(img_dir))
    return gdm, ds


def test_create_multiscale_index_end_to_end(image_dataset):
    from seesaw_tpu.ingest.pipeline import create_multiscale_index

    gdm, ds = image_dataset
    # tiny tile size + tiny test CLIP keeps this fast on CPU
    idx = create_multiscale_index(
        ds, "ms_test", "clip-test", tile_size=32, min_tile_size=32,
        batch_size=16, force=True, build_knn_graph=4,
    )
    assert idx.vectors.shape[0] > 0
    assert idx.vectors.shape[1] == 16  # test-variant embed dim
    norms = np.linalg.norm(idx.vectors, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert idx.n_frames == ds.size()
    # query round-trips
    q = idx.vectors[0]
    res = idx.query(vector=q, topk=3, shortlist_size=6)
    assert len(res["dbidxs"]) == 3
    # knn graph exists
    from seesaw_tpu.knn_graph import KNNGraph

    g = KNNGraph.from_file(idx.get_knng_path(""))
    assert g.nvecs == idx.vectors.shape[0]


def test_create_coarse_index(image_dataset):
    from seesaw_tpu.indices.coarse import CoarseIndex
    from seesaw_tpu.ingest.pipeline import (
        create_coarse_index, create_multiscale_index,
    )
    # self-sufficient under test selection (-m fast / -k): build the source
    # multiscale index if the end-to-end builder test didn't run first
    if "ms_test" not in image_dataset[1].list_indices():
        create_multiscale_index(
            image_dataset[1], "ms_test", "clip-test", tile_size=32,
            min_tile_size=32, batch_size=16, force=True,
        )

    gdm, ds = image_dataset
    coarse = create_coarse_index(ds, "coarse_test", from_index="ms_test", force=True)
    assert isinstance(coarse, CoarseIndex)
    assert coarse.vectors.shape[0] == ds.size()
    res = coarse.query(vector=coarse.vectors[2], topk=2)
    assert res["dbidxs"][0] == coarse.meta.frame_dbidx[2]

    # coarse query state: binary labels
    from seesaw_tpu.basic_types import Box

    cq = coarse.new_query()
    cq.label_db.put(0, [Box(x1=0, y1=0, x2=1, y2=1, marked_accepted=True)])
    cq.label_db.put(1, [])
    pos, neg = cq.getXy(get_positions=True)
    assert len(pos) == 1 and len(neg) == 1


def test_sharded_extraction_matches_single(image_dataset):
    """Data-parallel batch encoding over the virtual 8-device mesh produces
    the same vectors as single-device."""
    from seesaw_tpu.ingest.pipeline import run_multiscale_extraction
    from seesaw_tpu.models.registry import load_embedding
    from seesaw_tpu.parallel import make_mesh

    gdm, ds = image_dataset
    emb = load_embedding("clip-test")
    v1, d1, z1, b1 = run_multiscale_extraction(
        ds, emb, tile_size=32, min_tile_size=32, batch_size=16
    )
    mesh = make_mesh(8)
    v2, d2, z2, b2 = run_multiscale_extraction(
        ds, emb, tile_size=32, min_tile_size=32, batch_size=16, mesh=mesh
    )
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(v1, v2, atol=1e-5)
