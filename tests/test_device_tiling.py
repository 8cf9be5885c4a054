"""On-device tiling must reproduce the host tiling geometry exactly and the
host pipeline's embeddings closely (resize filters differ slightly)."""
import os

import numpy as np
import PIL.Image
import pytest

from seesaw_tpu.ingest.device_tiling import make_plan, tile_on_device
from seesaw_tpu.ingest.tiling import generate_multiscale_tiling


def _smooth_image(rng, h, w):
    """Low-frequency image: resize-filter differences stay small."""
    base = rng.random((h // 16 + 2, w // 16 + 2, 3)) * 255
    im = PIL.Image.fromarray(base.astype(np.uint8)).resize((w, h), PIL.Image.BICUBIC)
    return np.asarray(im)


@pytest.mark.parametrize("h,w,ts", [(480, 640, 224), (224, 224, 224),
                                    (300, 500, 224), (96, 64, 32), (65, 97, 32)])
def test_plan_matches_host_geometry(h, w, ts):
    rng = np.random.default_rng(h + w)
    img = _smooth_image(rng, h, w)
    host = generate_multiscale_tiling(
        PIL.Image.fromarray(img), tile_size=ts, factor=0.5, min_tile_size=ts
    )
    plan = make_plan(h, w, ts, 0.5, ts)
    assert plan.n_tiles == host.tiles.shape[0]
    np.testing.assert_allclose(plan.boxes, host.boxes, atol=1e-4)
    np.testing.assert_array_equal(plan.zoom_level, host.zoom_level)
    assert plan.max_zoom_level == host.max_zoom_level


def test_device_tiles_close_to_host():
    from seesaw_tpu.models.preprocess import normalize_pixels

    rng = np.random.default_rng(0)
    img = _smooth_image(rng, 300, 500)
    host = generate_multiscale_tiling(
        PIL.Image.fromarray(img), tile_size=224, factor=0.5, min_tile_size=224
    )
    host_norm = np.asarray(normalize_pixels(host.tiles.astype(np.float32) / 255.0))

    plan, tiles_d = tile_on_device(img, 224, 0.5, 224)
    tiles = np.asarray(tiles_d)
    assert tiles.shape == host_norm.shape
    # same tiles up to resize-filter differences (PIL vs jax bilinear)
    err = np.abs(tiles - host_norm).mean()
    assert err < 0.08, err
    # level-1 tiles (no resize when sf==1) should be exact
    lvl1 = plan.zoom_level == 1
    if plan.levels[0].sf == 1.0 and lvl1.any():
        np.testing.assert_allclose(tiles[lvl1], host_norm[lvl1], atol=1e-5)


def test_pipeline_device_vs_host(tmp_path):
    """Full extraction equivalence on the tiny CLIP: identical metadata,
    highly similar embeddings."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    from seesaw_tpu.ingest.pipeline import run_multiscale_extraction
    from seesaw_tpu.models.clip import ClipEmbedding

    rng = np.random.default_rng(1)
    paths = []
    for i, (h, w) in enumerate([(64, 96), (96, 64), (64, 64), (80, 100)]):
        p = tmp_path / f"im_{i}.png"
        PIL.Image.fromarray(_smooth_image(rng, h, w)).save(p)
        paths.append(str(p))
    ds = SimpleNamespace(dbidxs=np.arange(len(paths)),
                         file_path=lambda i: paths[int(i)])

    emb = ClipEmbedding(variant="test")  # image_size 32
    kw = dict(tile_size=32, factor=0.5, min_tile_size=32, batch_size=16)
    v_h, d_h, z_h, b_h = run_multiscale_extraction(ds, emb, tiling="host", **kw)
    v_d, d_d, z_d, b_d = run_multiscale_extraction(ds, emb, tiling="device", **kw)

    np.testing.assert_array_equal(d_d, d_h)
    np.testing.assert_array_equal(z_d, z_h)
    np.testing.assert_allclose(b_d, b_h, atol=1e-4)
    cos = (v_d * v_h).sum(axis=1)
    assert cos.min() > 0.98, cos.min()


def test_plan_tiny_image():
    """Images smaller than the tile upscale to one whole-image level."""
    rng = np.random.default_rng(9)
    img = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
    host = generate_multiscale_tiling(
        PIL.Image.fromarray(img), tile_size=32, factor=0.5, min_tile_size=32
    )
    plan, tiles = tile_on_device(img, 32, 0.5, 32)
    assert plan.n_tiles == host.tiles.shape[0]
    np.testing.assert_allclose(plan.boxes, host.boxes, atol=1e-4)
    assert np.asarray(tiles).shape == (plan.n_tiles, 32, 32, 3)


def test_pipeline_batched_groups(tmp_path):
    """>= img_batch same-size images take the BATCHED tiler path (one
    (B,H,W,3) dispatch per 16 images); results must equal the host path
    image-for-image, and the batch tiler must equal the per-image tiler."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    from seesaw_tpu.ingest.device_tiling import (
        build_batch_tiler, build_tiler, make_plan,
    )
    from seesaw_tpu.ingest.pipeline import run_multiscale_extraction
    from seesaw_tpu.models.clip import ClipEmbedding

    rng = np.random.default_rng(2)
    imgs = [_smooth_image(rng, 64, 96) for _ in range(20)]
    paths = []
    for i, arr in enumerate(imgs):
        p = tmp_path / f"b_{i}.png"
        PIL.Image.fromarray(arr).save(p)
        paths.append(str(p))
    ds = SimpleNamespace(dbidxs=np.arange(len(paths)),
                         file_path=lambda i: paths[int(i)])

    emb = ClipEmbedding(variant="test")
    kw = dict(tile_size=32, factor=0.5, min_tile_size=32, batch_size=16)
    v_h, d_h, z_h, b_h = run_multiscale_extraction(ds, emb, tiling="host", **kw)
    v_d, d_d, z_d, b_d = run_multiscale_extraction(ds, emb, tiling="device", **kw)
    np.testing.assert_array_equal(d_d, d_h)
    np.testing.assert_array_equal(z_d, z_h)
    np.testing.assert_allclose(b_d, b_h, atol=1e-4)
    cos = (v_d * v_h).sum(axis=1)
    assert cos.min() > 0.98, cos.min()

    # batch tiler == per-image tiler, tile-for-tile
    plan = make_plan(64, 96, 32, 0.5, 32)
    B = 4
    stack = np.stack(imgs[:B])
    got = np.asarray(build_batch_tiler(plan, B)(jnp.asarray(stack)))
    single = build_tiler(plan)
    want = np.concatenate(
        [np.asarray(single(jnp.asarray(im))) for im in imgs[:B]]
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
