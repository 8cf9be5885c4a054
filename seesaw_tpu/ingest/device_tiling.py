"""On-device multiscale tiling: the pyramid + strided grids as one XLA program.

Host tiling (tiling.py — PIL resize + numpy window views) costs ~100ms/image
and bounds ingest throughput (bench round 2: host decode+tile 63 img/s vs
8-chip encode ~5100 img/s). Geometry for a given image SIZE is static, so
per size bucket we precompute a TilePlan on the host (levels, per-level
shapes, tile boxes/zoom — identical math to tiling.pyramid_levels /
strided_tiles) and jit one program that takes the decoded uint8 image and
produces ALL CLIP-normalized tiles: bilinear pyramid resizes + 4-shift grid
slicing + /255 + mean/std, with nothing but the raw image crossing
host->device. Tiles stay device-resident and feed the ViT batches directly.

The host keeps only JPEG decode — its true residual role.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from .tiling import pyramid_levels


@dataclass(frozen=True)
class GridSpec:
    shift_y: int
    shift_x: int
    nh: int
    nw: int


@dataclass(frozen=True)
class LevelSpec:
    zoom_level: int
    sf: float  # scale factor
    th: int  # scaled height
    tw: int  # scaled width
    grids: Tuple[GridSpec, ...]


@dataclass(frozen=True, eq=False)  # id-hash: one cached instance per size
class TilePlan:
    """Static tiling layout for one (height, width) image size."""

    height: int
    width: int
    tile_size: int
    levels: Tuple[LevelSpec, ...]
    boxes: np.ndarray  # (T, 4) float32, original-image pixels
    zoom_level: np.ndarray  # (T,) int32
    scale_factor: np.ndarray  # (T,) float32
    max_zoom_level: int

    @property
    def n_tiles(self) -> int:
        return self.boxes.shape[0]


@functools.lru_cache(maxsize=256)
def make_plan(height: int, width: int, tile_size: int = 224,
              factor: float = 0.5, min_tile_size: int = 224) -> TilePlan:
    """Host-side geometry, matching tiling.generate_multiscale_tiling."""
    size = min(width, height)
    factors = pyramid_levels(size, factor=factor, abs_min=tile_size)
    stride = tile_size // 2

    levels: List[LevelSpec] = []
    boxes_acc, zoom_acc, sf_acc = [], [], []
    n = len(factors)
    for lvl_idx, sf in enumerate(factors):
        zoom_level = lvl_idx + 1
        effective = tile_size / sf
        if effective < min_tile_size and lvl_idx != n - 1:
            continue
        tw = max(math.floor(width * sf), tile_size)
        th = max(math.floor(height * sf), tile_size)
        grids = []
        lvl_boxes = []
        # shift order matches tiling.strided_tiles: (x-shift i, y-shift j)
        for i in (0, 1):
            for j in (0, 1):
                sy, sx = stride * j, stride * i
                nh = (th - sy) // tile_size
                nw = (tw - sx) // tile_size
                if nh <= 0 or nw <= 0:
                    continue
                grids.append(GridSpec(shift_y=sy, shift_x=sx, nh=nh, nw=nw))
                jj, ii = np.meshgrid(np.arange(nw), np.arange(nh))
                x1 = (jj.reshape(-1) * tile_size + sx).astype(np.float32)
                y1 = (ii.reshape(-1) * tile_size + sy).astype(np.float32)
                lvl_boxes.append(np.stack([x1, y1, x1 + tile_size, y1 + tile_size], 1))
        if not grids:
            continue
        levels.append(LevelSpec(zoom_level=zoom_level, sf=sf, th=th, tw=tw,
                                grids=tuple(grids)))
        b = np.concatenate(lvl_boxes) / sf  # back to original pixels
        boxes_acc.append(b.astype(np.float32))
        zoom_acc.append(np.full(b.shape[0], zoom_level, dtype=np.int32))
        sf_acc.append(np.full(b.shape[0], sf, dtype=np.float32))

    zoom = np.concatenate(zoom_acc)
    return TilePlan(
        height=height, width=width, tile_size=tile_size, levels=tuple(levels),
        boxes=np.concatenate(boxes_acc), zoom_level=zoom,
        scale_factor=np.concatenate(sf_acc), max_zoom_level=int(zoom.max()),
    )


def _tile_body(plan: TilePlan):
    """Pure uint8 (H, W, 3) -> (T, ts, ts, 3) CLIP-normalized tile function
    (traceable; jitted/vmapped by the builders below)."""
    import jax
    import jax.numpy as jnp

    from ..models.preprocess import normalize_pixels

    ts = plan.tile_size

    def tile(img_u8):
        img = img_u8.astype(jnp.float32) / 255.0
        out = []
        for lvl in plan.levels:
            scaled = jax.image.resize(
                img, (lvl.th, lvl.tw, 3), method="bilinear", antialias=True
            )
            for g in lvl.grids:
                sub = jax.lax.dynamic_slice(
                    scaled, (g.shift_y, g.shift_x, 0),
                    (g.nh * ts, g.nw * ts, 3),
                )
                tiles = (
                    sub.reshape(g.nh, ts, g.nw, ts, 3)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(g.nh * g.nw, ts, ts, 3)
                )
                out.append(tiles)
        return normalize_pixels(jnp.concatenate(out, axis=0))

    return tile


@functools.lru_cache(maxsize=256)
def build_tiler(plan: TilePlan):
    """Jitted uint8 (H, W, 3) image -> (T, ts, ts, 3) CLIP-normalized f32
    tiles, all on device."""
    import jax

    return jax.jit(_tile_body(plan))


@functools.lru_cache(maxsize=256)
def build_batch_tiler(plan: TilePlan, batch: int):
    """Jitted uint8 (B, H, W, 3) -> (B*T, ts, ts, 3) normalized tiles.

    Batching MANY images into one dispatch is what makes device tiling win
    through a high-latency link: a per-image dispatch pays the link's
    round-trip every ~1MB image, a B-image dispatch amortizes it B-fold
    (one contiguous upload, one program)."""
    import jax

    body = _tile_body(plan)

    def run(imgs_u8):
        tiles = jax.vmap(body)(imgs_u8)  # (B, T, ts, ts, 3)
        return tiles.reshape(batch * plan.n_tiles, plan.tile_size,
                             plan.tile_size, 3)

    return jax.jit(run)


def tile_on_device(img_u8: np.ndarray, tile_size: int = 224,
                   factor: float = 0.5, min_tile_size: int = 224):
    """(plan, device_tiles) for one decoded RGB image."""
    import jax.numpy as jnp

    h, w = img_u8.shape[:2]
    plan = make_plan(h, w, tile_size, factor, min_tile_size)
    tiles = build_tiler(plan)(jnp.asarray(img_u8))
    return plan, tiles
