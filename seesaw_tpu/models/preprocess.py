"""CLIP image preprocessing.

Matches the reference's transform (`/root/reference/seesaw/models/
embeddings.py:405-419`): bicubic resize so the short side equals the target,
center crop, scale to [0,1], normalize with CLIP mean/std. Two paths:

- `preprocess_image`: PIL/host path for one-off images (serving).
- `normalize_pixels` / `resize_batch_jax`: jnp path used inside the
  ingestion pipeline, where resize+tile+normalize fuse into the device
  program feeding the ViT (images arrive as uint8 device arrays).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .clip import CLIP_MEAN, CLIP_STD


def preprocess_image(image, target: int = 224) -> np.ndarray:
    """PIL image or HWC uint8 array -> (target, target, 3) float32 normalized."""
    from PIL import Image

    if not isinstance(image, Image.Image):
        image = Image.fromarray(np.asarray(image))
    if image.mode != "RGB":
        image = image.convert("RGB")
    w, h = image.size
    # torchvision T.Resize semantics (the reference transform): short side ==
    # target, long side truncated — int(target * long / short), not rounded
    if w <= h:
        nw, nh = target, int(target * h / w)
    else:
        nw, nh = int(target * w / h), target
    image = image.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - target) // 2, (nh - target) // 2
    image = image.crop((left, top, left + target, top + target))
    arr = np.asarray(image, dtype=np.float32) / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


def normalize_pixels(pixels01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float pixels (..., 3) -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (pixels01 - mean) / std


def resize_batch_jax(images: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Batched bicubic resize on device: (B, H, W, C) -> (B, h, w, C)."""
    B, _, _, C = images.shape
    return jax.image.resize(
        images, (B, out_hw[0], out_hw[1], C), method="bicubic", antialias=True
    )
