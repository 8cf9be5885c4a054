"""Windowed kernel application (pooling) over spatial maps.

jnp equivalents of the reference's `ManualPooling` / `SlidingWindow`
(`/root/reference/seesaw/models/embeddings.py:199-378`): apply an arbitrary
kernel to every (kernel_size x kernel_size) window at the given stride,
optionally centering the window grid when the input doesn't divide evenly.
Used for dense patch embeddings (224-kernel, 112-stride sliding CLIP) and
validated against average pooling (the reference's `tests/test_pooling.py`
strategy).

Window offsets are Python ints at trace time, so the gather is static and
the kernel is vmapped over the window batch — the whole map pools in one
compiled call.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _window_grid(h: int, w: int, k: int, stride: int, center: bool):
    iis = list(range(0, h - k + 1, stride))
    jjs = list(range(0, w - k + 1, stride))
    if center and iis and jjs:
        off_h = (h - (iis[-1] + k)) // 2
        off_w = (w - (jjs[-1] + k)) // 2
        iis = [i + off_h for i in iis]
        jjs = [j + off_w for j in jjs]
    return iis, jjs


def manual_pooling(
    x: jnp.ndarray,
    kernel: Callable[[jnp.ndarray], jnp.ndarray],
    kernel_size: int,
    stride: Optional[int] = None,
    center: bool = False,
) -> jnp.ndarray:
    """Apply ``kernel`` to each window of x (..., H, W).

    The kernel maps (..., k, k) -> (...); output shape is (..., nH, nW) —
    same contract as the reference ManualPooling."""
    stride = stride or kernel_size
    h, w = x.shape[-2:]
    iis, jjs = _window_grid(h, w, kernel_size, stride, center)

    windows = jnp.stack(
        [
            jnp.stack([x[..., i : i + kernel_size, j : j + kernel_size] for j in jjs],
                      axis=0)
            for i in iis
        ],
        axis=0,
    )  # (nH, nW, ..., k, k)
    flat = windows.reshape((-1,) + windows.shape[2:])
    out = jax.vmap(kernel)(flat)  # (nH*nW, ...)
    out = out.reshape((len(iis), len(jjs)) + out.shape[1:])
    # move window grid to the trailing axes: (..., nH, nW)
    perm = tuple(range(2, out.ndim)) + (0, 1)
    return jnp.transpose(out, perm)


def sliding_window(
    x: jnp.ndarray,
    kernel: Callable[[jnp.ndarray], jnp.ndarray],
    kernel_size: int,
    stride: Optional[int] = None,
    center: bool = False,
) -> jnp.ndarray:
    """Batched variant of manual_pooling for (1, C, H, W) inputs: windows are
    collected into one batch and the kernel is applied once (the reference's
    SlidingWindow fast path for whole-model kernels)."""
    assert x.ndim == 4 and x.shape[0] == 1
    return manual_pooling(x[0], kernel, kernel_size, stride, center)[None]


def avg_pool2d(x: jnp.ndarray, kernel_size: int, stride: Optional[int] = None) -> jnp.ndarray:
    """Plain average pooling over (..., H, W) — the parity oracle."""
    stride = stride or kernel_size
    return manual_pooling(
        x, lambda w: w.mean(axis=(-2, -1)), kernel_size, stride
    )
