"""Micro-probe: the windowed-SpMV Mosaic kernel primitive (TPU).

Pattern under test, per vertex block of B=1024 (c=8 edge slots per vertex
per window row, W=1024 window = 8 f-rows):
  for u in 0..7:  out_u = take_along_axis(broadcast(f_win[u]), c_idx_u)
  acc += w_u * out_u;  per-vertex sum at the end.
Estimated ~20 ms/iter at 1M x K=32 vs XLA's 287 ms scalar gather.

Run alone (ONE TPU process rule).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1_000_000
    B, W, c = 1024, 1024, 8
    UROWS = W // 128          # 8 window rows
    EROWS = B * c // 128      # 64 tile-rows of edge slots per u
    NB = N // B               # 976 blocks
    R = (N + 127) // 128      # f rows

    rng = np.random.default_rng(0)
    f2d = jnp.asarray(rng.normal(size=(R, 128)), jnp.float32)
    cidx = jnp.asarray(rng.integers(0, 128, (NB, UROWS, EROWS, 128)), jnp.int32)
    wmat = jnp.asarray(rng.uniform(0.1, 1.0, (NB, UROWS, EROWS, 128)), jnp.float32)
    jax.block_until_ready((f2d, cidx, wmat))

    def kernel(f_ref, idx_ref, w_ref, out_ref):
        # f_ref: (UROWS, 128) window; idx/w: (1, UROWS, EROWS, 128).
        # Mosaic supports lane reshapes/strided slices poorly — emit the
        # edge-layout partials; the per-vertex 8-lane sum happens in XLA.
        acc = jnp.zeros((EROWS, 128), jnp.float32)
        for u in range(UROWS):
            src = jnp.broadcast_to(f_ref[u], (EROWS, 128))
            g = jnp.take_along_axis(src, idx_ref[0, u], axis=1)
            acc = acc + w_ref[0, u] * g
        out_ref[0] = acc

    grid = (NB,)

    @jax.jit
    def run(f2d, cidx, wmat):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((UROWS, 128), lambda i: (i % (R // UROWS), 0)),
                pl.BlockSpec((1, UROWS, EROWS, 128), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, UROWS, EROWS, 128), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, EROWS, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, EROWS, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024,
            ),
        )(f2d, cidx, wmat)
        # per-vertex sum over the c=8 edge lanes (XLA, dense)
        wf = out.reshape(NB, EROWS, 16, c).sum(-1)
        return wf.sum()

    try:
        float(run(f2d, cidx, wmat))
    except Exception as e:
        print(f"KERNEL FAILED: {str(e)[:500]}", flush=True)
        return
    best = float("inf")
    for i in range(3):
        fx = f2d * (1.0 + 1e-6 * i)
        jax.block_until_ready(fx)
        t0 = time.perf_counter()
        float(run(fx, cidx, wmat))
        best = min(best, time.perf_counter() - t0)
    n_slots = NB * UROWS * EROWS * 128
    print(
        f"windowed spmv kernel: {best*1000:.2f} ms for {n_slots/1e6:.0f}M "
        f"edge slots ({N}x{n_slots//N} layout; K=32 equivalent with 2x pad)",
        flush=True,
    )


if __name__ == "__main__":
    main()
