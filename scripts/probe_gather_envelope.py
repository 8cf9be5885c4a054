"""Map Mosaic's supported take_along_axis envelope + throughput (TPU).

Stage J showed XLA's 32M-scalar gather runs at ~0.5GB/s (280ms/iter for the
1M-tile propagation SpMV). Mosaic supports *intra-tile* gathers — an (8,128)
take_along_axis compiled; larger shapes crashed the compile helper. If a
usefully-sized lane-gather compiles (src (B,128), idx (B,K)), a windowed
SpMV kernel can gather from a VMEM-resident f window at lane speed.

Run: python scripts/probe_gather_envelope.py   (ONE TPU process rule)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)

    def try_axis1(B, S, K, label=""):
        """src (B, S), idx (B, K) int32 in [0, S): out[b,k] = src[b, idx[b,k]]."""
        f = jnp.asarray(rng.normal(size=(B, S)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, S, (B, K)), jnp.int32)

        def kernel(f_ref, idx_ref, out_ref):
            out_ref[...] = jnp.take_along_axis(f_ref[...], idx_ref[...], axis=1)

        try:
            out = pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
            )(f, idx)
            want = np.take_along_axis(np.asarray(f), np.asarray(idx), axis=1)
            ok = np.allclose(np.asarray(out), want)
            print(f"axis1 src=({B},{S}) idx=({B},{K}) {label}: OK correct={ok}",
                  flush=True)
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"axis1 src=({B},{S}) idx=({B},{K}) {label}: FAIL {msg}",
                  flush=True)
            return False

    # envelope sweep
    cases = [
        (8, 128, 128), (8, 128, 32), (64, 128, 128), (256, 128, 128),
        (1024, 128, 128), (1024, 128, 32), (8, 256, 128), (8, 512, 128),
        (128, 256, 128), (1024, 256, 32),
    ]
    supported = []
    for B, S, K in cases:
        if try_axis1(B, S, K):
            supported.append((B, S, K))

    if not supported:
        print("no supported shapes beyond none — dead end", flush=True)
        return

    # throughput probe on the biggest supported shape, embedded in a real
    # windowed-SpMV-like kernel shape: grid over blocks, W-window broadcast
    B, S, K = max(supported, key=lambda t: t[0] * t[2])
    print(f"throughput probe on src=({B},{S}) idx=({B},{K})", flush=True)

    import functools

    N = 1_000_000
    reps_rows = N // B

    f = jnp.asarray(rng.normal(size=(reps_rows, B, S)), jnp.float32)  # big src
    idx = jnp.asarray(rng.integers(0, S, (reps_rows, B, K)), jnp.int32)

    def kernel(f_ref, idx_ref, out_ref):
        g = jnp.take_along_axis(f_ref[0], idx_ref[0], axis=1)  # (B, K)
        out_ref[0] = g.sum(axis=1, keepdims=True).astype(jnp.float32)

    @jax.jit
    def run(f, idx):
        out = pl.pallas_call(
            kernel,
            grid=(reps_rows,),
            in_specs=[
                pl.BlockSpec((1, B, S), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, B, K), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((reps_rows, B, 1), jnp.float32),
        )(f.reshape(reps_rows, B, S), idx.reshape(reps_rows, B, K))
        return out.sum()

    try:
        float(run(f, idx))
        best = float("inf")
        for i in range(3):
            fx = f * (1.0 + 1e-6 * i)
            jax.block_until_ready(fx)
            t0 = time.perf_counter()
            float(run(fx, idx))
            best = min(best, time.perf_counter() - t0)
        n_gathered = reps_rows * B * K
        print(f"gather throughput: {best*1000:.2f} ms for {n_gathered/1e6:.1f}M "
              f"elements -> {n_gathered/best/1e9:.2f} G elem/s", flush=True)
    except Exception as e:
        print(f"throughput probe FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
