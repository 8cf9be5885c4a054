"""Windowed-SpMV layout sweep on the BENCH-regime graph (97% local edges,
spread 400, 3% uniform-random): find the (B, W, cap) minimizing ms/iter.

probe_spmv_overflow.py decomposed the cost: at coverage ~0.98 the kernel
floor is ~12 ms/iter (1M x K=32); inline overflow costs ~10-15 ns/edge; the
slab slots themselves are near-free. The production layout (B=1024, W=2048,
cap=8) sits at coverage 0.9564 — the ~1.4% gap to the 0.97 random-edge
ceiling is cap COLLISIONS (local edges concentrate ~5/window-row; Poisson
tail beyond cap=8). Raising cap converts ~0.45M overflow edges (~5 ms) into
near-free slots (~+0.7 ms streaming per +4 cap).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from seesaw_tpu.ops.pallas_spmv import build_windowed_layout_device
from seesaw_tpu.ops.propagation import propagate_windowed

N, K = 1_048_576, 32


def bench_graph():
    """Same generator as bench.py _window_local_graph."""
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    base = jnp.arange(N, dtype=jnp.int32)[:, None]
    local = jnp.clip(
        base + jax.random.randint(k1, (N, K), -400, 401, dtype=jnp.int32),
        0, N - 1,
    )
    rand = jax.random.randint(k2, (N, K), 0, N, dtype=jnp.int32)
    nbr = jnp.where(jax.random.uniform(k3, (N, K)) < 0.97, local, rand)
    w = jax.random.uniform(k4, (N, K), minval=0.1, maxval=1.0)
    return nbr, w


def time_iters(layout, degree, prior, labels, is_labeled):
    def run():
        t0 = time.monotonic()
        res = propagate_windowed(
            layout, degree, prior, labels, is_labeled, prior,
            reg_lambda=1.0, max_iter=50, epsilon=0.0, dispatch_iters=50,
        )
        jax.block_until_ready(res.scores)
        float(res.scores[0])
        return (time.monotonic() - t0) * 1000.0

    run()
    return min(run() for _ in range(2)) / 50.0


def main():
    nbr, w = bench_graph()
    degree = w.sum(axis=1)
    prior = jax.random.uniform(jax.random.PRNGKey(5), (N,))
    labels = jnp.zeros(N).at[jnp.arange(0, N, N // 32)].set(1.0)
    is_labeled = jnp.zeros(N, dtype=bool).at[
        jnp.arange(0, N, N // 64)
    ].set(True)

    for B, W, cap in [
        (1024, 2048, 8),   # current default (baseline)
        (1024, 2048, 12),
        (1024, 2048, 16),
        (1024, 1920, 12),  # min window covering the local spread
        (512, 1408, 12),
        (512, 1408, 16),
    ]:
        layout = build_windowed_layout_device(nbr, w, B=B, W=W, cap=cap)
        slab_gb = layout.slab_bytes / 1e9
        ms = time_iters(layout, degree, prior, labels, is_labeled)
        print(f"B={B:>4} W={W:>4} cap={cap:>2} cov={layout.coverage:.4f} "
              f"slab={slab_gb:.2f}GB -> {ms:.2f} ms/iter", flush=True)
        del layout


if __name__ == "__main__":
    main()
