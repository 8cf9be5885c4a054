"""Sweep the windowed-SpMV layout parameters (B, W, cap) on the real chip.

The kernel streams NB*UROWS*EROWS*128 slab slots per iteration regardless of
how many hold real edges; with K=32 edges spread over W/128 urows at cap
slots each, slot utilization is K / (UROWS*cap) — 25% at the r4 defaults
(B=1024, W=2048, cap=8). Smaller (W, cap) cut streamed slots linearly but
push more edges to the XLA-gather overflow path (~9ns/edge), so the optimum
is empirical. The graph is the bench's post-RCM regime (97% of edges within
+-400 of the diagonal) at 1M x K=32; iteration time is measured through
`propagate_windowed` fixed-iteration runs, which include the overflow cost.

Run: one TPU process at a time; ~2-3 min per config (device layout build +
kernel compile + 2x50 iters).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from seesaw_tpu.ops.pallas_spmv import build_windowed_layout_device
from seesaw_tpu.ops.propagation import propagate_windowed

N, K = 1_048_576, 32


def build_graph():
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


def main():
    nbr, w = build_graph()
    degree = w.sum(axis=1)
    prior = jax.random.uniform(jax.random.PRNGKey(5), (N,))
    labels = jnp.zeros(N).at[jnp.arange(0, N, N // 32)].set(1.0)
    is_labeled = jnp.zeros(N, dtype=bool).at[jnp.arange(0, N, N // 64)].set(True)
    jax.block_until_ready((degree, prior))

    grid = [
        (1024, 2048, 8),   # r4 default (baseline)
        (1024, 2048, 6),
        (1024, 2048, 4),
        (1024, 1536, 8),
        (1024, 1536, 6),
        (1024, 1280, 8),
        (512, 1280, 8),
        (2048, 3072, 6),
        (1024, 1024, 8),
    ]
    print(f"{'B':>5} {'W':>5} {'cap':>3} {'coverage':>8} {'ms/iter':>8} "
          f"{'slots/edge':>10}")
    results = []
    for B, W, cap in grid:
        try:
            t0 = time.monotonic()
            layout = build_windowed_layout_device(nbr, w, B=B, W=W, cap=cap)
            build_s = time.monotonic() - t0

            def run():
                t0 = time.monotonic()
                res = propagate_windowed(
                    layout, degree, prior, labels, is_labeled, prior,
                    reg_lambda=1.0, max_iter=50, epsilon=0.0,
                    dispatch_iters=50,
                )
                jax.block_until_ready(res.scores)
                float(res.scores[0])
                return (time.monotonic() - t0) * 1000.0

            run()  # compile
            ms = min(run() for _ in range(2)) / 50.0
            slots = (W // 128) * cap / K
            print(f"{B:>5} {W:>5} {cap:>3} {layout.coverage:>8.4f} "
                  f"{ms:>8.2f} {slots:>10.2f}  (build {build_s:.1f}s)",
                  flush=True)
            results.append((ms, B, W, cap, layout.coverage))
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            print(f"{B:>5} {W:>5} {cap:>3} FAILED: {type(e).__name__}: {e}",
                  flush=True)
        del layout
    results.sort()
    ms, B, W, cap, cov = results[0]
    print(f"\nbest: B={B} W={W} cap={cap} -> {ms:.2f} ms/iter "
          f"(coverage {cov:.4f})")


if __name__ == "__main__":
    main()
