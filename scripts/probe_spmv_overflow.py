"""Decompose windowed-SpMV iteration cost: kernel floor vs overflow path.

The (B, W, cap) sweep (probe_spmv_params.py) showed iteration time tracks
COVERAGE, not streamed slot count — e.g. cap 8->4 at fixed W=2048 cuts slots
2x but triples the time because coverage falls 0.956->0.727. Hypothesis: the
XLA overflow path (scalar gather + scatter-add, ~9ns/element each) costs
~18-20 ns/edge and dominates; the lane-shuffle kernel is near-free at these
sizes. This probe measures:
  A. all-local graphs (coverage 1.0) — the pure kernel floor per layout;
  B. standalone overflow formulations at 1.5M edges — plain scatter-add,
     sorted-src scatter-add (indices_are_sorted), segment_sum.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from seesaw_tpu.ops.pallas_spmv import build_windowed_layout_device
from seesaw_tpu.ops.propagation import propagate_windowed

N, K = 1_048_576, 32


def build_graph(p_local: float, spread: int = 400):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    base = jnp.arange(N, dtype=jnp.int32)[:, None]
    local = jnp.clip(
        base + jax.random.randint(k1, (N, K), -spread, spread + 1,
                                  dtype=jnp.int32),
        0, N - 1,
    )
    rand = jax.random.randint(k2, (N, K), 0, N, dtype=jnp.int32)
    nbr = jnp.where(jax.random.uniform(k3, (N, K)) < p_local, local, rand)
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
    prior = jax.random.uniform(jax.random.PRNGKey(5), (N,))
    labels = jnp.zeros(N).at[jnp.arange(0, N, N // 32)].set(1.0)
    is_labeled = jnp.zeros(N, dtype=bool).at[
        jnp.arange(0, N, N // 64)
    ].set(True)

    print("A. kernel floor (all-local graph, coverage ~1.0)")
    nbr, w = build_graph(1.0)
    degree = w.sum(axis=1)
    for B, W, cap in [(1024, 2048, 8), (512, 1280, 8), (512, 2048, 8),
                      (512, 1280, 4)]:
        layout = build_windowed_layout_device(nbr, w, B=B, W=W, cap=cap)
        ms = time_iters(layout, degree, prior, labels, is_labeled)
        print(f"  B={B:>4} W={W:>4} cap={cap} cov={layout.coverage:.4f} "
              f"-> {ms:.2f} ms/iter", flush=True)
        del layout

    print("B. standalone overflow formulations (M=1.5M edges)")
    M = 1_500_000
    km = jax.random.split(jax.random.PRNGKey(11), 3)
    src_sorted = jnp.sort(
        jax.random.randint(km[0], (M,), 0, N, dtype=jnp.int32))
    src_rand = jax.random.permutation(km[2], src_sorted)
    dst = jax.random.randint(km[1], (M,), 0, N, dtype=jnp.int32)
    wv = jax.random.uniform(km[1], (M,))
    f = prior

    @jax.jit
    def ovf_plain(f, src, dst, wv):
        g = wv * f[dst]
        return jnp.zeros(N, jnp.float32).at[src].add(g)

    @jax.jit
    def ovf_sorted(f, src, dst, wv):
        g = wv * f[dst]
        return jnp.zeros(N, jnp.float32).at[src].add(
            g, indices_are_sorted=True)

    @jax.jit
    def ovf_seg(f, src, dst, wv):
        g = wv * f[dst]
        return jax.ops.segment_sum(g, src, num_segments=N,
                                   indices_are_sorted=True)

    @jax.jit
    def gather_only(f, dst, wv):
        return (wv * f[dst]).sum()

    for name, fn, args in [
        ("gather only", gather_only, (f, dst, wv)),
        ("plain scatter (rand src)", ovf_plain, (f, src_rand, dst, wv)),
        ("plain scatter (sorted src)", ovf_plain, (f, src_sorted, dst, wv)),
        ("sorted-hint scatter", ovf_sorted, (f, src_sorted, dst, wv)),
        ("segment_sum sorted", ovf_seg, (f, src_sorted, dst, wv)),
    ]:
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            out = fn(*args)
            jax.block_until_ready(out)
            float(out.reshape(-1)[0])
            ts.append((time.monotonic() - t0) * 1000.0)
        print(f"  {name:>28}: {min(ts):.2f} ms "
              f"({min(ts) * 1e6 / M:.1f} ns/edge)", flush=True)


if __name__ == "__main__":
    main()
