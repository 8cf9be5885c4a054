"""Probe: what does the 10M slab-byte roof cost in coverage, and what
would compact cidx storage (int16/int8 lane indices) buy back?

At 10M tiles the auto slot budget shrinks to 80 slots/vertex
(_AUTO_SLAB_BYTES 6GB / 8 bytes-per-slot), which caps the selected layout
at coverage 0.9564 vs the graph's 0.970 in-window ceiling — ~4.3M extra
edges through the ~100 ms/iter routed-overflow term. cidx values are lane
indices (< 128), so the slab int could be int16 (6 B/slot -> 107 slots)
or int8 (5 B/slot -> 128 slots). This probe measures the exact
coverage(cap) curve of every candidate (B, W) on the 10M generator's 1M
row prefix (one `_occ_hist` dispatch each) and reports the best
achievable coverage at each bytes-per-slot, i.e. the payoff celing of a
compact-cidx kernel BEFORE building one.

Run on the real chip (the ONE TPU process):
    python scripts/probe_slot_budget_10M.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import jax.random as jr

    import bench
    from seesaw_tpu.ops.pallas_spmv import (
        _AUTO_SLAB_BYTES,
        _layout_candidates,
        _occ_hist,
    )

    # same generator as probe_graph_10M / bench._window_local_graph, same
    # frame rounding; occupancy is translation-invariant so the 1M row
    # prefix stands in for the full graph (exactly like select_windowed_params)
    n_frames = (10_000_000 // bench.TILES // 1024) * 1024
    n_tiles = n_frames * bench.TILES
    K = 32
    SAMPLE = 1_048_576
    k1, k2, k3, k4 = jr.split(jr.PRNGKey(7), 4)
    base = jnp.arange(SAMPLE, dtype=jnp.int32)[:, None]
    local = jnp.clip(
        base + jr.randint(k1, (SAMPLE, K), -400, 401, dtype=jnp.int32),
        0, n_tiles - 1,
    )
    rand = jr.randint(k2, (SAMPLE, K), 0, n_tiles, dtype=jnp.int32)
    nbr = jnp.where(jr.uniform(k3, (SAMPLE, K)) < 0.97, local, rand)
    jax.block_until_ready(nbr)
    print(f"sample={SAMPLE} of n_tiles={n_tiles} K={K} "
          f"device={jax.devices()[0].platform}", flush=True)

    # full coverage(cap) curve for every candidate (B, W) at UNLIMITED cap
    curves = {}
    for B, W, _ in _layout_candidates(SAMPLE, K, budget=10_000):
        if (B, W) in curves:
            continue
        t0 = time.perf_counter()
        hist, total = jax.device_get(_occ_hist(nbr, B, W))
        total = max(int(total), 1)
        cum = np.cumsum(hist[:K]) / total
        curves[(B, W)] = cum
        print(f"(B={B:4d}, W={W:5d}) ceiling={cum[-1]:.4f}  "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

    edges_total = n_tiles * K
    print(f"\nbest coverage at the {_AUTO_SLAB_BYTES / 1e9:.0f}GB roof, "
          f"n={n_tiles} ({edges_total / 1e6:.0f}M edges):", flush=True)
    for label, bytes_per_slot in (("int32 cidx (today)", 8),
                                  ("int16 cidx", 6),
                                  ("int8  cidx", 5)):
        slot_budget = max(16, int(_AUTO_SLAB_BYTES // (bytes_per_slot
                                                       * n_tiles)))
        best = None
        for (B, W), cum in curves.items():
            urows = W // 128
            cap = min(slot_budget // urows, K)
            while cap > 1 and (B * cap) % 128:
                cap -= 1
            if cap < 1 or (B * cap) % 128:
                continue
            cov = float(cum[cap - 1])
            key = (-cov, urows * cap, W)
            if best is None or key < best[0]:
                best = (key, (B, W, cap, cov))
        B, W, cap, cov = best[1]
        ovf_m = (1.0 - cov) * edges_total / 1e6
        print(f"  {label}: {slot_budget:4d} slots -> (B={B}, W={W}, "
              f"cap={cap}) coverage={cov:.4f}  overflow={ovf_m:.1f}M edges",
              flush=True)


if __name__ == "__main__":
    main()
