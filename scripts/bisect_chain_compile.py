"""Bisect the round-3 bench chain-compile regression (VERDICT r3 weak #2).

The bf16 rerank stage (bench.bench_rerank: 32-query chained lax.scan over the
Pallas fused query program at 10M vectors) took ~2:15 in round 2 and ~18.5 min
in round 3. Between rounds, ops/pallas_scoring.py gained a computed
vmem_limit_bytes (64MB at bf16 shapes). Suspects: (a) Mosaic compile blowup
from the larger VMEM budget, (b) tunnel remote-compile slowness/congestion,
(c) something else in the chain.

This script times, at SEESAW_BENCH_VECTORS (default 10M) bf16:
  - db build
  - single-query compile (query_program_fused)
  - chain compile (K chained queries in one lax.scan) — the suspect stage
  - 3 execution reps
for each SEESAW_VMEM_MB in the sweep, with full process restart per config
(jit caches persist in-process). Run me via the wrapper loop at the bottom:

    python scripts/bisect_chain_compile.py sweep   # prints one line per config

Writes timestamped progress to stderr. ONE TPU process: do not run
concurrently with bench/serve.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _log(msg):
    print(f"[bisect] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


def run_one(vmem_mb: str, use_pallas: bool, K: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    n_vectors = int(os.environ.get("SEESAW_BENCH_VECTORS", 10_000_000))
    t0 = time.perf_counter()
    V, valid, boxes, zoom, row_scale, n_frames = bench.build_db(n_vectors)
    jax.block_until_ready(V)
    t_build = time.perf_counter() - t0
    _log(f"db built in {t_build:.1f}s (vmem={vmem_mb} pallas={use_pallas} K={K})")

    d = V.shape[1]
    rng = np.random.default_rng(0)
    excl0 = jnp.zeros(n_frames, dtype=bool)
    run = bench._query_fn(V, valid, boxes, zoom, row_scale, use_pallas)

    t0 = time.perf_counter()
    res = run(jnp.asarray(rng.normal(size=d).astype(np.float32)), excl0)
    jax.block_until_ready(res)
    t_single = time.perf_counter() - t0
    _log(f"single-query compile+run {t_single:.1f}s")

    @jax.jit
    def chain(V_a, valid_a, boxes_a, zoom_a, rs_a, qs, excluded0):
        inner = bench._query_fn(V_a, valid_a, boxes_a, zoom_a, rs_a, use_pallas)

        def body(excl, qv):
            r = inner(qv, excl)
            excl = excl.at[jnp.maximum(r.frame_ids[0], 0)].set(True)
            return excl, (r.frame_ids, r.frame_scores)

        _, out = jax.lax.scan(body, excluded0, qs)
        return out[1].sum()

    def fresh_qs():
        q_arr = jnp.asarray(rng.normal(size=(K, d)).astype(np.float32))
        float(q_arr[0, 0])
        return q_arr

    t0 = time.perf_counter()
    float(chain(V, valid, boxes, zoom, row_scale, fresh_qs(), excl0))
    t_chain_compile = time.perf_counter() - t0
    _log(f"chain compile+first-run {t_chain_compile:.1f}s")

    reps = []
    for _ in range(3):
        qs = fresh_qs()
        t0 = time.perf_counter()
        float(chain(V, valid, boxes, zoom, row_scale, qs, excl0))
        reps.append(time.perf_counter() - t0)
    _log(f"reps: {[round(r, 2) for r in reps]} -> {min(reps)*1000/K:.1f} ms/query")
    return {
        "vmem_mb": vmem_mb,
        "use_pallas": use_pallas,
        "K": K,
        "t_build_s": round(t_build, 1),
        "t_single_s": round(t_single, 1),
        "t_chain_compile_s": round(t_chain_compile, 1),
        "device_ms": round(min(reps) * 1000 / K, 2),
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        vmem_mb = sys.argv[2]
        use_pallas = sys.argv[3] == "1"
        K = int(sys.argv[4])
        if vmem_mb != "auto":
            os.environ["SEESAW_VMEM_MB"] = vmem_mb
        print(json.dumps(run_one(vmem_mb, use_pallas, K)), flush=True)
        return

    # sweep: fresh process per config so jit/Mosaic caches don't leak
    configs = [
        ("auto", True, 32),   # current formula (64MB at bf16 shapes) = r3 bench
        ("24", True, 32),     # just above the 16MB double-buffer need
        ("128", True, 32),    # full v5e VMEM
        ("auto", False, 32),  # XLA path (no Pallas) for comparison
        ("auto", True, 8),    # does compile scale with K? (scan: shouldn't)
    ]
    results = []
    for vmem_mb, use_pallas, K in configs:
        _log(f"=== config vmem={vmem_mb} pallas={use_pallas} K={K} ===")
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one", vmem_mb,
             "1" if use_pallas else "0", str(K)],
            capture_output=True, text=True, timeout=1500,
        )
        wall = time.perf_counter() - t0
        sys.stderr.write(p.stderr)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            r = {"error": line[:200], "rc": p.returncode}
        r["wall_s"] = round(wall, 1)
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"sweep": results}), flush=True)


if __name__ == "__main__":
    main()
