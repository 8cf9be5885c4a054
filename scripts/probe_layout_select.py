"""On-chip validation of measure-then-build layout selection on a REAL
1M exact-kNN graph (follow-up to probe_real_graph_rcm.py, which showed the
swept (512,1408,12) default cap-collides at coverage 0.375 = 12/32 on the
RCM'd real graph and LOSES to plain XLA).

Measures, on the real chip:
  1. selected layout on the cluster-sorted graph (selection only);
  2. the full product path `build_windowed_layout_auto` on the SHUFFLED
     graph (probe -> RCM relabel -> re-probe -> build), end to end;
  3. chained ms/iter of the selected layout vs the recorded defaults.

Caches the kNN graph at /tmp/knng_1m.npz (the 325 s exact-kNN build is the
expensive part, not the probe).

Run:  timeout 1800 python scripts/probe_layout_select.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N, D, K, NCLUST = 1_048_576, 64, 32, 8192
CACHE = "/tmp/knng_1m.npz"


def log(msg):
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def get_graph(rng):
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        log("kNN graph loaded from cache")
        return z["nbr"], z["w"]
    from seesaw_tpu.knn_graph import rbf_kernel
    from seesaw_tpu.ops.knn import exact_knn

    centers = rng.normal(size=(NCLUST, D)).astype(np.float32)
    cluster = np.arange(N, dtype=np.int64) % NCLUST
    V = centers[cluster] * 3.0 + rng.normal(size=(N, D)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    perm = rng.permutation(N)
    V = np.ascontiguousarray(V[perm])
    log(f"vectors ready ({N}x{D}, {NCLUST} clusters, shuffled)")
    t0 = time.time()
    nbr, dist = exact_knn(V, K, block_size=1024)
    log(f"exact kNN built in {time.time() - t0:.0f}s")
    w = rbf_kernel(0.1)(dist).astype(np.float32)
    np.savez(CACHE, nbr=nbr, w=w)
    return nbr, w


def main():
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.ops.pallas_spmv import (
        apply_order,
        build_windowed_layout_auto,
        build_windowed_layout_device,
        rcm_order,
        select_windowed_params,
        windowed_spmv,
    )

    rng = np.random.default_rng(0)
    nbr, w = get_graph(rng)

    def iter_ms(lay, name):
        dev = lay.device_arrays()

        @functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
        def chain(f, n, B, W, cap, *dev):
            def step(f, _):
                wf = windowed_spmv(f, *dev, n=n, B=B, W=W, cap=cap)
                return wf / (1.0 + wf.sum() * 0.0), None

            out, _ = jax.lax.scan(step, f, None, length=25)
            return out

        def run(f):
            return chain(f, lay.n, lay.B, lay.W, lay.cap, *dev)

        float(run(jnp.asarray(
            rng.uniform(size=N).astype(np.float32))).sum())  # compile
        times = []
        for _ in range(2):
            fi = jnp.asarray(rng.uniform(size=N).astype(np.float32))
            jax.block_until_ready(fi)
            t0 = time.time()
            s = float(run(fi).sum())
            times.append((time.time() - t0) * 1000 / 25.0)
            assert np.isfinite(s)
        ms = min(times)
        log(f"{name}: B={lay.B} W={lay.W} cap={lay.cap} "
            f"coverage {lay.coverage:.4f}, {ms:.1f} ms/iter")
        return {"B": lay.B, "W": lay.W, "cap": lay.cap,
                "coverage": round(lay.coverage, 4),
                "ms_per_iter": round(ms, 2)}

    res = {"n": N, "K": K}

    # 1. selection on the RCM'd graph (the regime get_label_prop reaches)
    t0 = time.time()
    order = rcm_order(nbr)
    res["rcm_s_host"] = round(time.time() - t0, 1)
    nbr_r, w_r, _ = apply_order(nbr, w, order)
    t0 = time.time()
    B, W, cap, cov, ceil = select_windowed_params(nbr_r)
    res["select_s"] = round(time.time() - t0, 1)
    log(f"selected (B={B}, W={W}, cap={cap}) cov={cov:.4f} ceil={ceil:.4f} "
        f"in {res['select_s']}s")
    t0 = time.time()
    lay = build_windowed_layout_device(nbr_r, w_r, B=B, W=W, cap=cap)
    res["build_s"] = round(time.time() - t0, 1)
    assert abs(lay.coverage - cov) < 1e-6, (lay.coverage, cov)
    res["rcm_selected"] = iter_ms(lay, "rcm+selected")

    # 2. the old default on the same graph, for the head-to-head
    lay_def = build_windowed_layout_device(nbr_r, w_r)
    res["rcm_default"] = iter_ms(lay_def, "rcm+default(512,1408,12)")

    # 3. full product path from the SHUFFLED graph (auto: probe -> RCM ->
    #    re-probe -> build), end to end
    t0 = time.time()
    lay_auto = build_windowed_layout_auto(nbr, w, device=True)
    res["auto_total_s"] = round(time.time() - t0, 1)
    assert lay_auto is not None and lay_auto.order is not None
    res["auto"] = iter_ms(lay_auto, "auto(shuffled->relabeled)")

    print(json.dumps(res))


if __name__ == "__main__":
    main()
