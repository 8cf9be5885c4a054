"""Windowed-SpMV coverage on a REAL exact-kNN graph at 1M, before/after RCM.

The bench's propagation graph is window-local BY CONSTRUCTION (97% edges
within +-400 of the diagonal); the claim "real kNN graphs reach this regime
after reverse-Cuthill-McKee relabeling" (README/pallas_spmv docstring) was
only ever tested at toy sizes. This probe builds the real thing at serving
scale:

  1. 1M clustered unit vectors (8192 Gaussian clusters — CLIP embeddings of
     a real corpus cluster the same way), vertex order SHUFFLED so the
     initial labeling carries no locality at all;
  2. exact kNN K=32 through our own builder (`ops.knn.exact_knn`, blocked
     MXU scan — the product path used by knn_graph.KNNGraph.build);
  3. RBF edge weights (knn_graph.rbf_kernel), the serving weighting;
  4. windowed layout coverage + chained-iteration device time for three
     vertex orders: shuffled (worst case), cluster-sorted (what the
     multiscale tile order gives naturally: tiles of one frame/cluster are
     adjacent), and rcm_order (the documented serving relabeling).

Run on the real chip:  timeout 1800 python scripts/probe_real_graph_rcm.py
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N, D, K, NCLUST = 1_048_576, 64, 32, 8192


def log(msg):
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.knn_graph import rbf_kernel
    from seesaw_tpu.ops.knn import exact_knn
    from seesaw_tpu.ops.pallas_spmv import (
        apply_order,
        build_windowed_layout_device,
        rcm_order,
        windowed_spmv,
    )

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(NCLUST, D)).astype(np.float32)
    cluster = np.arange(N, dtype=np.int64) % NCLUST
    V = centers[cluster] * 3.0 + rng.normal(size=(N, D)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    # shuffled vertex order: the adjacency must carry NO positional locality
    perm = rng.permutation(N)
    V = np.ascontiguousarray(V[perm])
    cluster = cluster[perm]
    log(f"vectors ready ({N}x{D}, {NCLUST} clusters, shuffled)")

    t0 = time.time()
    nbr, dist = exact_knn(V, K, block_size=1024)
    t_knn = time.time() - t0
    intra = float(
        (cluster[nbr] == cluster[:, None]).mean()
    )  # sanity: kNN should be dominated by same-cluster edges
    log(f"exact kNN built in {t_knn:.0f}s; intra-cluster edge fraction "
        f"{intra:.3f}")

    w = rbf_kernel(0.1)(dist).astype(np.float32)

    def coverage_and_iter(nbr_o, w_o, name):
        lay = build_windowed_layout_device(nbr_o, w_o)
        # chained fixed-iteration device time, bench-style: data dependency
        # between steps, float fetch as the barrier. Layout arrays MUST be
        # jit ARGUMENTS, not closure constants — closed-over MBs blow the
        # tunnel's remote-compile request limit (HTTP 413).
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

        f0 = jnp.asarray(rng.uniform(size=N).astype(np.float32))
        float(run(f0).sum())  # compile
        times = []
        for i in range(2):
            fi = jnp.asarray(
                rng.uniform(size=N).astype(np.float32)
            )
            jax.block_until_ready(fi)
            t0 = time.time()
            s = float(run(fi).sum())
            times.append((time.time() - t0) * 1000 / 25.0)
            assert np.isfinite(s)
        ms = min(times)
        log(f"{name}: coverage {lay.coverage:.4f}, {ms:.1f} ms/iter")
        return {"coverage": round(lay.coverage, 4),
                "ms_per_iter": round(ms, 2)}

    res = {"n": N, "d": D, "K": K, "clusters": NCLUST,
           "intra_cluster_edge_frac": round(intra, 4),
           "knn_build_s": round(t_knn, 1)}

    res["shuffled"] = coverage_and_iter(nbr, w, "shuffled order")

    order_c = np.argsort(cluster, kind="stable")
    nbr_c, w_c, _ = apply_order(nbr, w, order_c)
    res["cluster_sorted"] = coverage_and_iter(
        nbr_c, w_c, "cluster-sorted order"
    )

    t0 = time.time()
    order_r = rcm_order(nbr)
    res["rcm_s_host"] = round(time.time() - t0, 1)
    log(f"rcm_order over {N}x{K} in {res['rcm_s_host']}s (host)")
    nbr_r, w_r, _ = apply_order(nbr, w, order_r)
    res["rcm"] = coverage_and_iter(nbr_r, w_r, "rcm order")

    print(json.dumps(res))


if __name__ == "__main__":
    main()
