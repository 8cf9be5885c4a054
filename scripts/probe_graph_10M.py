"""Graph-path capacity probe at 10M tiles on ONE chip (round 4).

The retrieval headline runs at 10M (and 20M int8) rows, but the graph path
(label propagation / KnnProp2 — the reference's hottest refine loop,
`/root/reference/seesaw/label_propagation.py:30-43`) was only measured at
1M. This probe answers: does the windowed-SpMV serving stack FIT and what
does a KnnProp2 feedback round cost at 10M tiles on a single 16GB chip?

Memory plan (why this fits):
  - graph nbr/w (10M, 32) int32+f32 ............ 2.56 GB  (freed after build)
  - windowed slabs at the selected layout ...... ~2.5-5 GB (cap-dependent)
  - int8 database (10M, 512) + scales .......... 5.2 GB
  - degree/scores/masks ........................ ~0.2 GB
The layout build is CHUNKED (build_windowed_layout_device chunk_rows):
the one-shot builder's ~10 transient (N, K) buffers would OOM at 10M.

Run on the real chip (the ONE TPU process):
    python scripts/probe_graph_10M.py [--n_tiles 10000000] [--rounds 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[probe] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_tiles", type=int, default=10_000_000)
    ap.add_argument("--K", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--chunk_rows", type=int, default=1_048_576)
    args = ap.parse_args()

    import jax

    # persistent compilation cache (shared with bench.py): the selector's
    # ~11 candidate probes + the chunked builder cost ~6 min of cold
    # compiles through the tunnel, seconds when cached
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
    from seesaw_tpu.indices.meta import VectorMeta
    from seesaw_tpu.indices.multiscale import MultiscaleIndex
    from seesaw_tpu.knn_graph import SymmetricWeights
    from seesaw_tpu.loops.knn_methods import LabelPropagationRanker2
    from seesaw_tpu.ops.pallas_spmv import (
        build_windowed_layout_device,
        select_windowed_params,
        with_routed_overflow,
    )
    from seesaw_tpu.ops.propagation import DeferredPropagation, propagate_windowed
    from seesaw_tpu.runtime.bitmap import BitMap

    out = {}
    # match bench.build_db's frame rounding (1024-frame Pallas block
    # granularity) so the graph size equals the database row count exactly
    n_frames = (args.n_tiles // bench.TILES // 1024) * 1024
    n_tiles = n_frames * bench.TILES
    K = args.K
    log(f"n_tiles={n_tiles} K={K} device={jax.devices()[0].platform}")

    # 1. window-local graph, generated on device (post-RCM regime of a real
    # kNN graph — same generator as bench._window_local_graph)
    k1, k2, k3, k4 = jr.split(jr.PRNGKey(7), 4)
    base = jnp.arange(n_tiles, dtype=jnp.int32)[:, None]
    local = jnp.clip(
        base + jr.randint(k1, (n_tiles, K), -400, 401, dtype=jnp.int32),
        0, n_tiles - 1,
    )
    rand = jr.randint(k2, (n_tiles, K), 0, n_tiles, dtype=jnp.int32)
    nbr = jnp.where(jr.uniform(k3, (n_tiles, K)) < 0.97, local, rand)
    w = jr.uniform(k4, (n_tiles, K), minval=0.1, maxval=1.0)
    degree = w.sum(axis=1)
    jax.block_until_ready(degree)
    log("graph on device (2.56GB)")

    # 2. layout selection on a row sample (full-graph occupancy probe would
    # hold ~8 (10M, K) transients). Slot budget scales down with N: the
    # default 132 slots/vertex is 10.6GB of slabs at 10M — an OOM next to
    # the 5.2GB database (first probe attempt confirmed); 64 slots = 5.3GB
    from seesaw_tpu.ops.pallas_spmv import _AUTO_SLAB_BYTES, _SLOT_BYTES

    slot_budget = max(16, int(_AUTO_SLAB_BYTES // (_SLOT_BYTES * n_tiles)))
    log(f"slot budget {slot_budget}/vertex "
        f"({slot_budget * _SLOT_BYTES * n_tiles / 1e9:.1f}GB slab roof)")
    t0 = time.perf_counter()
    B, W, cap, cov_est, ceil = select_windowed_params(
        nbr, budget=slot_budget, sample_rows=1_048_576
    )
    log(f"selected B={B} W={W} cap={cap} cov~{cov_est:.3f} ceil~{ceil:.3f} "
        f"({time.perf_counter() - t0:.1f}s)")
    out["layout"] = f"{B},{W},{cap}"

    # 3. chunked device build
    t0 = time.perf_counter()
    layout = build_windowed_layout_device(
        nbr, w, B=B, W=W, cap=cap, chunk_rows=args.chunk_rows
    )
    build_s = time.perf_counter() - t0
    log(f"layout built in {build_s:.1f}s coverage={layout.coverage:.4f} "
        f"slab_gb={layout.slab_bytes / 1e9:.2f}")
    out["layout_build_s"] = round(build_s, 1)
    out["coverage"] = round(float(layout.coverage), 4)
    out["slab_gb"] = round(layout.slab_bytes / 1e9, 2)

    # 3b. structured overflow route (~4.4 vs 18 ns/edge — RoutedOverflow):
    # at coverage 0.956 the 14M overflow edges were ~250 of the 286 ms/iter
    t0 = time.perf_counter()
    layout = with_routed_overflow(layout)
    routed_s = time.perf_counter() - t0
    if layout.routed is not None:
        slots = layout.routed.route_key.size
        log(f"routed overflow attached in {routed_s:.1f}s: "
            f"{layout.routed.n_edges} edges in {slots} slots "
            f"({slots * 20 / 1e9:.2f}GB device)")
        out["routed_overflow_edges"] = int(layout.routed.n_edges)
        out["routed_build_s"] = round(routed_s, 1)
    else:
        log("overflow below routing gate; scalar COO path")

    # 4. free the (N, K) graph arrays — the windowed path reads only degree
    del nbr, w, local, rand, base
    import gc

    gc.collect()

    # 5. propagation timings
    labels = jnp.zeros(n_tiles).at[
        jnp.arange(0, n_tiles, n_tiles // 32)].set(1.0)
    is_labeled = jnp.zeros(n_tiles, dtype=bool).at[
        jnp.arange(0, n_tiles, n_tiles // 64)].set(True)

    def run(eps, max_iter, key):
        prior = jr.uniform(key, (n_tiles,), minval=0.01, maxval=0.99)
        jax.block_until_ready(prior)
        t0 = time.perf_counter()
        res = propagate_windowed(
            layout, degree, prior, labels, is_labeled, prior,
            reg_lambda=1.0, max_iter=max_iter, epsilon=eps,
            dispatch_iters=100,
        )
        s = float(res.scores.sum())
        dt = (time.perf_counter() - t0) * 1000
        assert np.isfinite(s)
        return dt, int(res.n_iter)

    log("compiling windowed propagation")
    run(0.0, 50, jr.PRNGKey(100))
    log("compiled; measuring")
    fixed = [run(0.0, 50, jr.PRNGKey(200 + i))[0] for i in range(2)]
    conv = [run(1e-5, 300, jr.PRNGKey(300 + i)) for i in range(3)]
    out["propagation_ms_per_iter_10M_windowed"] = round(min(fixed) / 50.0, 2)
    out["p50_propagation_ms_10M_windowed"] = round(
        float(np.percentile([c[0] for c in conv], 50)), 2)
    out["propagation_converged_iters_10M"] = int(np.median([c[1] for c in conv]))
    log(f"per-iter {out['propagation_ms_per_iter_10M_windowed']}ms, "
        f"converged {out['p50_propagation_ms_10M_windowed']}ms "
        f"({out['propagation_converged_iters_10M']} iters)")

    # 6. KnnProp2 serving round at 10M through the real loop pieces
    V, valid, boxes, zoom, row_scale, n_frames = bench.build_db(
        n_tiles, dtype="int8"
    )
    log("int8 db on device (5.2GB)")
    quads = np.asarray(jax.device_get(boxes[: bench.TILES]))
    zoom_pat = np.asarray(jax.device_get(zoom[: bench.TILES]))
    meta = VectorMeta(
        dbidx=np.repeat(np.arange(n_frames, dtype=np.int32), bench.TILES),
        zoom_level=np.tile(zoom_pat.astype(np.int32), n_frames),
        boxes=np.tile(quads.astype(np.float32), (n_frames, 1)),
        frame_dbidx=np.arange(n_frames, dtype=np.int32),
        frame_starts=np.arange(
            0, (n_frames + 1) * bench.TILES, bench.TILES, dtype=np.int32),
        frame_id=np.repeat(np.arange(n_frames, dtype=np.int32), bench.TILES),
    )
    idx = MultiscaleIndex.from_device_arrays(
        embedding=None, V=V, valid=valid, boxes=boxes, zoom=zoom,
        meta=meta, row_scale=row_scale, use_pallas=False,
    )
    # the ranker's windowed path reads only `degree`; empty (N, 0) nbr/w
    # keep nvecs right without re-paying the freed 2.56GB
    weights = SymmetricWeights(
        nbr=np.empty((n_tiles, 0), np.int32),
        w=np.empty((n_tiles, 0), np.float32),
        degree=degree,
    )
    ranker = LabelPropagationRanker2(
        weights=weights, windowed_layout=layout,
        normalize_scores=True, normalize_epsilon=0.1,
        sigmoid_before_propagate=True, calib_a=10.0, calib_b=-5.0,
        prior_weight=1.0,
    )
    rng = np.random.default_rng(0)
    qvec = rng.normal(size=512).astype(np.float32)
    ranker.set_base_scores(idx.score_device(qvec / np.linalg.norm(qvec)))

    def mem(tag):
        try:
            st = jax.devices()[0].memory_stats() or {}
            log(f"mem[{tag}] in_use={st.get('bytes_in_use', 0) / 1e9:.2f}GB "
                f"peak={st.get('peak_bytes_in_use', 0) / 1e9:.2f}GB "
                f"limit={st.get('bytes_limit', 0) / 1e9:.2f}GB")
        except Exception as e:  # axon may not expose stats
            log(f"mem[{tag}] unavailable ({type(e).__name__})")

    mem("setup")
    log("base scores set; driving rounds (round 0-1 pay compiles)")
    returned = BitMap()
    round_ms = []
    batch = 3
    for r in range(args.rounds):
        t0 = time.perf_counter()
        res = idx.rank_by_scores(
            ranker.current_scores_any(), topk=batch,
            shortlist_size=bench.SHORTLIST,
            exclude=returned, agg_method="avg_score", aug_larger="all",
        )
        got = list(res["dbidxs"])
        returned.update(got)
        rows = []
        for dbx in got:
            f = int(np.searchsorted(meta.frame_dbidx, dbx))
            rows.append(int(meta.frame_starts[f]))
        lab = (rng.random(len(rows)) < 0.3).astype(np.float64)
        ranker.update(np.asarray(rows), lab)
        cs = ranker.current_scores_any()
        if not isinstance(cs, DeferredPropagation):
            _ = float(cs[rows[0]])
        if r > 1:
            round_ms.append((time.perf_counter() - t0) * 1000)
        log(f"round {r}: {(time.perf_counter() - t0) * 1000:.0f}ms")
        mem(f"round{r}")
    flat = sorted(int(x) for x in returned)
    assert len(flat) == len(set(flat)) == args.rounds * batch
    out["p50_session_round_ms_knnprop2_10M_windowed"] = round(
        float(np.percentile(round_ms, 50)), 2)
    out["knnprop2_10M_rounds_measured"] = len(round_ms)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
