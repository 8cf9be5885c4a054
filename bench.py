"""Headline benchmark on the real chip. Prints ONE JSON line.

Primary metric: p50 per-feedback re-rank DEVICE latency over a 10M-vector
multiscale database (BASELINE.md target: < 50 ms on-device). The re-rank is
the full fused query program — matvec over the HBM-resident matrix,
distinct-frame shortlist under exclusion, frame augmentation, final top-k.

Device time is measured by chaining K queries inside one jitted lax.scan
(one dispatch, K full queries with an evolving exclusion set, fresh inputs
per repetition, value-fetch completion barriers): per-query device time =
total/K. Wall-clock numbers (reported in extras) additionally pay this
environment's ~30ms-per-dispatch tunnel latency, which a host-attached
deployment does not.

Also measured: CLIP ViT-B/32 embed throughput (images/sec/chip), END-TO-END
ingest throughput (JPEG decode -> multiscale tiling -> encode; BASELINE.md
target #1: 1M images < 10 min on v5e-8), and the int8 shortlist recall study
at 1M rows (per-row scales vs exact f32).

The run is RESILIENT: extras accumulate as stages complete, the headline
JSON prints from an atexit/SIGTERM handler (a timeout yields a partial
record, never silence), and every stage is wall-time-budgeted against
SEESAW_BENCH_BUDGET_S (default 1500s) — stages that don't fit are skipped
with a recorded reason. On top of that, the default entry point SUPERVISES
the run in a child process (see _supervise): a wedged tunnel at first
device contact — observed repeatedly in this environment — is detected,
killed, and retried, so the driver always gets its one JSON line.

Env overrides: SEESAW_BENCH_VECTORS (default 10_000_000),
SEESAW_BENCH_BUDGET_S, SEESAW_BENCH_SKIP_CLIP=1 / SEESAW_BENCH_SKIP_INGEST=1
/ SEESAW_BENCH_SKIP_RECALL=1 / SEESAW_BENCH_SKIP_REFINE=1 /
SEESAW_BENCH_SKIP_SESSION=1 / SEESAW_BENCH_SKIP_MULTIQ=1 /
SEESAW_BENCH_SKIP_GRAPH=1 / SEESAW_BENCH_SKIP_FINETUNE=1,
SEESAW_BENCH_NO_PALLAS=1, SEESAW_PROFILE_DIR=<dir> for a jax trace.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

SHORTLIST, TOPK, TILES = 50, 10, 8


def build_db(n_vectors: int, d: int = 512, tiles_per_frame: int = TILES,
             dtype: str = "bfloat16"):
    import jax
    import jax.numpy as jnp

    # frame count padded to the Pallas kernel's 1024-frame block granularity
    n_frames = (n_vectors // tiles_per_frame // 1024) * 1024
    n_vectors = n_frames * tiles_per_frame

    key = jax.random.PRNGKey(0)
    row_scale = None
    if dtype == "int8":
        # chunked generation with a DONATED in-place fill: materializing all
        # chunks and concatenating holds 2x the final array (20.5GB at 20M
        # rows — an OOM on a 16GB chip); donation keeps the peak at
        # final + one chunk
        n_chunks = 16
        rows = n_vectors // n_chunks
        import functools

        @functools.partial(jax.jit, donate_argnums=0)
        def fill_chunk(Vb, k, off):
            bits = jax.random.bits(k, (rows, d), dtype=jnp.uint8)
            chunk = jax.lax.bitcast_convert_type(bits, jnp.int8)
            return jax.lax.dynamic_update_slice(Vb, chunk, (off, 0))

        V = jnp.zeros((n_vectors, d), dtype=jnp.int8)
        for i, k in enumerate(jax.random.split(key, n_chunks)):
            V = fill_chunk(V, k, jnp.int32(i * rows))
        # per-row dequantization scales, as the real index stores them
        row_scale = jax.random.uniform(
            key, (n_vectors,), minval=0.5, maxval=1.0
        ) * (1.0 / 127.0)
    else:
        V = jax.random.normal(key, (n_vectors, d), dtype=jnp.bfloat16)
    valid = jnp.ones((n_frames, tiles_per_frame), dtype=bool)

    # 4 quadrant tiles at zoom 1, 3 half-tiles zoom 2, 1 whole-frame zoom 3
    img = 224.0
    quads = np.array(
        [
            [0, 0, img / 2, img / 2],
            [img / 2, 0, img, img / 2],
            [0, img / 2, img / 2, img],
            [img / 2, img / 2, img, img],
            [0, 0, img, img / 2],
            [0, img / 2, img, img],
            [0, 0, img / 2, img],
            [0, 0, img, img],
        ],
        dtype=np.float32,
    )
    zoom_pat = np.array([1, 1, 1, 1, 2, 2, 2, 3], dtype=np.int32)
    boxes = jnp.tile(jnp.asarray(quads), (n_frames, 1))
    zoom = jnp.tile(jnp.asarray(zoom_pat), (n_frames,))
    return V, valid, boxes, zoom, row_scale, n_frames


def _query_fn(V, valid, boxes, zoom, row_scale, use_pallas):
    from seesaw_tpu.ops import frame_scoring

    if V.dtype == "int8":
        # int8 runs through XLA: Mosaic's int8 VMEM paths stall at ~200GB/s
        # (direct int8 dot, packed-int32 decode, and int8->bf16 convert all
        # measured equal; int8 reductions are unimplemented), while the XLA
        # int8 matvec streams at ~477GB/s of int8 bytes — the FASTEST scan
        # on this toolchain (scripts/perf_probe.py stages B/C/E/G)
        use_pallas = False
    if use_pallas:
        from seesaw_tpu.ops.pallas_scoring import query_program_fused

        def run(qvec, excluded):
            return query_program_fused(
                V, valid, boxes, zoom, qvec, excluded, row_scale,
                shortlist_size=SHORTLIST, topk=TOPK, tile_bound=TILES,
                block_frames=1024, aug_larger="all", aug_weight="level_max",
                agg_method="avg_score", max_zoom=3,
            )
    else:
        def run(qvec, excluded):
            return frame_scoring.query_program(
                V, valid, boxes, zoom, qvec, None, excluded, row_scale,
                shortlist_size=SHORTLIST, topk=TOPK,
                aug_larger="all", aug_weight="level_max",
                agg_method="avg_score", max_zoom=3,
            )
    return run


def measure_rtt() -> float:
    """p50 round-trip of a trivial dispatch (tunnel + dispatch overhead).
    FRESH input + value fetch per rep: the tunnel replays identical-arg
    executions from a result cache (a fixed input measures the replay path,
    ~0.04ms, not a dispatch)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    jax.block_until_ready(f(jnp.zeros(8)))
    lat = []
    for i in range(20):
        x = jnp.full(8, float(i + 1))
        float(x[0])  # ensure resident before timing
        t0 = time.perf_counter()
        float(f(x)[0])
        lat.append((time.perf_counter() - t0) * 1000)
    return float(np.percentile(lat, 50))


def bench_rerank(n_vectors: int, dtype: str = "bfloat16",
                 use_pallas: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    d = 512
    V, valid, boxes, zoom, row_scale, n_frames = build_db(n_vectors, d, dtype=dtype)
    excluded = jnp.zeros(n_frames, dtype=bool)
    run = _query_fn(V, valid, boxes, zoom, row_scale, use_pallas)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=d).astype(np.float32))
    res = run(q, excluded)  # compile
    jax.block_until_ready(res)
    _progress(f"  single-query compiled ({dtype})")

    # -- wall-clock per query (includes tunnel RTT) -------------------------
    # query vectors live on device up front: in the serving path q is the
    # text/feedback tower's output, already device-resident — uploading a
    # fresh host vector per query would time the tunnel, not the system
    qs_wall = jnp.asarray(rng.normal(size=(30, d)).astype(np.float32))
    jax.block_until_ready(qs_wall)
    lat = []
    for i in range(30):
        t0 = time.perf_counter()
        res = run(qs_wall[i], excluded)
        top = int(res.frame_ids[0])  # value fetch = real completion barrier
        lat.append((time.perf_counter() - t0) * 1000)
        # evolving exclusion set, like a real session
        excluded = excluded.at[top].set(True)

    # -- device time: K chained queries inside ONE dispatch -----------------
    # the database rides as jit ARGUMENTS (already device-resident), not as
    # captured constants — capture would bake 10GB into the executable
    K = 32

    @jax.jit
    def chain(V_a, valid_a, boxes_a, zoom_a, rs_a, qs, excluded0):
        inner = _query_fn(V_a, valid_a, boxes_a, zoom_a, rs_a, use_pallas)

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

    excl0 = jnp.zeros(n_frames, dtype=bool)
    _progress(f"  wall p50={float(np.percentile(lat,50)):.1f}ms; compiling chain")
    # fresh queries per repetition + value-forced completion: the tunnel
    # replays identical-arg executions from a result cache, and its
    # block_until_ready can return before execution finishes
    float(chain(V, valid, boxes, zoom, row_scale, fresh_qs(), excl0))  # compile
    times = []
    for _ in range(3):
        qs = fresh_qs()
        t0 = time.perf_counter()
        float(chain(V, valid, boxes, zoom, row_scale, qs, excl0))
        times.append((time.perf_counter() - t0) * 1000 / K)
    device_ms = float(min(times))

    del V, valid, boxes, zoom, excluded, res
    import gc

    gc.collect()
    return {
        "p50_ms": float(np.percentile(lat, 50)),
        "p90_ms": float(np.percentile(lat, 90)),
        "device_ms": device_ms,
        "n_vectors": n_frames * TILES,
    }


def bench_clip_embed():
    """Device ViT-B/32 throughput: ITERS batches scanned inside ONE jitted
    program (pixels generated on device), so neither the tunnel's dispatch
    overhead nor its result-dedup cache can distort the number."""
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.models.clip import ClipEmbedding, ClipModel

    emb = ClipEmbedding(variant="vit-b32", dtype=jnp.bfloat16)
    model, params = emb.model, emb.params
    # The r4 ablation (PARITY.md round-4 item 9) showed attention at seq=50
    # costing 58% of the forward for ~8% of FLOPs; the fused pair-packed
    # Pallas kernel (ops/pallas_attention.py, on by default) attacks that:
    # 8286 -> 11932 img/s at B=1024 (scripts/probe_fused_attention.py).
    # With fused attention the batch optimum moved DOWN: B 128/256/512/768/
    # 1024/2048 -> 12520/11962/12584/11999/11932/11741 img/s.
    B, ITERS = 512, 16

    @jax.jit
    def chained(p, key):
        def body(carry, k):
            px = jax.random.normal(k, (B, 224, 224, 3), dtype=jnp.float32) + carry
            f = model.apply({"params": p}, px, method=ClipModel.encode_image)
            return f.sum() * 0.0, f[0, 0]
        _, outs = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, ITERS))
        return outs.sum()

    float(chained(params, jax.random.PRNGKey(0)))  # compile + run
    ts = []
    for i in range(2):
        t0 = time.perf_counter()
        float(chained(params, jax.random.PRNGKey(i + 1)))
        ts.append(time.perf_counter() - t0)
    return B * ITERS / min(ts)


def finetune_pairs_per_s(model, params, *, B: int = 256,
                         iters: int = 8, reps: int = 2,
                         on_compiled=None) -> float:
    """Chained contrastive train-step throughput for a ClipModel (fwd+bwd
    through BOTH towers). Shared by the bench stage and the A/B probe
    (scripts/probe_fused_attention_bwd.py) so the methodology cannot
    drift: iters steps scanned in one jitted program with params threaded
    through as the data dependency, fresh key per rep, float() barrier.
    Input shapes come from model.cfg (the one source of truth)."""
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.models.clip import ClipModel
    from seesaw_tpu.models.clip_finetune import clip_contrastive_loss

    cfg = model.cfg
    L, vocab = cfg.context_length, cfg.vocab_size
    size = cfg.image_size

    @jax.jit
    def chained(p, key):
        def body(carry, k):
            px = jax.random.normal(k, (B, size, size, 3), dtype=jnp.float32)
            toks = jax.random.randint(k, (B, L), 0, vocab)

            def loss_fn(pp):
                img = model.apply({"params": pp}, px,
                                  method=ClipModel.encode_image)
                txt = model.apply({"params": pp}, toks,
                                  method=ClipModel.encode_text)
                return clip_contrastive_loss(img, txt, pp["logit_scale"])

            loss, grads = jax.value_and_grad(loss_fn)(carry)
            # vanishing update: a real data dependency between steps
            # without drifting the weights
            new_p = jax.tree.map(lambda a, g: a - 1e-12 * g, carry, grads)
            return new_p, loss

        final_p, losses = jax.lax.scan(body, p, jax.random.split(key, iters))
        return losses.sum() + jax.tree.leaves(final_p)[0].sum() * 0.0

    float(chained(params, jax.random.PRNGKey(0)))  # compile + run
    if on_compiled:
        on_compiled()
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(chained(params, jax.random.PRNGKey(i + 1)))
        ts.append(time.perf_counter() - t0)
    return B * iters / min(ts)


def bench_finetune():
    """Contrastive fine-tune step throughput, the DB-matched-training path
    (models/clip_finetune.py). Trains through the fused pair-packed
    attention kernel incl. its Pallas BACKWARD (segmented-softmax recompute
    in VMEM): 2034 einsum vs ~2520-2540 fused pairs/s (probe A/B measured
    2518, this stage 2537-2547 across runs —
    scripts/probe_fused_attention_bwd.py holds the A/B)."""
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.models.clip import ClipEmbedding

    emb = ClipEmbedding(variant="vit-b32", dtype=jnp.bfloat16)
    params = jax.tree.map(jnp.asarray, emb.params)
    rate = finetune_pairs_per_s(emb.model, params)
    return {"finetune_pairs_per_s": round(rate, 1)}


def bench_ingest(n_images: int = 240) -> dict:  # multiple of the 48-image group
    """End-to-end ingest: JPEG decode -> multiscale tiling -> CLIP encode
    (BASELINE.md target #1). Synthetic 640x480 JPEGs; real ViT-B/32 bf16."""
    import tempfile
    from types import SimpleNamespace

    import jax.numpy as jnp
    import PIL.Image

    from seesaw_tpu.ingest.pipeline import run_multiscale_extraction
    from seesaw_tpu.models.clip import ClipEmbedding

    tmp = tempfile.mkdtemp(prefix="ingest_bench_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_images):
        arr = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
        p = f"{tmp}/img_{i:05d}.jpg"
        PIL.Image.fromarray(arr).save(p, quality=85)
        paths.append(p)

    ds = SimpleNamespace(
        dbidxs=np.arange(n_images), file_path=lambda i: paths[int(i)]
    )
    emb = ClipEmbedding(variant="vit-b32", dtype=jnp.bfloat16)

    # warmup MUST cover at least one full image-batch group (48) plus the
    # tail shapes, or the batch tiler compiles inside the measured run
    # (~20s of remote compile read as throughput loss)
    warm = SimpleNamespace(dbidxs=np.arange(52), file_path=ds.file_path)
    run_multiscale_extraction(warm, emb, batch_size=256, tiling="device")

    # component 1: host decode throughput (with device tiling, JPEG decode is
    # the host's only remaining job; native C++ pool when available)
    from seesaw_tpu.runtime.jpeg_decode import decode_pool

    t0 = time.perf_counter()
    n_ok = sum(1 for _, img in decode_pool(paths, n_threads=8) if img is not None)
    decode_dt = time.perf_counter() - t0
    assert n_ok == n_images
    decode_img_per_s = n_images / decode_dt

    # component 2: host->device upload bandwidth (the binding stage through
    # this environment's tunnel; ~free over PCIe on an attached host). Fresh
    # pseudo-random payloads each rep — the tunnel dedups repeated content.
    # NOTE on the remaining end-to-end gap vs this bound: this VM has ONE
    # vCPU, so JPEG decode, the (B,H,W,3) stack memcpy and the tunnel
    # client's serialization all SERIALIZE on one core instead of
    # overlapping across cores — measured e2e lands ~3x under the
    # upload-alone bound here; on a multi-core attached host the binding
    # stage is min(decode, encode), both reported below.
    import jax

    rng2 = np.random.default_rng(1)
    up_bytes = 32 * (480 * 640 * 3)
    rates = []
    for _ in range(3):
        payload = rng2.integers(0, 255, size=up_bytes, dtype=np.uint8)
        t0 = time.perf_counter()
        x = jnp.asarray(payload)
        float(x[::65536].astype(jnp.float32).sum())  # force the transfer
        rates.append(up_bytes / (time.perf_counter() - t0) / 1e6)
    # MAX of the reps: the tunnel's bandwidth swings minute-to-minute, and
    # a median taken in a slow moment can sit BELOW an e2e rate measured a
    # minute later (observed vs_env_bound 1.53 in r5 run 4) — as a BOUND,
    # the best observed rate is the defensible estimate of link capacity
    upload_MBps = float(np.max(rates))
    upload_img_per_s = upload_MBps * 1e6 / (480 * 640 * 3)

    # component 3: measured end-to-end with the batched device-tiling path.
    # TWO passes: the first pays cold costs a steady pipeline does not (OS
    # page-cache misses on the JPEGs, thread-pool spin-up, tunnel-session
    # warmup — measured 9.4 img/s cold vs 34.7 steady in r5 profiling); an
    # ingest job streams for minutes-to-hours, so the steady-state rate is
    # the representative number and ships as the headline ingest metric,
    # with the cold pass recorded alongside.
    rates, dts = [], []
    for _ in range(2):
        t0 = time.perf_counter()
        vectors, dbidx, zoom, boxes = run_multiscale_extraction(
            ds, emb, batch_size=256, tiling="device"
        )
        dts.append(time.perf_counter() - t0)
        rates.append(n_images / dts[-1])
    img_per_s = max(rates)
    dt = min(dts)
    tiles_per_image = vectors.shape[0] / n_images
    est_min_1m_v5e8 = 1e6 / (img_per_s * 8) / 60.0  # ingest shards by batch axis
    # the stage bound THIS environment can reach (min of decode, upload);
    # encode joins via the clip stage in _main's arithmetic
    env_bound = min(decode_img_per_s, upload_img_per_s)
    return {
        "ingest_img_per_s_chip": round(img_per_s, 2),
        "ingest_img_per_s_chip_cold": round(rates[0], 2),
        "ingest_tiles_per_s_chip": round(vectors.shape[0] / dt, 1),
        "ingest_tiles_per_image": round(tiles_per_image, 2),
        "ingest_decode_img_per_s_host": round(decode_img_per_s, 2),
        "ingest_upload_MBps_env": round(upload_MBps, 1),
        "ingest_upload_img_per_s_env": round(upload_img_per_s, 1),
        "ingest_env_bound_img_per_s": round(env_bound, 1),
        "ingest_vs_env_bound": round(img_per_s / env_bound, 3),
        "ingest_1M_images_v5e8_min": round(est_min_1m_v5e8, 2),
    }


def bench_multi_query(n_vectors: int, Q: int = 16, dtype: str = "int8") -> dict:
    """Batched multi-query serving throughput: Q concurrent sessions' re-ranks
    in one (N,D)@(D,Q) dispatch (ops.frame_scoring.query_program_batch). The
    matrix HBM read is amortized over Q queries, so device qps should scale
    nearly Q x over the serial single-query loop. Runs on the int8 serving
    config (the fastest scan, see _query_fn)."""
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.ops.frame_scoring import (
        query_program_batch, query_program_batch_framescale,
    )

    frame_mode = dtype == "int8_frame"
    V, valid, boxes, zoom, row_scale, n_frames = build_db(
        n_vectors, dtype="int8" if frame_mode else dtype
    )
    if frame_mode:
        # per-FRAME dequant scales: the int32-max batch path
        frame_scale = jax.random.uniform(
            jax.random.PRNGKey(3), (n_frames,), minval=0.5, maxval=1.0
        ) * (1.0 / 127.0)
        row_scale = frame_scale
    rng = np.random.default_rng(0)
    d = V.shape[1]
    K = 8  # chained batch dispatches

    @jax.jit
    def chain(V_a, valid_a, boxes_a, zoom_a, rs_a, qss, excl0):
        def body(excl, qs):
            if frame_mode:
                r = query_program_batch_framescale(
                    V_a, valid_a, boxes_a, zoom_a, qs, excl, rs_a,
                    shortlist_size=SHORTLIST, topk=TOPK,
                    aug_larger="all", aug_weight="level_max",
                    agg_method="avg_score", max_zoom=3,
                )
            else:
                r = query_program_batch(
                    V_a, valid_a, boxes_a, zoom_a, qs, excl, rs_a,
                    shortlist_size=SHORTLIST, topk=TOPK,
                    aug_larger="all", aug_weight="level_max",
                    agg_method="avg_score", max_zoom=3,
                )
            # each session excludes its own top hit (data dependency)
            top = jnp.maximum(r.frame_ids[:, 0], 0)
            excl = excl.at[jnp.arange(excl.shape[0]), top].set(True)
            return excl, r.frame_scores.sum()
        _, out = jax.lax.scan(body, excl0, qss)
        return out.sum()

    def fresh():
        qs = jnp.asarray(rng.normal(size=(K, Q, d)).astype(np.float32))
        float(qs[0, 0, 0])
        return qs

    excl0 = jnp.zeros((Q, n_frames), dtype=bool)
    float(chain(V, valid, boxes, zoom, row_scale, fresh(), excl0))  # compile
    times = []
    for _ in range(3):
        qs = fresh()
        t0 = time.perf_counter()
        float(chain(V, valid, boxes, zoom, row_scale, qs, excl0))
        times.append((time.perf_counter() - t0) * 1000 / K)
    ms_per_batch = float(min(times))
    suffix = "" if dtype == "int8" else f"_{dtype}"
    out = {
        "multi_query_Q": Q,
        f"p50_batch16_device_ms{suffix}": round(ms_per_batch, 3),
        f"topk_qps_device_batch16{suffix}": round(Q * 1000.0 / ms_per_batch, 1),
    }
    del V, valid, boxes, zoom, row_scale
    import gc

    gc.collect()
    return out


def bench_session_rounds(n_vectors: int, rounds: int = 24) -> dict:
    """END-TO-END serving latency: drive `Session.next` -> label ->
    `update_state` -> `refine` on a synthetic index at headline scale,
    through the REAL product path — MultiscaleIndex.from_device_arrays (no
    20GB host mirror), the Pallas fused query kernel, and the
    device-persistent incremental exclusion mask. Reports per-round wall
    time INCLUDING all host glue (the reference records exactly this,
    `seesaw_bench.py:350-354`). Wall numbers here include this
    environment's ~30ms-per-dispatch tunnel tax (2 dispatches/round:
    query + refine's labeled-row gather) that an attached host does not pay.
    """
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from seesaw_tpu.basic_types import Box, IndexSpec, SessionParams
    from seesaw_tpu.indices.meta import VectorMeta
    from seesaw_tpu.indices.multiscale import MultiscaleIndex
    from seesaw_tpu.session import Session

    # int8 storage = the production serving config (fastest scan via the
    # XLA path + half the HBM; see _query_fn)
    V, valid, boxes, zoom, row_scale, n_frames = build_db(n_vectors, dtype="int8")

    # host metadata mirroring the device tiling pattern (no vector mirror)
    quads = np.asarray(jax.device_get(boxes[: TILES]))
    zoom_pat = np.asarray(jax.device_get(zoom[: TILES]))
    meta = VectorMeta(
        dbidx=np.repeat(np.arange(n_frames, dtype=np.int32), TILES),
        zoom_level=np.tile(zoom_pat.astype(np.int32), n_frames),
        boxes=np.tile(quads.astype(np.float32), (n_frames, 1)),
        frame_dbidx=np.arange(n_frames, dtype=np.int32),
        frame_starts=np.arange(0, (n_frames + 1) * TILES, TILES, dtype=np.int32),
        frame_id=np.repeat(np.arange(n_frames, dtype=np.int32), TILES),
    )

    rng = np.random.default_rng(0)
    d = V.shape[1]

    class StubEmbedding:
        def from_string(self, string=None):
            return rng.normal(size=d).astype(np.float32)

    idx = MultiscaleIndex.from_device_arrays(
        embedding=StubEmbedding(), V=V, valid=valid, boxes=boxes, zoom=zoom,
        meta=meta, row_scale=row_scale, use_pallas=True,
    )
    params = SessionParams(
        index_spec=IndexSpec(d_name="bench", i_name="synth"),
        interactive="rocchio_update",
        batch_size=3,
        shortlist_size=SHORTLIST,
        agg_method="avg_score",
        aug_larger="all",
        interactive_options=dict(
            rocchio_alpha=1.0, rocchio_beta=0.7, rocchio_gamma=0.3
        ),
    )
    dataset = SimpleNamespace(
        get_urls=lambda idxbatch: [f"b://{int(i)}" for i in idxbatch]
    )

    def drive(session, n_rounds):
        session.set_text("a benchmark query")
        next_ms, round_ms = [], []
        seen_shapes: set = set()
        compile_rounds = 0
        for r in range(n_rounds):
            t0 = time.perf_counter()
            dbidxs = session.next()
            t_next = time.perf_counter()
            state = session.get_state()
            for imdata in state.gdata[-1]:
                if rng.random() < 0.3:  # simulated user accepts ~30%
                    imdata.boxes = [Box(x1=0.0, y1=0.0, x2=112.0, y2=112.0,
                                        marked_accepted=True)]
                else:
                    imdata.boxes = []
            session.update_state(state)
            session.refine()
            t_end = time.perf_counter()
            # the labeled set grows every round, so the deferred-refine
            # program recompiles at each pow2 row-bucket boundary — a round
            # that FIRST used a program shape paid that one-time jit (cached
            # across runs by .jax_cache, but cold on a fresh cache). Those
            # warm-up rounds are excluded from the steady-state percentiles
            # and counted separately.
            shape = idx.last_program_shape
            is_compile_round = shape not in seen_shapes
            seen_shapes.add(shape)
            if is_compile_round:
                compile_rounds += 1
            elif r > 1:  # rounds 0-1: plain-query + refine-path warm-up
                next_ms.append((t_next - t0) * 1000)
                round_ms.append((t_end - t0) * 1000)
            assert len(dbidxs) == 3
        # no-repeat contract held through the device-persistent mask
        flat = [int(x) for b in session.acc_indices for x in b]
        assert len(flat) == len(set(flat)), "serving path repeated a dbidx"
        return next_ms, round_ms, compile_rounds

    next_ms, round_ms, n_compile = drive(
        Session(None, dataset, idx, params), rounds
    )

    # same index object (shared, like concurrent web sessions), LogReg2 loop:
    # refine runs the FUSED one-dispatch device fit (learners.fit_rows)
    lr_params = params.model_copy(update=dict(
        interactive="log_reg2",
        interactive_options=dict(
            class_weights="balanced", scale="centered", reg_lambda=5.0,
            fit_intercept=False, max_iter=50,
        ),
    ))
    _, lr_round_ms, lr_compile = drive(
        Session(None, dataset, idx, lr_params), max(rounds // 2, 8)
    )

    return {
        "p50_session_next_ms": round(float(np.percentile(next_ms, 50)), 3),
        "p50_session_round_ms": round(float(np.percentile(round_ms, 50)), 3),
        "p90_session_round_ms": round(float(np.percentile(round_ms, 90)), 3),
        "p50_session_round_ms_logreg": round(
            float(np.percentile(lr_round_ms, 50)), 3
        ),
        "session_rounds_measured": len(round_ms),
        "session_compile_rounds_excluded": n_compile + lr_compile,
    }


def bench_refine(d: int = 512, n_labeled: int = 512) -> dict:
    """Per-round refine (fit) device latency: the multi-regularized 'seesaw'
    objective (LBFGS with the XLX Laplacian term) at a realistic round size —
    BASELINE.md's 'per-round refine+rank latency' alongside the rank bench.
    Measured as K chained fits inside one dispatch (see module docstring)."""
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.learners.multi_reg import _fit_reg

    rng = np.random.default_rng(0)
    X = rng.normal(size=(n_labeled, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    y = rng.integers(0, 2, size=n_labeled).astype(np.float32)
    sample_w = np.ones(n_labeled, np.float32)
    valid = np.ones(n_labeled, bool)
    qvec = rng.normal(size=d).astype(np.float32)
    qvec /= np.linalg.norm(qvec)
    xlx = (np.eye(d) * 1e-3).astype(np.float32)
    K = 8

    @jax.jit
    def chain(Xa, ya, w0s):
        def body(carry, w0):
            w, _, _ = _fit_reg(
                Xa, ya, jnp.asarray(sample_w), jnp.asarray(valid),
                jnp.asarray(qvec), jnp.asarray(xlx), w0 + carry * 0.0,
                0.0, 1.0, 0.1, 10.0, 1.0,
                label_loss_type="pairwise_rank_loss",
                pos_weight_balanced=True, max_iter=50,
            )
            return w.sum(), w[0]
        _, outs = jax.lax.scan(body, jnp.float32(0), w0s)
        return outs.sum()

    def fresh_w0s():
        w = jnp.asarray(rng.normal(size=(K, d)).astype(np.float32) * 0.01)
        float(w[0, 0])
        return w

    Xd, yd = jnp.asarray(X), jnp.asarray(y)
    float(chain(Xd, yd, fresh_w0s()))  # compile
    ts = []
    for _ in range(2):
        w0s = fresh_w0s()
        t0 = time.perf_counter()
        float(chain(Xd, yd, w0s))
        ts.append((time.perf_counter() - t0) * 1000 / K)
    return {"p50_refine_fit_ms": round(float(min(ts)), 3),
            "refine_n_labeled": n_labeled}


def bench_int8_recall_at_scale(n_vectors: int, d: int = 512,
                               trials: int = 20,
                               scale: str = "row") -> dict:
    """int8 shortlist recall AT HEADLINE SCALE with a shortlist sweep.

    f32 ground truth never fits next to the int8 copy at 10M (20 + 5 GB),
    so the f32 database is generated in device chunks: each chunk scores
    all queries exactly in f32, is quantized to int8 and freed — only the
    (N,) int8 rows + (N, Q) f32 exact scores persist. Recall(k) =
    |exact top-10 ∩ int8 top-k| / 10, swept over shortlist sizes.

    scale='row' is the matvec serving quantization; scale='frame' (one
    scale per 8-row tile group) is the BATCH serving quantization
    (MultiscaleIndex int8_scale='frame') — its recall ships at headline
    scale alongside the speed claim. At 10M the two run as separate
    stages so the two 5 GB int8 copies never coexist in HBM;
    scale='both' shares ONE generated database (and its exact f32
    scores) across both quantizations for sub-headline sizes."""
    import gc

    import jax
    import jax.numpy as jnp

    from seesaw_tpu.ops.frame_scoring import scoring_matvec

    scales = ("row", "frame") if scale == "both" else (scale,)

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(64, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    qs = 0.6 * centers[:trials] + 0.3 * rng.normal(size=(trials, d))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    qs_d = jnp.asarray(qs.astype(np.float32))
    centers_d = jnp.asarray(centers)

    n_chunks = max(n_vectors // 1_000_000, 1)
    # keep chunk rows a multiple of TILES: the frame-scale quantization
    # reshapes (rows,) -> (-1, TILES) per chunk
    rows = max((n_vectors // n_chunks) // TILES, 1) * TILES

    @jax.jit
    def gen_chunk(key, cd, qd):
        which = jax.random.randint(key, (rows,), 0, 64)
        V = 0.6 * cd[which] + 0.3 * jax.random.normal(key, (rows, d))
        V = V / jnp.linalg.norm(V, axis=1, keepdims=True)
        exact = V @ qd.T  # (rows, Q) f32 ground truth
        row_max = jnp.abs(V).max(axis=1)
        out = [exact.astype(jnp.float32)]
        for s in scales:
            rm = row_max
            if s == "frame":  # one scale per TILES-row frame group
                fmax = row_max.reshape(-1, TILES).max(axis=1)
                rm = jnp.repeat(fmax, TILES)
            sc = jnp.where(rm > 0, rm / 127.0, 1.0)
            V8 = jnp.clip(jnp.round(V / sc[:, None]), -127, 127).astype(
                jnp.int8)
            out += [V8, sc.astype(jnp.float32)]
        return tuple(out)

    chunks = []
    for key in jax.random.split(jax.random.PRNGKey(7), n_chunks):
        parts = gen_chunk(key, centers_d, qs_d)
        jax.block_until_ready(parts[1])
        chunks.append(parts)
    exact_scores = jnp.concatenate([c[0] for c in chunks])
    quantized = {
        s: (jnp.concatenate([c[1 + 2 * i] for c in chunks]),
            jnp.concatenate([c[2 + 2 * i] for c in chunks]))
        for i, s in enumerate(scales)
    }
    del chunks
    gc.collect()

    sweep = (50, 100, 400)
    kmax = max(sweep)

    @jax.jit
    def exact_top(exx, qi):
        return jax.lax.top_k(exx[:, qi], TOPK)[1]

    @jax.jit
    def quant_top(V8x, scx, q):
        return jax.lax.top_k(scoring_matvec(V8x, q, scx), kmax)[1]

    # the exact ground-truth top-k depends only on the trial, not the
    # quantization — compute once per trial, not once per (scale, trial)
    exact_sets = [
        set(np.asarray(exact_top(exact_scores, t)).tolist())
        for t in range(trials)
    ]

    out = {}
    for s in scales:
        V8, sc = quantized[s]
        hits = {k: 0 for k in sweep}
        for t in range(trials):
            q_list = np.asarray(quant_top(V8, sc, qs_d[t])).tolist()
            e = exact_sets[t]
            for k in sweep:
                hits[k] += len(e & set(q_list[:k]))
        tag = "" if s == "row" else f"_{s}scale"
        out.update({
            f"int8_shortlist_recall_{n_vectors // 1_000_000}M_k{k}{tag}":
                round(hits[k] / (trials * TOPK), 4)
            for k in sweep
        })
    del quantized, exact_scores
    gc.collect()
    return out


# shared across the propagation and graph-session stages: the window-local
# synthetic graph + its windowed-SpMV layout, generated ON DEVICE (the
# 1-vCPU host paid an erratic 100-400s PER build for the same arrays under
# CPU steal; measured with scripts-level profiling, r4)
_GRAPH_CACHE: dict = {}


def _make_window_local_edges(n_tiles: int, K: int):
    """Device-generated (nbr, w) edge arrays in the post-RCM regime of a
    real kNN graph: 97% of edges land within a +-400 diagonal window, 3%
    are uniform-random (the adversarial overflow residue). Shared by the
    1M and 10M graph stages so their graphs differ only in N."""
    import jax
    import jax.numpy as jnp

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    base = jnp.arange(n_tiles, dtype=jnp.int32)[:, None]
    local = jnp.clip(
        base + jax.random.randint(k1, (n_tiles, K), -400, 401, dtype=jnp.int32),
        0, n_tiles - 1,
    )
    rand = jax.random.randint(k2, (n_tiles, K), 0, n_tiles, dtype=jnp.int32)
    nbr = jnp.where(jax.random.uniform(k3, (n_tiles, K)) < 0.97, local, rand)
    w = jax.random.uniform(k4, (n_tiles, K), minval=0.1, maxval=1.0)
    return nbr, w


def _window_local_graph(n_tiles: int, K: int):
    """Device-generated graph in the post-RCM regime of a real kNN graph
    (97% near-diagonal edges) + its windowed layout, built once per size."""
    from seesaw_tpu.knn_graph import SymmetricWeights
    from seesaw_tpu.ops.pallas_spmv import build_windowed_layout_device

    ckey = (n_tiles, K)
    if ckey in _GRAPH_CACHE:
        return _GRAPH_CACHE[ckey]
    nbr, w = _make_window_local_edges(n_tiles, K)
    weights = SymmetricWeights(nbr=nbr, w=w, degree=w.sum(axis=1))
    # the PRODUCT layout path: probe the graph's occupancy histogram and
    # build the best (B, W, cap) at the default byte budget (the fixed
    # (512,1408,12) sweep default cap-collides to 0.375 coverage on real
    # kNN graphs — scripts/probe_layout_select_r4.json)
    from seesaw_tpu.ops.pallas_spmv import select_windowed_params

    B, W, cap, cov, _ = select_windowed_params(nbr)
    _progress(f"  layout selected: B={B} W={W} cap={cap} cov={cov:.3f}")
    layout = build_windowed_layout_device(nbr, w, B=B, W=W, cap=cap)
    # structured overflow route (the auto builder attaches this too): the
    # 3%-random edges of this generator are ~1M overflow edges at 1M tiles
    # — 18 ns/edge scalar vs ~7 routed (scripts/probe_overflow_routing.py)
    from seesaw_tpu.ops.pallas_spmv import with_routed_overflow

    layout = with_routed_overflow(layout)
    if layout.routed is not None:
        _progress(f"  routed overflow: {layout.routed.n_edges} edges")
    _GRAPH_CACHE[ckey] = (weights, layout)
    return weights, layout


def bench_propagation(n_tiles: int = 1_048_576, K: int = 32) -> dict:
    """Label-propagation device latency at >=1M tiles (VERDICT r3 missing #4:
    the reference's hottest refine path, `label_propagation.py:30-43` — a
    scipy CSR SpMV x300 host loop; here one device dispatch runs the whole
    Jacobi while_loop over the fixed-degree padded graph).

    Reports (a) the fixed-cost number: exactly 300 iterations (epsilon=0),
    and (b) the converged serving call (epsilon=1e-5) with its iteration
    count. Fresh priors per repetition defeat the tunnel's result cache."""
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.ops.propagation import propagate

    key = jax.random.PRNGKey(0)
    k_nbr, k_w, k_lab = jax.random.split(key, 3)
    nbr = jax.random.randint(k_nbr, (n_tiles, K), 0, n_tiles, dtype=jnp.int32)
    w = jax.random.uniform(k_w, (n_tiles, K), minval=0.1, maxval=1.0)
    degree = w.sum(axis=1)
    labeled_ids = jax.random.randint(k_lab, (64,), 0, n_tiles)
    is_labeled = jnp.zeros(n_tiles, dtype=bool).at[labeled_ids].set(True)
    labels = jnp.zeros(n_tiles).at[labeled_ids[::2]].set(1.0)
    jax.block_until_ready(degree)

    def run(eps, max_iter, rep_key):
        prior = jax.random.uniform(rep_key, (n_tiles,), minval=0.01, maxval=0.99)
        jax.block_until_ready(prior)
        t0 = time.perf_counter()
        # dispatch_iters bounds each device program: a 300-iter while_loop
        # at 1M tiles is one ~84s program — execution watchdogs kill it
        res = propagate(
            nbr, w, degree, prior, labels, is_labeled, prior,
            reg_lambda=1.0, max_iter=max_iter, epsilon=eps,
            dispatch_iters=25,
        )
        s = float(res.scores.sum())  # value fetch = completion barrier
        dt = (time.perf_counter() - t0) * 1000
        assert np.isfinite(s)
        return dt, int(res.n_iter)

    # compile both variants
    _progress("  propagation graph on device; compiling XLA Jacobi")
    run(0.0, 25, jax.random.PRNGKey(100))
    _progress("  fixed-iter program compiled; compiling converged variant")
    run(1e-5, 300, jax.random.PRNGKey(101))
    _progress("  compiled; measuring")

    # per-iteration device cost from fixed 25-iter runs (XLA's (N,K) scalar
    # gather is the known bottleneck: ~282 ms/iter at 1M, flat across
    # locality/sortedness/dtype — scripts/perf_probe.py stage J)
    fixed = [run(0.0, 25, jax.random.PRNGKey(200 + i))[0] for i in range(2)]
    conv = []
    for i in range(3):
        conv.append(run(1e-5, 300, jax.random.PRNGKey(300 + i)))
        _progress(f"  converged run {i + 1}/3: {conv[-1][0]:.0f}ms "
                  f"({conv[-1][1]} iters)")
    out = {
        "propagation_ms_per_iter_1M": round(float(min(fixed)) / 25.0, 2),
        "p50_propagation_ms_1M": round(
            float(np.percentile([c[0] for c in conv], 50)), 2
        ),
        "propagation_converged_iters": int(np.median([c[1] for c in conv])),
        "propagation_n_tiles": n_tiles,
        "propagation_K": K,
    }
    del nbr, w, degree
    import gc

    gc.collect()
    out.update(_bench_propagation_windowed(n_tiles, K))
    return out


def _bench_propagation_windowed(n_tiles: int, K: int) -> dict:
    """The windowed-SpMV Pallas formulation (ops.pallas_spmv) on a
    WINDOW-LOCAL graph — the regime a real kNN graph reaches after
    rcm_order relabeling (coverage is reported so the claim is scoped).
    XLA's scalar gather costs ~284 ms/iter regardless of locality; the
    lane-shuffle kernel serves the window-local edges at ~27 ms/iter."""
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.ops.propagation import propagate_windowed

    _progress("  windowed: building graph + layout (device)")
    weights, layout = _window_local_graph(n_tiles, K)
    _progress(f"  windowed: layout built (coverage {layout.coverage:.3f}); "
              "compiling kernel")
    degree = weights.degree
    labels = jnp.zeros(n_tiles).at[jnp.arange(0, n_tiles, n_tiles // 32)].set(1.0)
    is_labeled = jnp.zeros(n_tiles, dtype=bool).at[
        jnp.arange(0, n_tiles, n_tiles // 64)
    ].set(True)

    def run(eps, max_iter, key, lay=None, deg=None):
        lay = layout if lay is None else lay
        deg = degree if deg is None else deg
        prior = jax.random.uniform(key, (n_tiles,), minval=0.01, maxval=0.99)
        jax.block_until_ready(prior)
        t0 = time.perf_counter()
        res = propagate_windowed(
            lay, deg, prior, labels, is_labeled, prior,
            reg_lambda=1.0, max_iter=max_iter, epsilon=eps,
            dispatch_iters=100,
        )
        s = float(res.scores.sum())
        dt = (time.perf_counter() - t0) * 1000
        assert np.isfinite(s)
        return dt, int(res.n_iter)

    import jax.random as jrandom

    run(0.0, 50, jrandom.PRNGKey(100))  # compile
    _progress("  windowed: compiled; measuring")
    fixed = [run(0.0, 50, jrandom.PRNGKey(200 + i))[0] for i in range(2)]
    conv = [run(1e-5, 300, jrandom.PRNGKey(300 + i)) for i in range(3)]
    out = {
        "propagation_ms_per_iter_1M_windowed": round(float(min(fixed)) / 50.0, 2),
        "p50_propagation_ms_1M_windowed": round(
            float(np.percentile([c[0] for c in conv], 50)), 2
        ),
        "propagation_windowed_coverage": round(layout.coverage, 4),
        "propagation_windowed_layout": f"{layout.B},{layout.W},{layout.cap}",
    }

    # the real-kNN regime: after the auto builder's RCM relabeling a real
    # exact-kNN graph is PURELY window-local (every neighbor inside the
    # cluster block — probe_layout_select_r4.json measured coverage 1.0 and
    # 4.5 ms/iter on a real 1M graph); the selected cap>=K layout serves it
    # with zero overflow at about half the default's slab bytes
    from seesaw_tpu.ops.pallas_spmv import (
        build_windowed_layout_device,
        select_windowed_params,
    )

    k5, k6 = jrandom.split(jrandom.PRNGKey(11))
    base = jnp.arange(n_tiles, dtype=jnp.int32)[:, None]
    nbr_c = jnp.clip(
        base + jrandom.randint(k5, (n_tiles, K), -128, 129, dtype=jnp.int32),
        0, n_tiles - 1,
    )
    w_c = jrandom.uniform(k6, (n_tiles, K), minval=0.1, maxval=1.0)
    B, W, cap, cov, _ = select_windowed_params(nbr_c)
    _progress(f"  real-kNN regime: selected B={B} W={W} cap={cap} "
              f"cov={cov:.3f}; building + compiling")
    lay_c = build_windowed_layout_device(nbr_c, w_c, B=B, W=W, cap=cap)
    deg_c = w_c.sum(axis=1)
    run(0.0, 50, jrandom.PRNGKey(400), lay_c, deg_c)  # compile
    fixed_c = [
        run(0.0, 50, jrandom.PRNGKey(500 + i), lay_c, deg_c)[0]
        for i in range(2)
    ]
    out["propagation_ms_per_iter_1M_windowed_realknn"] = round(
        float(min(fixed_c)) / 50.0, 2
    )
    out["propagation_windowed_realknn_coverage"] = round(lay_c.coverage, 4)
    out["propagation_windowed_realknn_layout"] = f"{B},{W},{cap}"
    del lay_c, nbr_c, w_c, deg_c
    # the main graph + layout stay cached for the graph-session stage
    return out


def _uniform_meta(n_frames: int, boxes, zoom):
    """VectorMeta for a build_db database: uniform TILES-per-frame tiling,
    the per-frame box/zoom pattern replicated. Shared by the 1M and 10M
    graph stages."""
    import jax

    from seesaw_tpu.indices.meta import VectorMeta

    quads = np.asarray(jax.device_get(boxes[:TILES]))
    zoom_pat = np.asarray(jax.device_get(zoom[:TILES]))
    return VectorMeta(
        dbidx=np.repeat(np.arange(n_frames, dtype=np.int32), TILES),
        zoom_level=np.tile(zoom_pat.astype(np.int32), n_frames),
        boxes=np.tile(quads.astype(np.float32), (n_frames, 1)),
        frame_dbidx=np.arange(n_frames, dtype=np.int32),
        frame_starts=np.arange(0, (n_frames + 1) * TILES, TILES,
                               dtype=np.int32),
        frame_id=np.repeat(np.arange(n_frames, dtype=np.int32), TILES),
    )


def _drive_knnprop_rounds(idx, meta, ranker, *, rounds: int, metric: str,
                          seed: int, label: str = "",
                          iters_metric: str | None = None) -> dict:
    """One KnnProp2 serving drive through the REAL loop pieces: rank ->
    simulated labels -> ranker.update per round; rounds 0-1 pay the chain
    compiles, steady rounds are timed. Shared by the 1M and 10M graph
    stages (the loop is identical; only scale, rng seed and metric names
    differ — a prior inline copy of this loop had already drifted between
    the two stages). The drive-local rng means every ranker variant
    (plain/windowed/warm) sees the SAME query + label draws, so their
    round times and iteration counts are paired."""
    from seesaw_tpu.ops.propagation import DeferredPropagation
    from seesaw_tpu.runtime.bitmap import BitMap

    rng = np.random.default_rng(seed)
    qvec = rng.normal(size=512).astype(np.float32)
    # device scores flip the ranker into device mode: labels/prior stay
    # device-persistent and each round ships only the clicked ordinals
    ranker.set_base_scores(idx.score_device(qvec / np.linalg.norm(qvec)))
    returned = BitMap()
    round_ms, iters = [], []
    batch = 3
    for r in range(rounds):
        t0 = time.perf_counter()
        # windowed rankers hand rank_by_scores a DeferredPropagation: the
        # previous round's clicks + propagation + ranking run as ONE fused
        # dispatch here (steady rounds still contain exactly one propagation
        # + one rank each)
        res = idx.rank_by_scores(
            ranker.current_scores_any(), topk=batch,
            shortlist_size=SHORTLIST,
            exclude=returned, agg_method="avg_score", aug_larger="all",
        )
        got = list(res["dbidxs"])
        returned.update(got)
        # user labels the batch -> the ranker re-propagates on device
        # (eager path) or stages the round for the next rank (fused)
        rows = []
        for dbx in got:
            f = int(np.searchsorted(meta.frame_dbidx, dbx))
            rows.append(int(meta.frame_starts[f]))
        labels = (rng.random(len(rows)) < 0.3).astype(np.float64)
        ranker.update(np.asarray(rows), labels)
        cs = ranker.current_scores_any()
        if not isinstance(cs, DeferredPropagation):
            _ = float(cs[rows[0]])  # fetch barrier (eager path)
        # round 0 pays the plain-rank compile; round 1 the fused program's
        if r > 1:
            round_ms.append((time.perf_counter() - t0) * 1000)
            if iters_metric is not None:
                # Jacobi iterations this round (outside the timed window):
                # fused rounds ride it back with the result; eager rounds
                # expose the device scalar on lp.last_result
                ni = ranker.last_n_iter
                if ni is None and ranker.lp.last_result is not None:
                    ni = int(ranker.lp.last_result.n_iter)
                if ni is not None:
                    iters.append(int(ni))
        if r == 2:
            _progress(f"  rounds 0-1 done{label or ' (plain)'} "
                      "(compiles paid); steady rounds")
    flat = sorted(int(x) for x in returned)
    assert len(flat) == len(set(flat)) == rounds * batch
    out = {metric: round(float(np.percentile(round_ms, 50)), 2)}
    if iters_metric is not None and iters:
        out[iters_metric] = round(float(np.mean(iters)), 1)
    return out


def bench_graph_session(n_tiles: int = 1_048_576, rounds: int = 8) -> dict:
    """KnnProp2 serving round at 1M tiles through the REAL loop pieces:
    LabelPropagationRanker2.update (device Jacobi propagation, scores stay
    device-resident via device_out) -> index.rank_by_scores (device ranking
    tail + persistent exclusion). Graph edges are synthetic (serving cost is
    independent of edge quality); weights/config match configs.py knn_prop2.
    The database is generated ON DEVICE (build_db + from_device_arrays): the
    old host-side build (2GB gen + pad-gather + tunnel upload on 1 vCPU)
    cost minutes of silent budget and starved the stage.
    Reference: `loops/graph_based.py:73-121` + `label_propagation.py:30-43`.
    """
    from seesaw_tpu.indices.multiscale import MultiscaleIndex
    from seesaw_tpu.loops.knn_methods import LabelPropagationRanker2

    V, valid, boxes, zoom, row_scale, n_frames = build_db(
        n_tiles, dtype="bfloat16"
    )
    n_tiles = n_frames * TILES
    _progress(f"  graph db built on device ({n_tiles} tiles)")
    meta = _uniform_meta(n_frames, boxes, zoom)
    idx = MultiscaleIndex.from_device_arrays(
        embedding=None, V=V, valid=valid, boxes=boxes, zoom=zoom,
        meta=meta, use_pallas=False,
    )

    # graph edges: window-local (the post-RCM regime of a real kNN graph,
    # see ops.pallas_spmv), generated on device and SHARED with the
    # propagation stage (one build serves both)
    weights, layout = _window_local_graph(n_tiles, 32)
    _progress("  graph + windowed layout ready (device, shared)")

    def drive(ranker, label):
        return _drive_knnprop_rounds(
            idx, meta, ranker, rounds=rounds, seed=7, label=label,
            metric=f"p50_session_round_ms_knnprop2_1M{label}",
            iters_metric=f"jacobi_iters_per_round{label}",
        )

    ranker_opts = dict(
        normalize_scores=True, normalize_epsilon=0.1,
        sigmoid_before_propagate=True, calib_a=10.0, calib_b=-5.0,
        prior_weight=1.0,
    )
    out = drive(LabelPropagationRanker2(weights=weights, **ranker_opts), "")

    out.update(drive(
        LabelPropagationRanker2(
            weights=weights, windowed_layout=layout, **ranker_opts
        ),
        "_windowed",
    ))
    # warm_start=True resumes Jacobi from the previous round's converged
    # scores (PARITY item 16) — same compiled fused program (only the start
    # operand changes), so this drive pays no new compiles
    out.update(drive(
        LabelPropagationRanker2(
            weights=weights, windowed_layout=layout, warm_start=True,
            **ranker_opts
        ),
        "_warm",
    ))
    out["knnprop2_rounds_measured"] = rounds - 2
    # drop the ~2.3GB of graph HBM (db + slabs) before the 10M recall
    # stages build their 10GB databases
    del idx, weights, layout
    _GRAPH_CACHE.clear()
    import gc

    gc.collect()
    return out


def bench_graph_10M(target_tiles: int = 10_000_000, rounds: int = 8,
                    reps: tuple = (2, 3)) -> dict:
    """Graph path at HEADLINE scale: windowed propagation + the fused
    KnnProp2 serving round over ~10M tiles on one chip (driver-captured
    version of scripts/probe_graph_10M.py, which validated the HBM fit:
    slabs ~6.2GB + routed overflow 0.4GB + int8 db 5.2GB + aligned-layout
    temps 0.7GB on a 15.75GB chip). The slot budget scales down with N
    (_AUTO_SLAB_BYTES roof); selection runs on a 1M row sample — one
    traced-scalar `_occ_hist` program serves every candidate, shared with
    the 1M stage's compile cache entry (same (1048576, K) signature).
    Reference: `label_propagation.py:30-43` x300 host SpMV iterations and
    `graph_based.py:73-121` per feedback round, at 10x the reference's
    lvis-scale deployment."""
    import gc

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from seesaw_tpu.indices.multiscale import MultiscaleIndex
    from seesaw_tpu.knn_graph import SymmetricWeights
    from seesaw_tpu.loops.knn_methods import LabelPropagationRanker2
    from seesaw_tpu.ops.pallas_spmv import (
        _AUTO_SLAB_BYTES,
        _SLOT_BYTES,
        build_windowed_layout_device,
        select_windowed_params,
        with_routed_overflow,
    )
    from seesaw_tpu.ops.propagation import propagate_windowed

    n_frames = target_tiles // TILES // 1024 * 1024
    n_tiles = n_frames * TILES
    K = 32
    nbr, w = _make_window_local_edges(n_tiles, K)
    degree = w.sum(axis=1)
    jax.block_until_ready(degree)
    _progress(f"  10M graph on device ({n_tiles} tiles, 2.56GB)")

    slot_budget = max(16, int(_AUTO_SLAB_BYTES // (_SLOT_BYTES * n_tiles)))
    B, W, cap, cov_est, _ = select_windowed_params(
        nbr, budget=slot_budget, sample_rows=1_048_576
    )
    _progress(f"  selected B={B} W={W} cap={cap} cov~{cov_est:.3f} "
              f"(slot budget {slot_budget}/vertex)")
    layout = build_windowed_layout_device(nbr, w, B=B, W=W, cap=cap,
                                          chunk_rows=1_048_576)
    layout = with_routed_overflow(layout)
    _progress(f"  layout built: coverage {layout.coverage:.4f}, slabs "
              f"{layout.slab_bytes / 1e9:.2f}GB, routed overflow "
              f"{layout.routed.n_edges if layout.routed else 0} edges")
    out = {
        "graph_10M_layout": f"{B},{W},{cap}",
        "graph_10M_coverage": round(float(layout.coverage), 4),
        "graph_10M_slab_gb": round(layout.slab_bytes / 1e9, 2),
    }
    # the windowed path reads only `degree` — drop the 2.56GB (N, K) pair
    del nbr, w
    gc.collect()

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

    run(0.0, 50, jr.PRNGKey(100))  # compile (cached across runs)
    _progress("  windowed propagation compiled; measuring")
    fixed = [run(0.0, 50, jr.PRNGKey(200 + i))[0] for i in range(reps[0])]
    # 3 samples: the tunnel occasionally stalls one fresh-input dispatch
    # ~25s (observed in probe_graph_10M and the first r4g bench run, where
    # 2-sample percentile(50) AVERAGED the stall into a 13.6s "p50"); the
    # median of 3 rejects a single outlier
    conv = [run(1e-5, 300, jr.PRNGKey(300 + i)) for i in range(reps[1])]
    out["propagation_ms_per_iter_10M_windowed"] = round(min(fixed) / 50.0, 2)
    out["p50_propagation_ms_10M_windowed"] = round(
        float(np.percentile([c[0] for c in conv], 50)), 2)
    out["propagation_converged_iters_10M"] = int(np.median([c[1] for c in conv]))
    del labels, is_labeled

    # KnnProp2 serving round through the real loop pieces on the int8 db
    V, valid, boxes, zoom, row_scale, n_frames = build_db(n_tiles, dtype="int8")
    _progress("  int8 db on device (5.2GB); driving fused rounds")
    meta = _uniform_meta(n_frames, boxes, zoom)
    idx = MultiscaleIndex.from_device_arrays(
        embedding=None, V=V, valid=valid, boxes=boxes, zoom=zoom,
        meta=meta, row_scale=row_scale, use_pallas=False,
    )
    # empty (N, 0) nbr/w keep nvecs right without re-paying the freed 2.56GB
    weights = SymmetricWeights(
        nbr=np.empty((n_tiles, 0), np.int32),
        w=np.empty((n_tiles, 0), np.float32),
        degree=degree,
    )
    ranker_opts = dict(
        weights=weights, windowed_layout=layout,
        normalize_scores=True, normalize_epsilon=0.1,
        sigmoid_before_propagate=True, calib_a=10.0, calib_b=-5.0,
        prior_weight=1.0,
    )

    def drive(ranker, label):
        return _drive_knnprop_rounds(
            idx, meta, ranker, rounds=rounds, seed=0, label=label,
            metric=f"p50_session_round_ms_knnprop2_10M_windowed{label}",
        )

    out.update(drive(LabelPropagationRanker2(**ranker_opts), ""))
    # warm start resumes Jacobi from the previous round's converged scores —
    # the SAME compiled fused program (only the start operand changes)
    out.update(drive(
        LabelPropagationRanker2(warm_start=True, **ranker_opts), "_warm"))
    out["knnprop2_10M_rounds_measured"] = rounds - 2
    # free ~12GB (slabs + db) before the finetune stage
    del idx, ranker_opts, layout, weights, degree, V, valid, boxes, zoom
    gc.collect()
    return out


def bench_ens(n_tiles: int = 1_048_576, D: int = 32,
              horizon: int = 10) -> dict:
    """ENS one-step-lookahead utility over 1M candidates on device — the
    active-search planning step (`ops/ens.py`, re-deriving the reference's
    `_top_sum`, `efficient_nonmyopic_search.py:94-169`, which materializes
    N x (K+D) numpy matrices on the host). Chained dispatches, fresh
    scores per rep, value-fetch barrier."""
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.ops.ens import ens_expected_value

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    nbr = jax.random.randint(k1, (n_tiles, D), 0, n_tiles, dtype=jnp.int32)
    num = jax.random.uniform(k2, (n_tiles,), minval=0.05, maxval=0.95)
    den1 = jnp.ones(n_tiles) + jax.random.uniform(k3, (n_tiles,)) * 3.0
    jax.block_until_ready(nbr)
    R = 4

    @jax.jit
    def chain(nbr_a, num_a, den1_a, keys):
        def body(carry, k):
            scores = jax.random.uniform(
                k, (n_tiles,), minval=0.01, maxval=0.99
            ) + carry * 0.0
            ev = ens_expected_value(
                scores, num_a, den1_a, nbr_a, K=horizon, block_size=4096
            )
            return ev.max() * 0.0, ev.argmax()
        _, picks = jax.lax.scan(body, jnp.float32(0),
                                jax.random.split(keys, R))
        return picks.sum()

    float(chain(nbr, num, den1, jax.random.PRNGKey(0)))  # compile
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(chain(nbr, num, den1, jax.random.PRNGKey(i + 1)))
        ts.append((time.perf_counter() - t0) * 1000 / R)
    out = {
        "ens_lookahead_ms_1M": round(float(min(ts)), 2),
        "ens_horizon": horizon,
        "ens_D": D,
    }
    del nbr, num, den1
    import gc

    gc.collect()
    return out


def bench_graph_realknn(n_tiles: int = 2_097_152, K: int = 32,
                        d: int = 64) -> dict:
    """Windowed-SpMV propagation on a REAL exact-kNN graph at multi-million
    rows (VERDICT r4 next #3: the coverage-1.0 claim was measured at 1M
    only). The graph is the real thing: clustered unit vectors (CLIP
    embeddings of a real corpus cluster the same way), vertex order
    shuffled, exact kNN built by the product builder (`ops.knn.exact_knn`,
    the blocked MXU scan behind `knn_graph.KNNGraph.build`), RBF weights,
    RCM-relabeled — then `select_windowed_params` +
    `build_windowed_layout_device` + `propagate_windowed`, the serving
    path of `loops/graph_based.py` at 2x the old validation scale.

    The O(N^2 D) build + the O(N K) host RCM run ONCE and cache to disk
    (.cache/); every bench run RE-VERIFIES the cache on device (recompute
    exact neighbors for 512 random rows against the full matrix and check
    the cached edges) and measures layout + propagation FRESH."""
    import gc

    import jax
    import jax.numpy as jnp

    from seesaw_tpu.knn_graph import rbf_kernel
    from seesaw_tpu.ops.propagation import propagate_windowed
    from seesaw_tpu.ops.pallas_spmv import (
        build_windowed_layout_device,
        select_windowed_params,
        with_routed_overflow,
    )

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, f"realknn_{n_tiles}_{K}_{d}.npz")
    out: dict = {}

    if not os.path.exists(cache):
        from seesaw_tpu.ops.knn import exact_knn
        from seesaw_tpu.ops.pallas_spmv import apply_order, rcm_order

        _progress(f"  realknn: building exact kNN at {n_tiles} (one-time)")
        rng = np.random.default_rng(0)
        ncl = 16384
        centers = rng.normal(size=(ncl, d)).astype(np.float32)
        V = centers[np.arange(n_tiles) % ncl] * 3.0
        V += rng.normal(size=(n_tiles, d)).astype(np.float32)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        perm = rng.permutation(n_tiles)
        V = np.ascontiguousarray(V[perm])
        t0 = time.time()
        nbr, dist = exact_knn(V, K)
        build_s = time.time() - t0
        _progress(f"  realknn: built in {build_s:.0f}s; RCM relabel (host)")
        t0 = time.time()
        order = rcm_order(nbr)
        rcm_s = time.time() - t0
        w = rbf_kernel(0.1)(dist).astype(np.float32)
        nbr_r, w_r, inv = apply_order(nbr, w, order)
        V_r = np.ascontiguousarray(V[order])
        np.savez(cache, nbr=nbr_r, w=w_r, V=V_r,
                 build_s=build_s, rcm_s=rcm_s)
        del V, nbr, dist, w, order, inv
        gc.collect()

    data = np.load(cache)
    nbr, w, V = data["nbr"], data["w"], data["V"]
    out["realknn_build_s_cached"] = round(float(data["build_s"]), 1)
    out["realknn_rcm_s_cached"] = round(float(data["rcm_s"]), 1)
    n_tiles = nbr.shape[0]
    _progress(f"  realknn: graph loaded ({n_tiles} x {K}); verifying sample")

    # fresh on-device verification that the cached edges ARE the exact kNN:
    # recompute the neighbor set of 512 random rows against the full matrix
    rngv = np.random.default_rng(int(time.time()) % 100000)
    sample = np.sort(rngv.choice(n_tiles, size=512, replace=False))
    Vd = jnp.asarray(V, dtype=jnp.bfloat16)

    @jax.jit
    def sample_knn(Vs, Vall, rows):
        sims = jnp.dot(Vs, Vall.T, preferred_element_type=jnp.float32)
        sims = jnp.where(
            rows[:, None] == jnp.arange(Vall.shape[0])[None, :],
            -jnp.inf, sims,
        )
        return jax.lax.top_k(sims, K)[1]

    got = np.asarray(
        sample_knn(Vd[sample], Vd, jnp.asarray(sample, jnp.int32))
    )
    overlap = np.mean([
        len(set(got[i]) & set(nbr[sample[i]])) / K for i in range(512)
    ])
    out["realknn_verify_overlap"] = round(float(overlap), 4)
    assert overlap > 0.95, f"cached graph failed verification ({overlap})"
    del Vd, got
    gc.collect()

    nbr_d = jnp.asarray(nbr)
    w_d = jnp.asarray(w)
    degree = w_d.sum(axis=1)
    jax.block_until_ready(degree)
    _progress("  realknn: selecting layout")
    B, W, cap, cov_est, _ = select_windowed_params(
        nbr_d, sample_rows=min(n_tiles, 1_048_576)
    )
    layout = build_windowed_layout_device(
        nbr_d, w_d, B=B, W=W, cap=cap, chunk_rows=1_048_576
    )
    layout = with_routed_overflow(layout)
    _progress(f"  realknn: layout B={B} W={W} cap={cap} coverage "
              f"{layout.coverage:.4f}; measuring propagation")
    scale_tag = f"{n_tiles // 1_000_000}M"
    out[f"realknn_{scale_tag}_layout"] = f"{B},{W},{cap}"
    out[f"realknn_{scale_tag}_coverage"] = round(float(layout.coverage), 4)
    del nbr_d, w_d, nbr, w
    gc.collect()

    labels = jnp.zeros(n_tiles).at[
        jnp.arange(0, n_tiles, n_tiles // 32)].set(1.0)
    is_labeled = jnp.zeros(n_tiles, dtype=bool).at[
        jnp.arange(0, n_tiles, n_tiles // 64)].set(True)

    def run(eps, max_iter, key):
        prior = jax.random.uniform(key, (n_tiles,), minval=0.01, maxval=0.99)
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

    run(0.0, 50, jax.random.PRNGKey(100))  # compile
    fixed = [run(0.0, 50, jax.random.PRNGKey(200 + i))[0] for i in range(2)]
    conv = [run(1e-5, 300, jax.random.PRNGKey(300 + i)) for i in range(3)]
    out[f"propagation_ms_per_iter_{scale_tag}_realknn"] = round(
        min(fixed) / 50.0, 2)
    out[f"p50_propagation_ms_{scale_tag}_realknn"] = round(
        float(np.percentile([c[0] for c in conv], 50)), 2)
    out[f"propagation_converged_iters_{scale_tag}_realknn"] = int(
        np.median([c[1] for c in conv]))
    del layout, degree, labels, is_labeled, V
    gc.collect()
    return out


def _progress(msg):
    import sys

    print(f"[bench] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Resilient emission (VERDICT r3 #1): extras accumulate in a module-level
# dict and the headline JSON prints from an atexit/SIGTERM handler with
# whatever has completed — a driver timeout degrades to a PARTIAL record
# instead of `parsed: null`. Every stage runs under a wall-time budget; a
# stage whose estimated cost exceeds the remaining budget is skipped with a
# recorded reason instead of eating the harness deadline.
EXTRAS: dict = {}
_HEADLINE = {"device_ms": None, "p50_wall": None}
_EMITTED = False
_T_START = time.time()


_LAST_GOOD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_last_good.json"
)


def _save_last_good(record: dict) -> None:
    """Persist a full-scale record so an outage-stricken later run can at
    least point at the most recent real numbers (clearly labeled)."""
    extras = record.get("extras", {})
    full_scale = extras.get("n_vectors", 0) >= 9_000_000
    env_skips = any(
        k.startswith("skipped_") and v == "env" for k, v in extras.items()
    )
    if record.get("value") is None or not full_scale or env_skips:
        return
    try:
        with open(_LAST_GOOD_PATH, "w") as f:
            json.dump({"saved_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                       "record": record}, f)
    except OSError:
        pass


def _attach_last_good(extras: dict) -> None:
    """A record with value null self-documents: ship the most recent real
    (full-scale, no-env-skip) record alongside, labeled as stale."""
    try:
        with open(_LAST_GOOD_PATH) as f:
            prior = json.load(f)
    except (OSError, ValueError):
        return
    extras["last_good_record"] = prior
    extras["last_good_note"] = (
        "this run produced no fresh headline (tunnel outage/timeout); "
        "last_good_record holds the most recent successful full-scale "
        "record from this workspace, NOT a fresh measurement"
    )


def _emit(partial: bool = False):
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    device_ms = _HEADLINE["device_ms"]
    extras = dict(EXTRAS)
    if partial:
        extras["partial"] = True
    if _HEADLINE["p50_wall"] is not None:
        extras["p50_rerank_wall_ms"] = round(_HEADLINE["p50_wall"], 3)
    extras["bench_total_s"] = round(time.time() - _T_START, 1)
    if device_ms is None:
        _attach_last_good(extras)
        out = {
            "metric": "p50_rerank_device_ms_10M_vectors",
            "value": None,
            "unit": "ms",
            "vs_baseline": None,
            "extras": extras,
        }
    else:
        # headline = TPU device time per re-rank: this environment
        # dispatches through a network tunnel with ~30ms per-call latency
        # that a real (host-attached) deployment does not pay; wall-clock
        # numbers are in extras for completeness
        out = {
            "metric": "p50_rerank_device_ms_10M_vectors",
            "value": round(device_ms, 3),
            "unit": "ms",
            "vs_baseline": round(50.0 / device_ms, 3),
            "extras": extras,
        }
        _save_last_good(out)
    print(json.dumps(out), flush=True)


def _install_emergency_emit():
    import atexit
    import signal

    atexit.register(lambda: _emit(partial=True))

    def on_signal(signum, frame):  # pragma: no cover - timeout path
        _progress(f"signal {signum}: emitting partial record")
        _emit(partial=True)
        raise SystemExit(128 + signum)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, on_signal)
        except (ValueError, OSError):
            pass


def _budget_s() -> float:
    # 1600 fits the observed worst case (a slow-tunnel full run measured
    # 1350s WITH graph_10M budget-skipped at est 300s; warm runs measure
    # 400-800s) while leaving headroom under the harness deadline; the
    # SIGTERM/atexit emitters still turn any overrun into a partial record
    return float(os.environ.get("SEESAW_BENCH_BUDGET_S", 1600))


def _remaining_s() -> float:
    return _budget_s() - (time.time() - _T_START)


_HISTORY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_stage_history.json"
)
_HISTORY: dict = {}


def _load_history() -> dict:
    try:
        with open(_HISTORY_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _record_history(name: str, dt: float, ok: bool) -> None:
    """Append a measured stage duration (successful runs only — a fast
    failure would teach a falsely cheap estimate). Keeps the last 8."""
    if not ok:
        return
    hist = _HISTORY.setdefault(name, [])
    hist.append(round(dt, 1))
    del hist[:-8]
    try:
        with open(_HISTORY_PATH, "w") as f:
            json.dump(_HISTORY, f)
    except OSError:
        pass


def _est_s(name: str, default_s: float) -> float:
    """Budget estimate for a stage: measured history beats the static
    default (the r4 outage run showed static estimates forfeit most of the
    record under a squeezed budget). Only the LAST TWO runs count — they
    reflect the current compile-cache state; an all-time max keeps a cold
    outlier alive forever (graph_10M: 591 s cold once, ~150 s every warm
    run after) and that inflated estimate is itself what causes skips."""
    hist = _HISTORY.get(name)
    if hist:
        return max(hist[-2:]) * 1.3
    return default_s


def _err_chain(e: BaseException) -> str:
    """repr of an exception plus its __cause__ chain — the r4 ingest record
    carried only the outer RuntimeError, hiding the root cause."""
    parts = [repr(e)]
    seen = {id(e)}
    c = e.__cause__ or e.__context__
    while c is not None and id(c) not in seen:
        parts.append(f"caused by {c!r}")
        seen.add(id(c))
        c = c.__cause__ or c.__context__
    return " <- ".join(parts[:4])


def _stage(name: str, est_s: float, fn, *, skip_env: str | None = None,
           retry: bool = True) -> bool:
    """Run one bench stage under the budget. Returns True if it ran and its
    result dict was merged into EXTRAS (scalar results: fn stores directly).
    All stages retry once by default (observed failures are transient tunnel
    wedges, not code paths) — gated on the budget still affording a rerun."""
    if skip_env and os.environ.get(skip_env):
        EXTRAS[f"skipped_{name}"] = "env"
        return False
    est = _est_s(name, est_s)
    if est > _remaining_s():
        _progress(f"SKIP {name}: est {est:.0f}s > remaining {_remaining_s():.0f}s")
        EXTRAS[f"skipped_{name}"] = f"budget (est {est:.0f}s)"
        return False
    _progress(f"stage {name} (est {est:.0f}s, remaining budget "
              f"{_remaining_s():.0f}s)")
    t0 = time.time()
    try:
        out = fn()
        if isinstance(out, dict):
            EXTRAS.update(out)
        dt = time.time() - t0
        EXTRAS[f"stage_s_{name}"] = round(dt, 1)
        _record_history(name, dt, ok=True)
        EXTRAS.pop(f"{name}_error", None)  # a drain retry cleared the error
        return True
    except Exception as e:
        spent = time.time() - t0
        if retry and _remaining_s() > est + 30:
            _progress(f"{name} failed ({e!r}); retrying once after 30s")
            import gc

            gc.collect()
            time.sleep(30)
            try:
                out = fn()
                if isinstance(out, dict):
                    EXTRAS.update(out)
                dt = time.time() - t0
                EXTRAS[f"stage_s_{name}"] = round(dt, 1)
                _record_history(name, dt - spent - 30, ok=True)
                EXTRAS.pop(f"{name}_error", None)
                return True
            except Exception as e2:
                e = e2
        EXTRAS[f"{name}_error"] = _err_chain(e)
        EXTRAS[f"stage_s_{name}"] = round(time.time() - t0, 1)
        _FAILED.append((name, est_s, fn))  # end-of-run drain candidate
        return False


_FAILED: list = []


def _drain_failed_stages():
    """One more attempt at stages that failed earlier in the run: the
    observed failure mode is a transient tunnel wedge, and by end-of-run the
    tunnel has usually recovered (r4's ingest error would have cleared
    here). Cheapest first, budget-gated."""
    if not _FAILED:
        return
    todo, _FAILED[:] = sorted(_FAILED, key=lambda x: _est_s(x[0], x[1])), []
    for name, est_default, fn in todo:
        if f"stage_s_{name}" in EXTRAS and f"{name}_error" not in EXTRAS:
            continue  # a retry already succeeded
        est = _est_s(name, est_default)
        if est > _remaining_s():
            continue
        _progress(f"drain: retrying failed stage {name}")
        _stage(f"{name}", est_default, fn, retry=False)


def _enable_compile_cache():
    """Persistent XLA compilation cache: the 10M-row chained programs cost
    300-400s of (remote) compile EACH on this toolchain (the r3 bench
    timeout was mostly compile — scripts/bisect_chain_compile.py); with the
    cache, repeat runs load executables in seconds. Disable with
    SEESAW_BENCH_NO_COMPILE_CACHE=1."""
    if os.environ.get("SEESAW_BENCH_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        EXTRAS["compile_cache_dir"] = cache_dir
    except Exception as e:  # pragma: no cover - older jax knob names
        EXTRAS["compile_cache_error"] = repr(e)


def main():
    from seesaw_tpu.utils.profiling import maybe_trace_from_env

    _install_emergency_emit()
    _enable_compile_cache()
    _HISTORY.update(_load_history())
    with maybe_trace_from_env():  # SEESAW_PROFILE_DIR=<dir> for a jax trace
        _main()
        _drain_failed_stages()
    _emit()


def _main():
    n_vectors = int(os.environ.get("SEESAW_BENCH_VECTORS", 10_000_000))
    use_pallas = os.environ.get("SEESAW_BENCH_NO_PALLAS") is None
    # first device contact: if the tunnel/worker is wedged (observed: a
    # trivial dispatch can block indefinitely after a killed TPU process),
    # this is where the run hangs — the stderr line tells the reader, and
    # the SIGTERM handler still emits a (value: null) partial record
    _progress("first device contact (rtt probe)")
    EXTRAS["tunnel_rtt_ms"] = round(measure_rtt(), 2)
    # the supervisor watches for this exact phrase — the observed tunnel
    # failure mode is an indefinite block right here, BEFORE any stage
    _progress(f"device contact ok (rtt {EXTRAS['tunnel_rtt_ms']}ms)")

    # -- headline stages first, so a timeout still leaves the core record --
    def run_bf16():
        bf16 = bench_rerank(n_vectors, dtype="bfloat16", use_pallas=use_pallas)
        _HEADLINE["device_ms"] = bf16["device_ms"]
        _HEADLINE["p50_wall"] = bf16["p50_ms"]
        return {
            "p90_rerank_ms": round(bf16["p90_ms"], 3),
            "p50_device_ms_bf16": round(bf16["device_ms"], 3),
            "n_vectors": bf16["n_vectors"],
        }

    _stage("rerank_bf16", 150, run_bf16)

    def run_int8():
        i8 = bench_rerank(n_vectors, dtype="int8", use_pallas=use_pallas)
        out = {
            "p50_rerank_ms_int8": round(i8["p50_ms"], 3),
            "p50_device_ms_int8": round(i8["device_ms"], 3),
            # also recorded here so _save_last_good's full-scale test holds
            # when bf16 failed but int8 produced the headline
            "n_vectors": i8["n_vectors"],
        }
        if _HEADLINE["device_ms"] is None or i8["device_ms"] < _HEADLINE["device_ms"]:
            if _HEADLINE["p50_wall"] is not None:
                out["p50_rerank_ms_bf16"] = round(_HEADLINE["p50_wall"], 3)
            _HEADLINE["device_ms"] = i8["device_ms"]
            _HEADLINE["p50_wall"] = i8["p50_ms"]
        return out

    _stage("rerank_int8", 150, run_int8)
    if _HEADLINE["device_ms"] is not None:
        EXTRAS["p50_device_ms"] = round(_HEADLINE["device_ms"], 3)
        EXTRAS["topk_qps_device"] = round(1000.0 / _HEADLINE["device_ms"], 1)

    def run_clip():
        return {"clip_embed_img_per_s_chip": round(bench_clip_embed(), 1)}

    _stage("clip", 240, run_clip, skip_env="SEESAW_BENCH_SKIP_CLIP")

    _stage("session", 180, lambda: bench_session_rounds(n_vectors),
           skip_env="SEESAW_BENCH_SKIP_SESSION")

    # per-ROW-scale int8 loses the (N,D)@(D,16) batch matmul to bf16 (the
    # dequant chain de-fuses the frame-max tail); per-FRAME scales below
    # win it — all three measured so the record shows the ordering
    _stage("multiq_int8", 100, lambda: bench_multi_query(n_vectors),
           skip_env="SEESAW_BENCH_SKIP_MULTIQ")
    _stage("multiq_bf16", 100,
           lambda: bench_multi_query(n_vectors, dtype="bfloat16"),
           skip_env="SEESAW_BENCH_SKIP_MULTIQ")
    # per-frame-scale int8: int32 tile max before dequant keeps the
    # matmul->max fusion — the fastest batch scan (perf_probe stage K)
    _stage("multiq_int8_frame", 100,
           lambda: bench_multi_query(n_vectors, dtype="int8_frame"),
           skip_env="SEESAW_BENCH_SKIP_MULTIQ")

    _stage("refine", 60, bench_refine, skip_env="SEESAW_BENCH_SKIP_REFINE")

    # active-search planning step at serving scale (ops/ens.py)
    _stage("ens", 90, bench_ens, skip_env="SEESAW_BENCH_SKIP_GRAPH")

    _stage("ingest", 300, bench_ingest, skip_env="SEESAW_BENCH_SKIP_INGEST")

    # graph path at scale (VERDICT r3 missing #4); graphs + windowed
    # layouts are device-generated and shared between the two stages
    _stage("propagation", 150, bench_propagation,
           skip_env="SEESAW_BENCH_SKIP_GRAPH")
    _stage("graph_session", 150, bench_graph_session,
           skip_env="SEESAW_BENCH_SKIP_GRAPH")
    # REAL exact-kNN graph at 2M (VERDICT r4 #3): one-time cached build,
    # fresh per-run verification + layout + propagation. First run (no
    # cache) costs the build; the static est covers the warm path, so a
    # cacheless workspace skips it under a squeezed budget rather than
    # blowing the record
    _stage("graph_realknn", 200 if os.path.exists(os.path.join(
               os.path.dirname(os.path.abspath(__file__)),
               ".cache", "realknn_2097152_32_64.npz")) else 700,
           bench_graph_realknn, skip_env="SEESAW_BENCH_SKIP_GRAPH")

    # graph path at HEADLINE scale (only at the full 10M config) runs
    # BEFORE the recall trio: it is the round's flagship graph number and
    # the single biggest stage, so under a squeezed budget (tunnel outages
    # eat ~150s per wedge) the small recall stages get skipped before it
    # does. Memory is sequential either way: bench_graph_10M frees its
    # ~12GB (slabs + int8 db) before returning, the recall stages build
    # their own databases after.
    if n_vectors >= 10_000_000:
        _stage("graph_10M", 300, lambda: bench_graph_10M(n_vectors),
               skip_env="SEESAW_BENCH_SKIP_GRAPH")

    # 10M sweep first (the headline-scale claim): one generated database,
    # 8 trials — ~30s warm, ~120s cold (r3's budget-eater tamed)
    _stage("recall_10M", 150,
           lambda: bench_int8_recall_at_scale(n_vectors, trials=8),
           skip_env="SEESAW_BENCH_SKIP_RECALL")
    # the batch-serving (per-frame-scale) quantization's accuracy at the
    # same scale its speed is claimed: separate stage so the two 5GB int8
    # copies never coexist in HBM
    _stage("recall_10M_frame", 120,
           lambda: bench_int8_recall_at_scale(n_vectors, trials=8,
                                              scale="frame"),
           skip_env="SEESAW_BENCH_SKIP_RECALL")
    # 1M recall through the same on-device chunked generator (the old
    # host-side numpy generation + 3GB tunnel upload cost 403s of budget
    # for the same answer and starved the stages behind it); scale='both'
    # shares one generated database across the two quantizations
    _stage("recall_1M", 90,
           lambda: bench_int8_recall_at_scale(1_000_000, trials=12,
                                              scale="both"),
           skip_env="SEESAW_BENCH_SKIP_RECALL")

    # DB-matched-training throughput (fwd+bwd through the fused attention
    # backward); last so the headline stages never pay its compile
    _stage("finetune", 150, bench_finetune,
           skip_env="SEESAW_BENCH_SKIP_FINETUNE")

    # transfer-free ingest bound for an attached v5e-8 host: encode is the
    # binding resource (8 chips x measured ViT rate / tiles-per-image);
    # JPEG decode measured ~215 img/s PER CORE (this VM has 1 vCPU; a v5e-8
    # host has ~200, needing only ~25 cores to keep the chips fed; with
    # tiling='device' the host does decode only). The wall number above
    # additionally times this environment's network tunnel.
    if "clip_embed_img_per_s_chip" in EXTRAS and "ingest_tiles_per_image" in EXTRAS:
        encode_img_per_s_chip = (
            EXTRAS["clip_embed_img_per_s_chip"] / EXTRAS["ingest_tiles_per_image"]
        )
        EXTRAS["ingest_encode_img_per_s_chip"] = round(encode_img_per_s_chip, 1)
        EXTRAS["ingest_1M_images_v5e8_min_bound"] = round(
            1e6 / (8 * encode_img_per_s_chip) / 60.0, 2
        )
        # measured e2e vs bound, stated in the record itself (VERDICT r3
        # weak #5): this environment (1 vCPU + tunnel) cannot reach the
        # bound; both numbers ship so the gap is explicit
        if "ingest_img_per_s_chip" in EXTRAS:
            EXTRAS["ingest_note"] = (
                "measured e2e is 1-vCPU + tunnel bound; the v5e-8 bound is "
                "encode-rate arithmetic (see ingest_env_bound_img_per_s)"
            )


def _last_json_line(lines) -> str | None:
    for ln in reversed(lines):
        ln = ln.strip()
        if ln.startswith("{") and '"metric"' in ln:
            return ln
    return None


def _supervise() -> int:
    """Babysit the real bench run against tunnel wedges.

    Observed failure mode in this environment (three times in round 4): the
    first device contact through the axon tunnel blocks INDEFINITELY after a
    previously-killed TPU process — the child sits in a C-level wait where
    even its SIGTERM partial-emit handler cannot run. The supervisor spawns
    the bench as a child process, requires the "device contact ok" stderr
    line within SEESAW_BENCH_CONTACT_S (default 120s — normal contact is
    1-3s after the ~15s import; the wedge never recovers without a kill,
    so waiting longer only burns driver budget), kills + retries on a
    pre-contact wedge (the tunnel usually un-wedges after the stuck client
    dies), enforces a post-contact stall timeout (SEESAW_BENCH_STALL_S,
    default 600s — longer than the worst cold compile), and ALWAYS forwards
    exactly one headline JSON line to stdout, falling back to a partial
    record it prints itself. Total wall across attempts is capped by
    SEESAW_BENCH_TOTAL_S (default 1680s) to stay inside the driver deadline.

    SEESAW_BENCH_NO_SUPERVISE=1 runs the bench inline (single process).
    """
    import signal
    import subprocess
    import sys
    import threading

    total_s = float(os.environ.get("SEESAW_BENCH_TOTAL_S", 1680))
    # normal contact is 1-3s after the ~15s import; 75s is still 3x margin,
    # and a cheaper wedge leaves the retry attempt budget for the skipped
    # tail stages (the r5 run-1 wedge cost finetune its slot at 120s)
    first_contact_s = float(os.environ.get("SEESAW_BENCH_CONTACT_S", 75))
    stall_s = float(os.environ.get("SEESAW_BENCH_STALL_S", 600))
    t0 = time.time()
    out_lines: list[str] = []
    attempts = 0
    stop = {"flag": False}
    child: dict = {"proc": None}

    def remaining() -> float:
        return total_s - (time.time() - t0)

    def on_signal(signum, frame):  # driver timeout: pass it down, then forward
        stop["flag"] = True
        p = child["proc"]
        if p is not None and p.poll() is None:
            try:
                p.terminate()
            except OSError:
                pass

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, on_signal)
        except (ValueError, OSError):
            pass

    # a wedged attempt costs only ~150s (120s contact timeout + kill +
    # cooldown), so the real bound is the wall budget, not the count —
    # three consecutive wedges were observed (r4) with 1150s still unspent
    while attempts < 8 and not stop["flag"] and remaining() > 300:
        attempts += 1
        env = dict(os.environ)
        env["SEESAW_BENCH_CHILD"] = "1"
        env["SEESAW_BENCH_BUDGET_S"] = str(int(max(300, remaining() - 90)))
        _progress(
            f"supervisor: attempt {attempts} "
            f"(child budget {env['SEESAW_BENCH_BUDGET_S']}s)"
        )
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        child["proc"] = p
        state = {"last": time.time(), "contact": False}

        def pump(stream, is_err, state=state):
            for line in stream:
                state["last"] = time.time()
                if is_err:
                    sys.stderr.write(line)
                    sys.stderr.flush()
                    if "device contact ok" in line:
                        state["contact"] = True
                else:
                    out_lines.append(line)
            stream.close()

        th_e = threading.Thread(target=pump, args=(p.stderr, True), daemon=True)
        th_o = threading.Thread(target=pump, args=(p.stdout, False), daemon=True)
        th_e.start()
        th_o.start()

        wedged = False
        while p.poll() is None and not stop["flag"]:
            time.sleep(2)
            silent = time.time() - state["last"]
            if not state["contact"] and silent > first_contact_s:
                _progress(f"supervisor: no device contact in {silent:.0f}s — "
                          "tunnel wedged, killing child")
                wedged = True
                break
            if state["contact"] and silent > stall_s:
                _progress(f"supervisor: no progress in {silent:.0f}s — "
                          "killing child")
                wedged = True
                break
            if remaining() < 45:
                _progress("supervisor: total budget exhausted — terminating "
                          "child (it emits its partial record)")
                try:
                    p.terminate()
                except OSError:
                    pass
                break

        if p.poll() is None:
            if wedged:
                try:
                    p.terminate()  # give the partial-emit handler a chance
                    p.wait(timeout=15)
                except (subprocess.TimeoutExpired, OSError):
                    p.kill()
            try:
                p.wait(timeout=30)
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()
        th_e.join(timeout=5)
        th_o.join(timeout=5)

        last = _last_json_line(out_lines)
        have_value = False
        if last is not None:
            try:
                have_value = json.loads(last).get("value") is not None
            except ValueError:
                pass
        if have_value or stop["flag"]:
            break
        if remaining() > 600:
            cool = min(30 * attempts, 120)  # persistent wedges: back off
            _progress(f"supervisor: no headline value yet — cooling down "
                      f"{cool}s, then retrying")
            time.sleep(cool)
            continue
        break

    line = _last_json_line(out_lines)
    if line is None:
        EXTRAS["supervisor_attempts"] = attempts
        EXTRAS["supervisor_wedged"] = True
        _emit(partial=True)
    else:
        print(line, flush=True)
    return 0


if __name__ == "__main__":
    if os.environ.get("SEESAW_BENCH_CHILD") or os.environ.get(
        "SEESAW_BENCH_NO_SUPERVISE"
    ):
        main()
    else:
        raise SystemExit(_supervise())
