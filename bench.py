"""Headline benchmark on the real chip. Prints ONE JSON line.

Primary metric: p50 per-feedback re-rank latency over a 10M-vector
multiscale database (BASELINE.md target: < 50 ms on-device). The re-rank is
the full fused query program — bf16 matvec over the HBM-resident matrix,
distinct-frame shortlist under exclusion, frame augmentation, final top-k.
Also measures CLIP ViT-B/32 embed throughput (images/sec/chip).

Env overrides: SEESAW_BENCH_VECTORS (default 10_000_000),
SEESAW_BENCH_SKIP_CLIP=1 to skip the embed benchmark.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def build_db(n_vectors: int, d: int = 512, tiles_per_frame: int = 8,
             dtype: str = "bfloat16"):
    import jax
    import jax.numpy as jnp

    # frame count padded to the Pallas kernel's 1024-frame block granularity
    n_frames = (n_vectors // tiles_per_frame // 1024) * 1024
    n_vectors = n_frames * tiles_per_frame

    key = jax.random.PRNGKey(0)
    if dtype == "int8":
        # chunked generation: full-size random bits would transiently need
        # several x the final 5GB
        n_chunks = 16
        rows = n_vectors // n_chunks

        @jax.jit
        def gen_chunk(k):
            bits = jax.random.bits(k, (rows, d), dtype=jnp.uint8)
            return jax.lax.bitcast_convert_type(bits, jnp.int8)

        keys = jax.random.split(key, n_chunks)
        chunks = [gen_chunk(k) for k in keys]
        V = jnp.concatenate(chunks)
        del chunks
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
    return V, valid, boxes, zoom, n_frames


def bench_rerank(n_vectors: int, dtype: str = "bfloat16"):
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.ops import frame_scoring

    d = 512
    V, valid, boxes, zoom, n_frames = build_db(n_vectors, d, dtype=dtype)
    excluded = jnp.zeros(n_frames, dtype=bool)

    from seesaw_tpu.ops.pallas_scoring import query_program_fused

    use_pallas = os.environ.get("SEESAW_BENCH_NO_PALLAS") is None

    def run(qvec, excluded):
        if use_pallas:
            return query_program_fused(
                V, valid, boxes, zoom, qvec, excluded,
                shortlist_size=50, topk=10, tile_bound=8, block_frames=1024,
                aug_larger="all", aug_weight="level_max",
                agg_method="avg_score", max_zoom=3,
            )
        return frame_scoring.query_program(
            V, valid, boxes, zoom, qvec, None, excluded,
            shortlist_size=50, topk=10,
            aug_larger="all", aug_weight="level_max", agg_method="avg_score",
            max_zoom=3,
        )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=d).astype(np.float32))
    res = run(q, excluded)  # compile
    jax.block_until_ready(res)

    lat = []
    for i in range(30):
        q = jnp.asarray(rng.normal(size=d).astype(np.float32))
        t0 = time.perf_counter()
        res = run(q, excluded)
        jax.block_until_ready(res)
        lat.append((time.perf_counter() - t0) * 1000)
        # evolving exclusion set, like a real session
        excluded = excluded.at[int(res.frame_ids[0])].set(True)
    # free the database before the caller builds the next variant
    del V, valid, boxes, zoom, excluded, res
    import gc

    gc.collect()
    return float(np.percentile(lat, 50)), float(np.percentile(lat, 90)), n_frames * 8


def bench_clip_embed():
    import jax
    import jax.numpy as jnp

    from seesaw_tpu.models.clip import ClipEmbedding

    emb = ClipEmbedding(variant="vit-b32", dtype=jnp.bfloat16)
    B = 128
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    out = emb.encode_image_batch(px)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = emb.encode_image_batch(px)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return B * iters / dt


def main():
    n_vectors = int(os.environ.get("SEESAW_BENCH_VECTORS", 10_000_000))
    p50, p90, n_actual = bench_rerank(n_vectors, dtype="bfloat16")
    extras = {"p90_rerank_ms": round(p90, 3), "n_vectors": n_actual,
              "topk_qps": round(1000.0 / p50, 1)}
    try:
        p50_i8, p90_i8, _ = bench_rerank(n_vectors, dtype="int8")
        extras["p50_rerank_ms_int8"] = round(p50_i8, 3)
        extras["p90_rerank_ms_int8"] = round(p90_i8, 3)
        if p50_i8 < p50:
            extras["p50_rerank_ms_bf16"] = round(p50, 3)
            p50 = p50_i8
            extras["topk_qps"] = round(1000.0 / p50, 1)
    except Exception as e:
        extras["int8_error"] = repr(e)
    if not os.environ.get("SEESAW_BENCH_SKIP_CLIP"):
        try:
            extras["clip_embed_img_per_s_chip"] = round(bench_clip_embed(), 1)
        except Exception as e:  # keep the headline metric even if CLIP fails
            extras["clip_embed_error"] = repr(e)

    print(
        json.dumps(
            {
                "metric": "p50_rerank_ms_10M_vectors",
                "value": round(p50, 3),
                "unit": "ms",
                "vs_baseline": round(50.0 / p50, 3),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
