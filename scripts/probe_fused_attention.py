"""On-chip A/B: ViT-B/32 embed throughput, einsum attention vs the fused
pair-packed Pallas kernel (ops/pallas_attention.py), plus a block_b sweep.

Runs on the REAL TPU (the one allowed TPU process). Timing per the verify
skill: ITERS batches chained in one jitted lax.scan with data deps, fresh
key per rep, float() fetch barrier.

Usage: timeout 900 python scripts/probe_fused_attention.py > /tmp/fused_attn.log 2>&1
"""
import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from seesaw_tpu.models.clip import ClipEmbedding, ClipModel  # noqa: E402
from seesaw_tpu.ops import pallas_attention  # noqa: E402

B, ITERS = 1024, 8


def measure(model, params, tag):
    @jax.jit
    def chained(p, key):
        def body(carry, k):
            px = jax.random.normal(k, (B, 224, 224, 3), dtype=jnp.float32) + carry
            f = model.apply({"params": p}, px, method=ClipModel.encode_image)
            return f.sum() * 0.0, f[0, 0]

        _, outs = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, ITERS))
        return outs.sum()

    t0 = time.perf_counter()
    float(chained(params, jax.random.PRNGKey(0)))
    print(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(chained(params, jax.random.PRNGKey(i + 1)))
        ts.append(time.perf_counter() - t0)
    rate = B * ITERS / min(ts)
    print(f"[{tag}] img/s = {rate:.0f}  (runs: {[f'{t:.3f}' for t in ts]})",
          flush=True)
    return rate


def main():
    print("devices:", jax.devices(), flush=True)
    emb = ClipEmbedding(variant="vit-b32", dtype=jnp.bfloat16)
    params = emb.params

    base_cfg = dataclasses.replace(emb.cfg, fused_attention=False)
    measure(ClipModel(base_cfg), params, "einsum")

    fused_cfg = dataclasses.replace(emb.cfg, fused_attention=True)
    fused_model = ClipModel(fused_cfg)
    orig = pallas_attention.fused_pair_attention
    for bb in (8, 16, 32):
        pallas_attention.fused_pair_attention = functools.partial(orig, block_b=bb)
        try:
            measure(fused_model, params, f"fused bb={bb}")
        except Exception as e:  # noqa: BLE001
            print(f"[fused bb={bb}] FAILED: {e!r}", flush=True)
    pallas_attention.fused_pair_attention = orig


if __name__ == "__main__":
    main()
