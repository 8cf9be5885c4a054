"""On-chip A/B: contrastive fine-tune step (fwd+bwd through BOTH towers),
einsum attention vs the fused pair-packed kernel with its new Pallas
BACKWARD (ops/pallas_attention._attn_bwd_kernel).

History: with the backward-by-einsum VJP the fused kernel netted out
NEUTRAL for training (2034 einsum vs 1994 fused pairs/s, B=256, r4) —
the VJP's einsum forward recompute ate the forward win. The Pallas
backward recomputes the softmax inside the kernel instead.

Runs on the REAL TPU (the one allowed TPU process). Timing per the verify
skill: ITERS steps chained in one jitted lax.scan with params threaded
through (data dep), fresh key per rep, float() fetch barrier.

Usage: timeout 900 python scripts/probe_fused_attention_bwd.py > /tmp/fused_bwd.log 2>&1
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from seesaw_tpu.models.clip import ClipEmbedding, ClipModel  # noqa: E402
from seesaw_tpu.models.clip_finetune import clip_contrastive_loss  # noqa: E402

B, ITERS = 256, 8
SEQ = 77


def measure(model, params, tag):
    @jax.jit
    def chained(p, key):
        def body(carry, k):
            px = jax.random.normal(k, (B, 224, 224, 3), dtype=jnp.float32)
            toks = jax.random.randint(k, (B, SEQ), 0, 49408)

            def loss_fn(pp):
                img = model.apply({"params": pp}, px,
                                  method=ClipModel.encode_image)
                txt = model.apply({"params": pp}, toks,
                                  method=ClipModel.encode_text)
                return clip_contrastive_loss(img, txt, pp["logit_scale"])

            loss, grads = jax.value_and_grad(loss_fn)(carry)
            # thread params through with a vanishing update: a real data
            # dependency between steps without drifting the weights
            new_p = jax.tree.map(lambda a, g: a - 1e-12 * g, carry, grads)
            return new_p, loss

        final_p, losses = jax.lax.scan(body, p, jax.random.split(key, ITERS))
        return losses.sum() + jax.tree.leaves(final_p)[0].sum() * 0.0

    t0 = time.perf_counter()
    float(chained(params, jax.random.PRNGKey(0)))
    print(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(chained(params, jax.random.PRNGKey(i + 1)))
        ts.append(time.perf_counter() - t0)
    rate = B * ITERS / min(ts)
    print(f"[{tag}] pairs/s = {rate:.0f}  (runs: {[f'{t:.3f}' for t in ts]})",
          flush=True)
    return rate


def main():
    print("devices:", jax.devices(), flush=True)
    emb = ClipEmbedding(variant="vit-b32", dtype=jnp.bfloat16)
    params = jax.tree.map(jnp.asarray, emb.params)

    for fused in (False, True):
        cfg = dataclasses.replace(emb.cfg, fused_attention=fused)
        tag = "fused fwd+bwd" if fused else "einsum"
        try:
            measure(ClipModel(cfg), params, tag)
        except Exception as e:  # noqa: BLE001
            print(f"[{tag}] FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
