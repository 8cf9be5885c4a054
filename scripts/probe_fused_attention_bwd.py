"""On-chip A/B: contrastive fine-tune step (fwd+bwd through BOTH towers),
einsum attention vs the fused pair-packed kernel with its Pallas BACKWARD
(ops/pallas_attention._attn_bwd_kernel).

History: with the backward-by-einsum VJP the fused kernel netted out
NEUTRAL for training (2034 einsum vs 1994 fused pairs/s, B=256, r4) —
the VJP's einsum forward recompute ate the forward win. The Pallas
backward recomputes the softmax inside the kernel instead: measured
2034 einsum vs 2518/2537 fused pairs/s (+24-25%).

The measurement harness is bench.finetune_pairs_per_s — SHARED with the
driver bench's `finetune` stage so the two numbers stay methodologically
identical. Runs on the REAL TPU (the one allowed TPU process).

Usage: timeout 900 python scripts/probe_fused_attention_bwd.py > /tmp/fused_bwd.log 2>&1
"""
import dataclasses
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import finetune_pairs_per_s  # noqa: E402
from seesaw_tpu.models.clip import ClipEmbedding, ClipModel  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    emb = ClipEmbedding(variant="vit-b32", dtype=jnp.bfloat16)
    params = jax.tree.map(jnp.asarray, emb.params)

    for fused in (False, True):
        cfg = dataclasses.replace(emb.cfg, fused_attention=fused)
        tag = "fused fwd+bwd" if fused else "einsum"
        try:
            rate = finetune_pairs_per_s(
                ClipModel(cfg), params, reps=3,
                on_compiled=lambda: print(f"[{tag}] compiled", flush=True),
            )
            print(f"[{tag}] pairs/s = {rate:.0f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{tag}] FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
