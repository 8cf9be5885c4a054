"""On-chip probe: can int8 MXU matmuls accelerate the CLIP ViT forward?

The v5e MXU runs int8 at 2x the bf16 rate (394 vs 197 T*/s). The embed
path measures ~56% MFU in bf16 (PARITY item 11); if the ViT's big matmuls
(QKVO projections, the 4x MLP pair, the patch-conv-as-matmul) reach
>=1.5x in int8 at ViT-B/32's shapes, an opt-in int8 embed mode would lift
the ingest bound (BASELINE target #1) by the same factor.

Stage A measures raw X@W throughput per ViT shape: bf16 vs int8 (static
per-tensor scales, int32 accumulate — XLA fuses the dequant epilogue) vs
int8 with a dynamic per-row activation quant chained in (the deployable
form: weights are quantized offline, activations on the fly).

Timing per the verify skill: ITERS matmuls chained in one jitted lax.scan
with a data dependency, fresh operands per rep via a cheap carry add,
float() fetch barrier. Run as the ONLY TPU process:
  timeout 1200 python scripts/probe_int8_vit.py > /tmp/int8_vit.log 2>&1
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

ITERS = 16
# ViT-B/32 @ B=512: tokens = 512*50 = 25600 rows
SHAPES = [
    ("patch_conv", (512 * 49, 3072), (3072, 768)),
    ("qkv_merged", (25600, 768), (768, 2304)),
    ("attn_out", (25600, 768), (768, 768)),
    ("mlp_up", (25600, 768), (768, 3072)),
    ("mlp_down", (25600, 3072), (3072, 768)),
]


def time_chain(fn, *args, tag=""):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / ITERS * 1000
    print(f"  [{tag}] {dt:.3f} ms/matmul (compile {compile_s:.1f}s)",
          flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for name, (m, k), (k2, n) in SHAPES:
        assert k == k2
        flops = 2 * m * k * n
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (m, k), dtype=jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n),
                              dtype=jnp.bfloat16)
        xi = (jax.random.normal(key, (m, k)) * 30).astype(jnp.int8)
        wi = (jax.random.normal(jax.random.PRNGKey(1), (k, n)) * 30).astype(
            jnp.int8)
        jax.block_until_ready((x, w, xi, wi))
        print(f"{name}: ({m},{k})@({k},{n}), {flops/1e9:.1f} GFLOP",
              flush=True)

        @jax.jit
        def bf16_chain(x, w):
            def body(c, _):
                y = (x + c) @ w
                return y[0, 0].astype(jnp.bfloat16) * 0, y[0, 1]

            _, outs = jax.lax.scan(body, jnp.bfloat16(0), None, length=ITERS)
            return outs.astype(jnp.float32).sum()

        dt = time_chain(bf16_chain, x, w, tag="bf16")
        print(f"    bf16: {flops/dt/1e9:.1f} TFLOPS", flush=True)

        @jax.jit
        def int8_chain(xi, wi):
            def body(c, _):
                y = jax.lax.dot_general(
                    xi + c, wi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                # dequant epilogue (per-tensor scales) like a real layer
                yf = y.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
                return (y[0, 0] * 0).astype(jnp.int8), yf[0, 1]

            _, outs = jax.lax.scan(body, jnp.int8(0), None, length=ITERS)
            return outs.sum()

        dt8 = time_chain(int8_chain, xi, wi, tag="int8-static")
        print(f"    int8 static: {flops/dt8/1e9:.1f} TOPS "
              f"({dt/dt8:.2f}x vs bf16)", flush=True)

        @jax.jit
        def int8_dynamic_chain(x, wi):
            def body(c, _):
                xf = x + c
                # dynamic per-row activation quant (the deployable form)
                s = jnp.max(jnp.abs(xf), axis=1, keepdims=True).astype(
                    jnp.float32) / 127.0
                xq = jnp.clip(
                    xf.astype(jnp.float32) / s, -127, 127
                ).astype(jnp.int8)
                y = jax.lax.dot_general(
                    xq, wi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                yf = y.astype(jnp.float32) * s * (1.0 / 127.0)
                return (yf[0, 0] * 0).astype(jnp.bfloat16), yf[0, 1]

            _, outs = jax.lax.scan(body, jnp.bfloat16(0), None, length=ITERS)
            return outs.sum()

        dtd = time_chain(int8_dynamic_chain, x, wi, tag="int8-dynamic")
        print(f"    int8 dynamic: {flops/dtd/1e9:.1f} TOPS "
              f"({dt/dtd:.2f}x vs bf16)", flush=True)


if __name__ == "__main__":
    main()
