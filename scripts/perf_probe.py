"""Kernel perf probe for the frame-max scan (run on the real chip).

Measures device time for shortlist-stage variants with the chained-scan
methodology (fresh args per rep, value-forced completion — see
.claude/skills/verify/SKILL.md). Stages:

  A: pallas bf16 fused_frame_max, block_frames sweep
  B: pallas int8 (current kernel, per-row scales)
  C: pallas int8 PACKED as int32 lanes, in-kernel shift/mask decode —
     int8 HBM loads run at ~1/4 the int32/bf16 rate on this toolchain, so
     packing 4 int8 into one int32 lane restores full-rate streaming
  D: XLA-only matvec + reshape-max (no pallas), bf16

Usage: python scripts/perf_probe.py [stage...]   (default: all)
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_VECTORS = int(__import__("os").environ.get("PROBE_VECTORS", 10_000_000))
D, TILES = 512, 8
K = 16  # chained queries per dispatch


def build(dtype: str):
    import jax
    import jax.numpy as jnp

    n_frames = (N_VECTORS // TILES // 4096) * 4096
    n = n_frames * TILES
    key = jax.random.PRNGKey(0)
    if dtype == "bf16":
        V = jax.random.normal(key, (n, D), dtype=jnp.bfloat16)
        scale = None
    else:  # int8 values in an int8 or packed-int32 carrier
        chunks = []
        rows = n // 16
        for k in jax.random.split(key, 16):
            bits = jax.random.bits(k, (rows, D), dtype=jnp.uint8)
            chunks.append(jax.lax.bitcast_convert_type(bits, jnp.int8))
        V = jnp.concatenate(chunks)
        scale = jax.random.uniform(key, (n,), minval=0.5, maxval=1.0) / 127.0
        if dtype == "packed":
            # pack 4 consecutive D-elements into one int32 lane:
            # W[:, d4] carries bytes d = 4*d4 + k (k = byte position)
            V = jax.jit(
                lambda v: jax.lax.bitcast_convert_type(
                    v.reshape(n, D // 4, 4), jnp.int32
                )
            )(V)
    valid = jnp.ones((n_frames, TILES), dtype=bool)
    excluded = jnp.zeros(n_frames, dtype=bool)
    return V, valid, excluded, scale, n_frames


def measure(chain_fn, fresh_args_fn, reps=3):
    """min over reps of (one dispatch of K chained queries) / K."""
    import jax

    float(chain_fn(*fresh_args_fn()))  # compile
    best = float("inf")
    for _ in range(reps):
        args = fresh_args_fn()
        t0 = time.perf_counter()
        float(chain_fn(*args))
        best = min(best, (time.perf_counter() - t0) * 1000 / K)
    return best


def chain_over_queries(step_fn):
    """Wrap a (V..., q) -> scalar step into a K-query scan with data deps."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(*args):
        *consts, qs = args

        def body(carry, q):
            out = step_fn(*consts, q + carry * 0.0)
            return out * 0.0 + carry, out

        _, outs = jax.lax.scan(body, jnp.float32(0), qs)
        return outs.sum()

    return chain


def fresh_qs():
    import jax.numpy as jnp

    rng = np.random.default_rng()
    q = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
    float(q[0, 0])
    return q


def gbps(ms: float, bytes_per_query: float) -> float:
    return bytes_per_query / (ms / 1000) / 1e9


def stage_A():
    import jax.numpy as jnp

    from seesaw_tpu.ops.pallas_scoring import fused_frame_max

    V, valid, excluded, _, F = build("bf16")
    nbytes = V.size * 2
    for bf in (1024, 2048, 4096):
        def step(V, valid, excluded, q, bf=bf):
            out = fused_frame_max(V, valid, excluded, q, None,
                                  tile_bound=TILES, block_frames=bf)
            return out.max()

        try:
            chain = chain_over_queries(step)
            ms = measure(chain, lambda: (V, valid, excluded, fresh_qs()))
            print(f"A bf16 fused_frame_max BF={bf}: {ms:.2f} ms  "
                  f"{gbps(ms, nbytes):.0f} GB/s", flush=True)
        except Exception as e:
            print(f"A BF={bf}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


def stage_B():
    from seesaw_tpu.ops.pallas_scoring import fused_frame_max

    V, valid, excluded, scale, F = build("int8")
    nbytes = V.size
    for bf in (1024, 4096):
        def step(V, valid, excluded, scale, q, bf=bf):
            out = fused_frame_max(V, valid, excluded, q, scale,
                                  tile_bound=TILES, block_frames=bf)
            return out.max()

        chain = chain_over_queries(step)
        ms = measure(chain, lambda: (V, valid, excluded, scale, fresh_qs()))
        print(f"B int8 fused_frame_max BF={bf}: {ms:.2f} ms  "
              f"{gbps(ms, nbytes):.0f} GB/s(int8 bytes)", flush=True)


def stage_C():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W, valid, excluded, scale, F = build("packed")  # (n, D//4) int32
    nbytes = W.size * 4

    def kernel(q_ref, w_ref, valid_ref, excluded_ref, scale_ref, out_ref):
        Wb = w_ref[...]  # (BF*T, D//4) int32
        acc = None
        for k in range(4):
            # sign-extended byte k: (w << (24-8k)) >> 24 (arithmetic)
            b = (Wb << (24 - 8 * k)) >> 24
            part = jax.lax.dot_general(
                b.astype(jnp.float32), q_ref[...][:, k:k + 1],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        scores = acc * scale_ref[...]
        BF = valid_ref.shape[0]
        s = scores.reshape(BF, TILES)
        s = jnp.where(valid_ref[...], s, float("-inf"))
        fmax = jnp.max(s, axis=1)
        out_ref[...] = jnp.where(excluded_ref[...], float("-inf"), fmax)

    for bf in (1024, 2048, 4096):
        grid = F // bf

        @functools.partial(jax.jit, static_argnames=("BF",))
        def run(W, valid, excluded, scale, q, BF=bf):
            Dq = D // 4
            # q rearranged: q4[d4, k] = q[4*d4 + k]
            q4 = q.reshape(Dq, 4)
            return pl.pallas_call(
                kernel,
                grid=(F // BF,),
                in_specs=[
                    pl.BlockSpec((Dq, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BF * TILES, Dq), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BF, TILES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BF,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BF * TILES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BF,), lambda i: (i,), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((F,), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(q4, W, valid, excluded, scale.reshape(-1, 1))

        def step(W, valid, excluded, scale, q, bf=bf):
            return run(W, valid, excluded, scale, q, BF=bf).max()

        try:
            chain = chain_over_queries(step)
            ms = measure(chain, lambda: (W, valid, excluded, scale, fresh_qs()))
            print(f"C packed-int8 BF={bf}: {ms:.2f} ms  "
                  f"{gbps(ms, nbytes):.0f} GB/s(int32 bytes)", flush=True)
        except Exception as e:
            print(f"C packed-int8 BF={bf}: FAILED {type(e).__name__}: {e}",
                  flush=True)


def stage_D():
    import jax.numpy as jnp

    from seesaw_tpu.ops.frame_scoring import score_frames_max

    V, valid, excluded, _, F = build("bf16")
    nbytes = V.size * 2

    def step(V, valid, q):
        return score_frames_max(V, valid, q, None).max()

    chain = chain_over_queries(step)
    ms = measure(chain, lambda: (V, valid, fresh_qs()))
    print(f"D XLA matvec+reshape-max bf16: {ms:.2f} ms  "
          f"{gbps(ms, nbytes):.0f} GB/s", flush=True)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["A", "B", "C", "D"]
    for s in stages:
        print(f"--- stage {s}", flush=True)
        globals()[f"stage_{s}"]()
