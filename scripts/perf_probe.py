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

        @jax.jit
        def gen_chunk(k):
            bits = jax.random.bits(k, (rows, D), dtype=jnp.uint8)
            v = jax.lax.bitcast_convert_type(bits, jnp.int8)
            if dtype == "packed":
                # pack 4 consecutive D-elements into one int32 lane:
                # W[:, d4] carries bytes d = 4*d4 + k (k = byte position)
                return jax.lax.bitcast_convert_type(
                    v.reshape(rows, D // 4, 4), jnp.int32
                )
            return v

        for k in jax.random.split(key, 16):
            chunks.append(gen_chunk(k))
        V = jnp.concatenate(chunks)
        scale = jax.random.uniform(key, (n,), minval=0.5, maxval=1.0) / 127.0
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


def stage_E():
    """XLA (non-pallas) int8 matvec path."""
    import jax.numpy as jnp

    from seesaw_tpu.ops.frame_scoring import score_frames_max

    V, valid, excluded, scale, F = build("int8")
    nbytes = V.size

    def step(V, valid, scale, q):
        return score_frames_max(V, valid, q, scale).max()

    chain = chain_over_queries(step)
    ms = measure(chain, lambda: (V, valid, scale, fresh_qs()))
    print(f"E XLA int8 matvec: {ms:.2f} ms  {gbps(ms, nbytes):.0f} GB/s(int8 bytes)",
          flush=True)


def stage_F():
    """Pure streaming: per-block reduction only (no matmul/decode) — the
    load-path ceiling per dtype."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for dtype in ("bf16", "int8", "packed"):
        V = build(dtype)[0]
        nbytes = V.size * V.dtype.itemsize
        R, C = V.shape
        BR = R // 64

        def kernel(x_ref, o_ref):
            x = x_ref[...]
            if x.dtype == jnp.int8 or x.dtype == jnp.int32:
                o_ref[...] = jnp.max(x, axis=1).astype(jnp.float32)
            else:
                o_ref[...] = jnp.max(x, axis=1).astype(jnp.float32)

        @jax.jit
        def run(V, t):
            out = pl.pallas_call(
                kernel,
                grid=(64,),
                in_specs=[pl.BlockSpec((BR, C), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((BR,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(V)
            return out.max() + t

        @jax.jit
        def chain(V, ts):
            def body(c, t):
                o = run(V, t + c * 0.0)
                return c, o
            _, outs = jax.lax.scan(body, jnp.float32(0), ts)
            return outs.sum()

        def fresh_ts():
            t = jnp.asarray(np.random.default_rng().normal(size=K).astype(np.float32))
            float(t[0])
            return t

        try:
            float(chain(V, fresh_ts()))
            best = float("inf")
            for _ in range(3):
                ts = fresh_ts()
                t0 = time.perf_counter()
                float(chain(V, ts))
                best = min(best, (time.perf_counter() - t0) * 1000 / K)
            print(f"F stream-max {dtype}: {best:.2f} ms  "
                  f"{gbps(best, nbytes):.0f} GB/s", flush=True)
        except Exception as e:
            print(f"F {dtype}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        del V


def stage_G():
    """int8 storage, ONE convert/value to bf16, MXU bf16 dot — minimal
    decode-op int8 path."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, valid, excluded, scale, F = build("int8")
    nbytes = V.size

    def kernel(q_ref, v_ref, valid_ref, excluded_ref, scale_ref, out_ref):
        Vb = v_ref[...].astype(jnp.bfloat16)
        scores = jnp.dot(Vb, q_ref[...].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        scores = scores * scale_ref[...]
        BF = valid_ref.shape[0]
        s = scores.reshape(BF, TILES)
        s = jnp.where(valid_ref[...], s, float("-inf"))
        fmax = jnp.max(s, axis=1)
        out_ref[...] = jnp.where(excluded_ref[...], float("-inf"), fmax)

    for bf in (1024, 4096):
        @functools.partial(jax.jit, static_argnames=("BF",))
        def run(V, valid, excluded, scale, q, BF=bf):
            return pl.pallas_call(
                kernel,
                grid=(F // BF,),
                in_specs=[
                    pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BF * TILES, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BF, TILES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BF,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BF * TILES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BF,), lambda i: (i,), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((F,), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(q.reshape(D, 1), V, valid, excluded, scale.reshape(-1, 1))

        def step(V, valid, excluded, scale, q, bf=bf):
            return run(V, valid, excluded, scale, q, BF=bf).max()

        try:
            chain = chain_over_queries(step)
            ms = measure(chain, lambda: (V, valid, excluded, scale, fresh_qs()))
            print(f"G int8->bf16 dot BF={bf}: {ms:.2f} ms  "
                  f"{gbps(ms, nbytes):.0f} GB/s(int8 bytes)", flush=True)
        except Exception as e:
            print(f"G BF={bf}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


def stage_H():
    """Pallas MULTI-QUERY frame-max: (BF*T, D) @ (D, Q) per block, frame-max
    per query in-kernel — the (N, Q) score matrix never reaches HBM.
    Compare vs the XLA batch path (build_db bf16, Q=16).

    RESULT (2026-08-17, v5e via axon): Mosaic FAILS to compile the
    (BF, T, Q) reshape + axis-1 reduction at both block sizes (tpu_compile
    subprocess crash) — same toolchain-limitation family as the int8
    findings (stages B/C/G). The XLA batch path (ops.frame_scoring.
    query_program_batch, 25.2ms @10M Q=16) remains the concurrent-serving
    kernel; its (N, Q) intermediate costs ~2ms of extra HBM traffic."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = 16
    V, valid, excluded, _, F = build("bf16")
    nbytes = V.size * 2

    def kernel(q_ref, v_ref, valid_ref, excluded_ref, out_ref):
        Vb = v_ref[...]  # (BF*T, D)
        scores = jnp.dot(Vb, q_ref[...].astype(Vb.dtype),
                         preferred_element_type=jnp.float32)  # (BF*T, Q)
        BF = valid_ref.shape[0]
        s = scores.reshape(BF, TILES, Q)
        s = jnp.where(valid_ref[...][:, :, None], s, float("-inf"))
        fmax = jnp.max(s, axis=1)  # (BF, Q)
        out_ref[...] = jnp.where(excluded_ref[...][:, None], float("-inf"), fmax)

    for bf in (1024, 2048):
        @functools.partial(jax.jit, static_argnames=("BF",))
        def run(V, valid, excluded, qs, BF=bf):
            return pl.pallas_call(
                kernel,
                grid=(F // BF,),
                in_specs=[
                    pl.BlockSpec((D, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BF * TILES, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BF, TILES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BF,), lambda i: (i,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BF, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((F, Q), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(qs.T, V, valid, excluded)

        def step(V, valid, excluded, q, bf=bf):
            qs = jnp.tile(q[None, :], (Q, 1)) + jnp.arange(Q)[:, None] * 1e-3
            return run(V, valid, excluded, qs, BF=bf).max()

        try:
            chain = chain_over_queries(step)
            ms = measure(chain, lambda: (V, valid, excluded, fresh_qs()))
            print(f"H bf16 multi-q frame-max Q={Q} BF={bf}: {ms:.2f} ms  "
                  f"{gbps(ms, nbytes):.0f} GB/s", flush=True)
        except Exception as e:
            print(f"H BF={bf}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)




def stage_I():
    """int8 vs bf16 BATCH matmul (N,D)@(D,Q=16) decomposition (VERDICT r4
    #6: int8 wins the matvec 11.5 vs 18.8ms but loses batch16 34.5 vs
    24.8ms — where?). Variants per dtype:
      mm:      matmul only (int32/f32 accumulate, scalar sum epilogue)
      mm+dq:   + per-query symmetric dequant + per-row scales (int8 only)
      mm+tail: + reshape to (F, T, Q), tile-mask, frame max (the
               query_program_batch shortlist stage, minus top_k)
      cvt:     int8 carrier CONVERTED to bf16 inside the program, bf16 dot —
               does the loss come from the int8 MXU path itself?
    """
    import jax
    import jax.numpy as jnp

    Q = 16

    def chain_over_qbatches(step_fn):
        @jax.jit
        def chain(*args):
            *consts, qs = args

            def body(carry, q):
                qb = jnp.tile(q[None, :], (Q, 1)) + (
                    jnp.arange(Q, dtype=jnp.float32)[:, None] * 1e-3
                )
                out = step_fn(*consts, qb + carry * 0.0)
                return out * 0.0 + carry, out

            _, outs = jax.lax.scan(body, jnp.float32(0), qs)
            return outs.sum()

        return chain

    for dtype in ("int8", "bf16"):
        V, valid, excluded, scale, F = build(dtype)
        nbytes = V.size * V.dtype.itemsize

        def mm(V, qb):
            if V.dtype == jnp.int8:
                qmax = jnp.max(jnp.abs(qb), axis=1, keepdims=True) + 1e-12
                q_i8 = jnp.clip(jnp.round(qb / qmax * 127.0), -127, 127).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    V, q_i8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return acc.astype(jnp.float32).sum()
            return jax.lax.dot_general(
                V, qb.astype(V.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).sum()

        def mm_dq(V, scale, qb):
            from seesaw_tpu.ops.frame_scoring import scoring_matmat

            return scoring_matmat(V, qb, scale).sum()

        def mm_tail(V, valid, excluded, scale, qb):
            from seesaw_tpu.ops.frame_scoring import scoring_matmat

            s = scoring_matmat(V, qb, scale)  # (N, Q)
            T = valid.shape[1]
            s = s.reshape(F, T, Q)
            s = jnp.where(valid[..., None], s, -jnp.inf)
            fmax = jnp.max(s, axis=1)  # (F, Q)
            fmax = jnp.where(excluded[:, None], -jnp.inf, fmax)
            return jnp.where(jnp.isfinite(fmax), fmax, 0.0).sum()

        def cvt(V, qb):
            assert V.dtype == jnp.int8
            return jax.lax.dot_general(
                V.astype(jnp.bfloat16), qb.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).sum()

        variants = [("mm", (V,), mm)]
        if dtype == "int8":
            variants += [("mm+dq", (V, scale), mm_dq),
                         ("mm+tail", (V, valid, excluded, scale), mm_tail),
                         ("cvt-bf16", (V,), cvt)]
        else:
            variants += [("mm+tail", (V, valid, excluded, None), mm_tail)]

        for name, consts, fn in variants:
            try:
                chain = chain_over_qbatches(fn)
                ms = measure(chain, lambda c=consts: (*c, fresh_qs()))
                print(f"I {dtype} {name} Q={Q}: {ms:.2f} ms  "
                      f"{gbps(ms, nbytes):.0f} GB/s of carrier bytes", flush=True)
            except Exception as e:
                print(f"I {dtype} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        del V, valid, excluded, scale
        import gc

        gc.collect()


def stage_J():
    """Label-propagation SpMV gather formulations at 1M x K=32 (the 300-iter
    Jacobi loop measured 280 ms/iter — a 32M-scalar random HBM gather).
    Which data movement primitive is fastest for f[nbr]?
      rand:    f[idx], idx random (the current step)           [baseline]
      sorted:  f[idx_sorted], monotonic non-decreasing indices [locality]
      sortedf: lax.gather with indices_are_sorted=True
      colwise: K separate (N,) gathers (one per neighbor slot)
      local:   idx = own row +/- 8 (frame-local synthetic)     [best case]
      bf16:    random gather from a bf16 f
      onehotT: per-frame (T=8) dense one-hot contraction — the
               factor_neighbors intra-frame structure as a matmul
    """
    import jax
    import jax.numpy as jnp

    n, Kn = 1_000_000, 32
    E = n * Kn
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx_rand = jax.random.randint(k1, (E,), 0, n, dtype=jnp.int32)
    idx_sorted = jnp.sort(idx_rand)
    # frame-local indices: vertex v reads within its 8-tile frame
    base = (jnp.arange(E, dtype=jnp.int32) // Kn) & ~jnp.int32(7)
    idx_local = base + (jnp.arange(E, dtype=jnp.int32) % 8)
    f32 = jax.random.uniform(k2, (n,))
    fbf = f32.astype(jnp.bfloat16)
    jax.block_until_ready((idx_rand, idx_sorted, idx_local, f32, fbf))

    REPS = 4  # chained gathers per dispatch

    def chain(gather_fn):
        @jax.jit
        def run(f, idx):
            def body(carry, _):
                out = gather_fn(f + carry, idx)
                s = out.sum()
                return s * 0.0, s

            _, outs = jax.lax.scan(body, f.dtype.type(0), jnp.arange(REPS))
            return outs.sum()

        return run

    def measure_g(gather_fn, f, idx, label, nbytes):
        run = chain(gather_fn)
        float(run(f, idx))  # compile
        best = float("inf")
        for i in range(3):
            fx = f * (1.0 + 1e-6 * (i + 1))
            jax.block_until_ready(fx)
            t0 = time.perf_counter()
            float(run(fx, idx))
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        print(f"J {label}: {best:.2f} ms  ({gbps(best, nbytes):.1f} GB/s of "
              f"gathered bytes)", flush=True)
        return best

    take = lambda f, idx: f[idx]
    measure_g(take, f32, idx_rand, "rand f32 (baseline)", E * 4)
    measure_g(take, f32, idx_sorted, "sorted f32", E * 4)

    def sorted_flag(f, idx):
        import jax.lax as lax

        dn = lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        return lax.gather(f, idx[:, None], dn, (1,), indices_are_sorted=True,
                          unique_indices=False)

    measure_g(sorted_flag, f32, idx_sorted, "sorted f32 + flag", E * 4)

    def colwise(f, idx):
        cols = idx.reshape(n, Kn)

        def body(c, k):
            return c + f[cols[:, k]].sum(), 0.0

        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(Kn))
        return s

    measure_g(colwise, f32, idx_rand, "colwise f32", E * 4)
    measure_g(take, f32, idx_local, "frame-local f32", E * 4)
    measure_g(take, fbf, idx_rand, "rand bf16", E * 2)

    # one-hot per-frame contraction: gather within 8-tile frames as a dense
    # (F, T, T) x (F, T) contraction on the VPU — zero HBM random access
    F, T = n // 8, 8
    sel = jax.random.randint(k1, (F, T, 4), 0, T)  # 4 intra-frame nbrs/tile
    onehot = jax.nn.one_hot(sel, T, dtype=jnp.float32).sum(axis=2)  # (F,T,T)
    jax.block_until_ready(onehot)

    def frame_contract(f, _idx):
        ff = f.reshape(F, T)
        return jnp.einsum("ftu,fu->ft", onehot, ff).reshape(-1)

    measure_g(frame_contract, f32, idx_rand, "onehot T=8 intra (4 nbr/tile)",
              F * T * 4 * 4)




def stage_K():
    """int8 batch TAIL repair (stage I follow-up: int8 mm=8.5ms beats bf16
    mm=15.4ms, but the frame-max tail costs +19.5ms on int8 vs +3.7ms on
    bf16 — the dequant chain breaks fusion). Variants:
      tail-f32:   current formulation (baseline)
      tail-bf16:  dequant to bf16 (N,Q) intermediate, max in bf16
      tail-int32: max over T in int32 BEFORE dequant (valid only without
                  per-row scales — semantics probe)
      tail-rowmax: rescale trick — fold row_scale into a per-frame
                  pre-max by expanding scales to (F,T,Q)? measures the
                  where+reshape+max skeleton cost alone (w/o matmul)
    """
    import jax
    import jax.numpy as jnp

    Q = 16
    V, valid, excluded, scale, F = build("int8")
    nbytes = V.size

    def chain_over_qbatches(step_fn):
        @jax.jit
        def chain(*args):
            *consts, qs = args

            def body(carry, q):
                qb = jnp.tile(q[None, :], (Q, 1)) + (
                    jnp.arange(Q, dtype=jnp.float32)[:, None] * 1e-3
                )
                out = step_fn(*consts, qb + carry * 0.0)
                return out * 0.0 + carry, out

            _, outs = jax.lax.scan(body, jnp.float32(0), qs)
            return outs.sum()

        return chain

    def acc_of(V, qb):
        qmax = jnp.max(jnp.abs(qb), axis=1, keepdims=True) + 1e-12
        q_i8 = jnp.clip(jnp.round(qb / qmax * 127.0), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            V, q_i8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc, (qmax[:, 0] / 127.0)

    T = valid.shape[1]

    def tail_f32(V, valid, excluded, scale, qb):
        acc, qs_scale = acc_of(V, qb)
        s = acc.astype(jnp.float32) * qs_scale[None, :] * scale[:, None]
        s = s.reshape(F, T, Q)
        s = jnp.where(valid[..., None], s, -jnp.inf)
        fmax = jnp.max(s, axis=1)
        fmax = jnp.where(excluded[:, None], -jnp.inf, fmax)
        return jnp.where(jnp.isfinite(fmax), fmax, 0.0).sum()

    def tail_bf16(V, valid, excluded, scale, qb):
        acc, qs_scale = acc_of(V, qb)
        s = (acc.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)[:, None])
        s = s.reshape(F, T, Q)
        s = jnp.where(valid[..., None], s, jnp.bfloat16(-jnp.inf))
        fmax = jnp.max(s, axis=1).astype(jnp.float32) * qs_scale[None, :]
        fmax = jnp.where(excluded[:, None], -jnp.inf, fmax)
        return jnp.where(jnp.isfinite(fmax), fmax, 0.0).sum()

    def tail_int32(V, valid, excluded, scale, qb):
        acc, qs_scale = acc_of(V, qb)  # no row scales: max commutes
        a = acc.reshape(F, T, Q)
        a = jnp.where(valid[..., None], a, jnp.int32(-2**31 + 1))
        fmax = jnp.max(a, axis=1).astype(jnp.float32) * qs_scale[None, :]
        fmax = jnp.where(excluded[:, None], -jnp.inf, fmax)
        return jnp.where(jnp.isfinite(fmax), fmax, 0.0).sum()

    def tail_transposed(V, valid, excluded, scale, qb):
        # (Q, N) orientation: scores minor axis = N
        qmax = jnp.max(jnp.abs(qb), axis=1, keepdims=True) + 1e-12
        q_i8 = jnp.clip(jnp.round(qb / qmax * 127.0), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q_i8, V, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (Q, N)
        s = acc.astype(jnp.float32) * (qmax / 127.0) * scale[None, :]
        s = s.reshape(Q, F, T)
        s = jnp.where(valid[None], s, -jnp.inf)
        fmax = jnp.max(s, axis=2)
        fmax = jnp.where(excluded[None, :], -jnp.inf, fmax)
        return jnp.where(jnp.isfinite(fmax), fmax, 0.0).sum()

    for name, fn in (("tail-f32", tail_f32), ("tail-bf16", tail_bf16),
                     ("tail-int32", tail_int32),
                     ("tail-transposed", tail_transposed)):
        try:
            chain = chain_over_qbatches(fn)
            ms = measure(chain, lambda: (V, valid, excluded, scale, fresh_qs()))
            print(f"K int8 {name} Q={Q}: {ms:.2f} ms  "
                  f"{gbps(ms, nbytes):.0f} GB/s", flush=True)
        except Exception as e:
            print(f"K int8 {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    known = sorted(n[len("stage_"):] for n in globals() if n.startswith("stage_"))
    stages = sys.argv[1:] or ["A", "B", "C", "D"]
    if any(s not in known for s in stages):
        print(f"usage: perf_probe.py [stage...] — stages: {' '.join(known)}\n"
              f"{__doc__}")
        sys.exit(0 if "--help" in stages or "-h" in stages else 2)
    for s in stages:
        print(f"--- stage {s}", flush=True)
        globals()[f"stage_{s}"]()
