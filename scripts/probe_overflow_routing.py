"""Probe: can the windowed-SpMV OVERFLOW path beat XLA's scalar floor?

The windowed kernel (ops/pallas_spmv.py) serves in-window edges at slab
streaming speed, but every overflow edge pays `f[ovf_nbr]` scalar gather +
`.at[ovf_src].add` scalar scatter — ~9 ns/element each (perf_probe stage J),
so a 10M-tile graph with 4.4% overflow (14M edges) spends ~250 ms of its
286 ms/iter there (scripts/probe_graph_10M_r4.json). This probe measures
every primitive a structured overflow path could be built from, at exactly
that size (E = 14.2M edges, n = 10M rows):

  A  current path baseline: w*f[nbr] gather + scatter-add, one jit
  B  scalar gather alone                    f[nbr]
  C  scalar scatter-add alone               zeros.at[src].add(g)
  D  scatter-add with sorted src + flags    lax.scatter_add(sorted=True)
  E  ROW gather: f2d[(T,) row ids]          per-offset or per-element?
  F  ROW scatter-add: zeros2d.at[rows].add  (tiles of 128 lanes)
  G  route-by-sort: lax.sort (key, val) @E  trivial fixed-permutation route
  H  cumsum @E                              segment-sum building block
  I  XLA take_along_axis (T,128)x(T,128)    lane gather without Mosaic
  J  Pallas lane gather (Mosaic take_along_axis envelope)
  K  Pallas ONE-HOT scatter: per-128-vertex-block segment reduce on the
     VPU (lane==iota compare * value, sum) — scatter side without any
     scalar scatter
  L  (T,128) <-> (128,T) transpose          routing-network building block
  M  composed routed-overflow pipeline at the realistic 10M-overflow size
  N  sort variants @20M: 2-op (key,val) vs int64-packed 1-op
     (needs JAX_ENABLE_X64=1; measured 78.6 vs 81.6 ms — no win)
  O  one-hot reduce via MXU dot (loses precision: MXU casts f32->bf16)
  P  sort cost curve: global @2.5/10/20M + batched segment sorts
     (measured: ~flat 3.4-3.9 ns/elem global — pass-dominated; batched
     only wins at tiny segments, 1.68 ns/elem at 20k, which the route's
     pair-multiplicity structure cannot provide)
  Q  Clos/Benes routing-network building blocks: transpose and
     roll+select butterfly both 0.15 ns/elem -> a 49-stage Benes is
     151 ms, a 3-level Clos ~80 ms; neither beats the 78 ms sort

Run on the real chip (the ONE TPU process):
    python scripts/probe_overflow_routing.py [A B C ...]
"""
from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

E_TILES = 110_592  # edge tiles of 128 -> E = 14,155,776 edges
E = E_TILES * 128
N = 9_994_240  # score rows (matches probe_graph_10M)
R = N // 128  # 78,080 score rows viewed as (R, 128)
REPS = 8


def log(msg):
    print(msg, flush=True)


def main():
    import jax

    cache_dir = str(Path(__file__).resolve().parent.parent / ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    stages = set(a.upper() for a in sys.argv[1:]) or set("ABCDEFGHIJKL")

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    nbr = jax.random.randint(k1, (E,), 0, N, dtype=jnp.int32)
    # src sorted row-major with ~1.4 edges/vertex like real overflow
    src = jnp.sort(jax.random.randint(k2, (E,), 0, N, dtype=jnp.int32))
    w = jax.random.uniform(k3, (E,), minval=0.1, maxval=1.0)
    f = jax.random.uniform(k4, (N,))
    g = w * 0.5  # stand-in precomputed contribution
    jax.block_until_ready((nbr, src, w, f, g))
    log(f"E={E} N={N} R={R} device={jax.devices()[0].platform}")

    def measure(label, run, *args, per_edge=True):
        """run is a jitted fn(f_or_x, *args) chaining REPS internally and
        returning a scalar; fresh first arg per repetition."""
        x0 = args[0]
        float(run(x0, *args[1:]))  # compile
        best = float("inf")
        for i in range(3):
            xi = x0 * (1.0 + 1e-6 * (i + 1)) if jnp.issubdtype(
                x0.dtype, jnp.floating) else x0
            jax.block_until_ready(xi)
            t0 = time.perf_counter()
            float(run(xi, *args[1:]))
            best = min(best, (time.perf_counter() - t0) * 1000 / REPS)
        unit = f"{best * 1e6 / E:.2f} ns/edge" if per_edge else ""
        log(f"{label}: {best:.2f} ms  {unit}")
        return best

    def chain(step):
        @jax.jit
        def run(x, *rest):
            def body(carry, _):
                out = step(x + carry, *rest)
                s = out.sum()
                return s * jnp.asarray(0.0, x.dtype), s

            _, outs = jax.lax.scan(
                body, jnp.asarray(0.0, x.dtype), jnp.arange(REPS))
            return outs.sum()

        return run

    if "A" in stages:
        def cur(fx, nbr, src, w):
            gg = w * fx[nbr]
            return jnp.zeros(N, jnp.float32).at[src].add(gg)

        measure("A current gather+scatter", chain(cur), f, nbr, src, w)

    if "B" in stages:
        measure("B scalar gather", chain(lambda fx, ix: fx[ix]), f, nbr)

    if "C" in stages:
        def scat(gx, src):
            return jnp.zeros(N, jnp.float32).at[src].add(gx)

        measure("C scalar scatter-add (sorted src)", chain(scat), g, src)

        srcr = jax.random.permutation(k1, src)
        jax.block_until_ready(srcr)
        measure("C scalar scatter-add (random src)", chain(scat), g, srcr)

    if "D" in stages:
        import jax.lax as lax

        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,),
        )

        def scat_flag(gx, src):
            return lax.scatter_add(
                jnp.zeros(N, jnp.float32), src[:, None], gx, dn,
                indices_are_sorted=True, unique_indices=False,
            )

        measure("D scatter-add sorted+flag", chain(scat_flag), g, src)

    f2d = f.reshape(R, 128)
    T = E_TILES
    rows_rand = jax.random.randint(k2, (T,), 0, R, dtype=jnp.int32)
    rows_sorted = jnp.sort(rows_rand)
    tiles = jax.random.uniform(k3, (T, 128))
    jax.block_until_ready((f2d, rows_rand, rows_sorted, tiles))

    if "E" in stages:
        measure("E row gather (T,128) random rows",
                chain(lambda x, r: x[r]), f2d, rows_rand)
        measure("E row gather sorted rows",
                chain(lambda x, r: x[r]), f2d, rows_sorted)

    if "F" in stages:
        def rowscat(tx, r):
            return jnp.zeros((R, 128), jnp.float32).at[r].add(tx)

        measure("F row scatter-add random rows", chain(rowscat),
                tiles, rows_rand)
        measure("F row scatter-add sorted rows", chain(rowscat),
                tiles, rows_sorted)

    if "G" in stages:
        perm_key = jax.random.randint(k4, (E,), 0, 1 << 30, dtype=jnp.int32)
        jax.block_until_ready(perm_key)

        def route_sort(gx, kx):
            _, out = jax.lax.sort((kx, gx), num_keys=1)
            return out

        measure("G route-by-sort (int32 key, f32 val)", chain(route_sort),
                g, perm_key)

    if "H" in stages:
        measure("H cumsum", chain(lambda gx: jnp.cumsum(gx)), g)

    lanes = jax.random.randint(k1, (T, 128), 0, 128, dtype=jnp.int32)
    jax.block_until_ready(lanes)

    if "I" in stages:
        measure("I XLA take_along_axis (T,128)",
                chain(lambda x, l: jnp.take_along_axis(x, l, axis=1)),
                tiles, lanes)

    if "J" in stages:
        TB = 512  # tiles per pallas block

        def gk(x_ref, l_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], l_ref[...], axis=1)

        @jax.jit
        def lane_gather(x, l):
            return pl.pallas_call(
                gk,
                grid=(T // TB,),
                in_specs=[
                    pl.BlockSpec((TB, 128), lambda i: (i, 0)),
                    pl.BlockSpec((TB, 128), lambda i: (i, 0)),
                ],
                out_specs=pl.BlockSpec((TB, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
            )(x, l)

        got = np.asarray(lane_gather(tiles, lanes)[:4])
        want = np.take_along_axis(
            np.asarray(tiles[:4]), np.asarray(lanes[:4]), axis=1)
        np.testing.assert_array_equal(got, want)
        measure("J pallas lane gather (T,128)", chain(lane_gather),
                tiles, lanes)

    def make_onehot(TT):
        # per-TILE one-hot reduce: out[t, l] = sum_i (lanes[t,i]==l)*v[t,i]
        # mask is (TB,128,128) f32 -> TB=32 keeps it at 2.1MB scoped VMEM
        # (BB=256 with 2 tiles/block OOMed: 42MB > 16MB scoped limit)
        TB = 32

        def ohk(v_ref, l_ref, o_ref):
            v = v_ref[...]  # (TB, 128)
            l = l_ref[...]
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
            m = (l[..., None] == iota).astype(jnp.float32)  # (TB,128,128)
            o_ref[...] = (m * v[..., None]).sum(axis=1)

        @jax.jit
        def onehot_tile(v, l):
            return pl.pallas_call(
                ohk,
                grid=(TT // TB,),
                in_specs=[
                    pl.BlockSpec((TB, 128), lambda i: (i, 0)),
                    pl.BlockSpec((TB, 128), lambda i: (i, 0)),
                ],
                out_specs=pl.BlockSpec((TB, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((TT, 128), jnp.float32),
            )(v, l)

        return onehot_tile

    if "K" in stages:
        onehot_tile = make_onehot(T)
        got = np.asarray(onehot_tile(tiles, lanes)[:2])
        vv = np.asarray(tiles)[:2]
        ll = np.asarray(lanes)[:2]
        want = np.zeros((2, 128), np.float32)
        for t in range(2):
            np.add.at(want[t], ll[t], vv[t])
        np.testing.assert_allclose(got, want, rtol=1e-5)
        measure("K pallas per-tile one-hot reduce", chain(onehot_tile),
                tiles, lanes)

    if "L" in stages:
        measure("L transpose (T,128)->(128,T) +copy",
                chain(lambda x: x.T.reshape(T, 128) + 0.0), tiles)

    if "N" in stages:
        # N: sort variants at the PADDED route size (20.05M slots like the
        # real 10M layout): 2-operand (key,val) vs int64-packed 1-operand
        SZp = 156_672 * 128
        key32 = jax.random.permutation(
            k4, jnp.arange(SZp, dtype=jnp.int32))
        valsN = jax.random.uniform(k3, (SZp,), dtype=jnp.float32)
        jax.block_until_ready((key32, valsN))

        def sort2(v, kx):
            return jax.lax.sort((kx, v), num_keys=1)[1]

        measure("N sort 2-op (key,val) @20M", chain(sort2), valsN, key32,
                per_edge=False)

        if jax.config.jax_enable_x64:
            def sort_packed(v, kx):
                packed = (
                    (kx.astype(jnp.int64) << 32)
                    | jax.lax.bitcast_convert_type(v, jnp.int32)
                    .astype(jnp.uint32).astype(jnp.int64)
                )
                s = jax.lax.sort(packed)
                return jax.lax.bitcast_convert_type(
                    (s & jnp.int64(0xFFFFFFFF)).astype(jnp.int32),
                    jnp.float32)

            measure("N sort int64-packed @20M", chain(sort_packed), valsN,
                    key32, per_edge=False)
        else:
            print("N sort int64-packed: skipped (needs JAX_ENABLE_X64=1; "
                  "int64 silently downcasts to int32 otherwise)")

    if "O" in stages:
        # O: one-hot reduce as an MXU dot (mask built on VPU, contraction
        # on MXU) vs the VPU multiply+sum in stage K
        TB = 32

        def ohk_dot(v_ref, l_ref, o_ref):
            v = v_ref[...]  # (TB, 128)
            lanes = l_ref[...]
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
            m = (lanes[..., None] == iota).astype(jnp.float32)
            # (TB,1,128) @ (TB,128,128) batch dot -> (TB,1,128)
            o_ref[...] = jax.lax.dot_general(
                v[:, None, :], m,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, 0, :]

        @jax.jit
        def onehot_dot(v, l):
            return pl.pallas_call(
                ohk_dot,
                grid=(T // TB,),
                in_specs=[
                    pl.BlockSpec((TB, 128), lambda i: (i, 0)),
                    pl.BlockSpec((TB, 128), lambda i: (i, 0)),
                ],
                out_specs=pl.BlockSpec((TB, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
            )(v, l)

        got = np.asarray(onehot_dot(tiles, lanes)[:2])
        vv = np.asarray(tiles)[:2]
        ll = np.asarray(lanes)[:2]
        want = np.zeros((2, 128), np.float32)
        for t in range(2):
            np.add.at(want[t], ll[t], vv[t])
        # FINDING: the MXU casts f32 inputs to bf16 (f32 accumulate), so
        # the one-hot dot loses ~3 decimal digits vs the VPU multiply+sum
        # — a correctness reason to keep the VPU reduce in the product
        # path regardless of throughput
        np.testing.assert_allclose(got, want, rtol=1e-2)
        measure("O pallas one-hot via MXU dot", chain(onehot_dot),
                tiles, lanes)

    if "P" in stages:
        # P: route-sort COST CURVE — global sort at several sizes plus
        # batched independent segment sorts at the same total element
        # count. If XLA's TPU sort is bitonic-ish (log^2 passes), cutting
        # the segment length from 20M to 160k should buy ~2x/element —
        # that bounds what any block-diagonalized routing could save.
        for sz_tiles in (19_584, 78_336, 156_672):
            SZp = sz_tiles * 128
            kx = jax.random.permutation(
                k4, jnp.arange(SZp, dtype=jnp.int32))
            vx = jax.random.uniform(k3, (SZp,), dtype=jnp.float32)
            jax.block_until_ready((kx, vx))

            def sort2(v, kk):
                return jax.lax.sort((kk, v), num_keys=1)[1]

            ms = measure(f"P global sort @{SZp/1e6:.1f}M", chain(sort2),
                         vx, kx, per_edge=False)
            log(f"    -> {ms * 1e6 / SZp:.2f} ns/elem")

        SZp = 156_672 * 128  # ~20.05M, the real routed size
        for C in (8, 32, 128, 1024):
            S = SZp // C
            kx = jax.random.permutation(
                k4, jnp.arange(SZp, dtype=jnp.int32)).reshape(C, S)
            vx = jax.random.uniform(k3, (C, S), dtype=jnp.float32)
            jax.block_until_ready((kx, vx))

            def sortb(v, kk):
                return jax.lax.sort((kk, v), num_keys=1, dimension=1)[1]

            ms = measure(f"P batched sort ({C},{S/1e3:.0f}k)", chain(sortb),
                         vx, kx, per_edge=False)
            log(f"    -> {ms * 1e6 / SZp:.2f} ns/elem")

    if "Q" in stages:
        # Q: primitives for a 3-stage Clos route (lane perms + column
        # perms via transpose): f32 transpose cost at the real routed
        # size, and a roll+select butterfly stage (Benes building block).
        SZp = 156_672 * 128
        TT = 156_672
        x = jax.random.uniform(k3, (TT, 128), dtype=jnp.float32)
        jax.block_until_ready(x)

        ms = measure("Q transpose (T,128)->(128,T)",
                     chain(lambda xx: xx.T + 0.0), x, per_edge=False)
        log(f"    -> {ms * 1e6 / SZp:.2f} ns/elem")

        swap = jax.random.bernoulli(k4, 0.5, (TT, 128))
        jax.block_until_ready(swap)

        def butterfly(xx, m):
            p = jnp.roll(xx, 1, axis=0)
            return jnp.where(m, p, xx)

        ms = measure("Q butterfly row-roll+select", chain(butterfly), x,
                     swap, per_edge=False)
        log(f"    -> {ms * 1e6 / SZp:.2f} ns/elem "
            f"(x49 Benes stages = {ms * 49:.1f} ms)")

    if "M" in stages:
        # COMPOSED routed-overflow pipeline at realistic 10M-overflow size,
        # including ~1.35x slot padding on both sides:
        #   row gather (nbr rows) -> pallas lane gather x w -> fixed-key
        #   sort route -> per-tile one-hot reduce -> row scatter-add
        GT = 150_000  # ~19.2M slots vs E=14.2M edges (1.36x padding)
        SZ = GT * 128
        g_rows = jax.random.randint(k1, (GT,), 0, R, dtype=jnp.int32)
        g_lanes = jax.random.randint(k2, (GT, 128), 0, 128, dtype=jnp.int32)
        g_w = jax.random.uniform(k3, (GT, 128))
        route_key = jax.random.permutation(
            k4, jnp.arange(SZ, dtype=jnp.int32))
        s_lanes = jax.random.randint(k2, (GT, 128), 0, 128, dtype=jnp.int32)
        s_rows = jax.random.randint(k3, (GT,), 0, R, dtype=jnp.int32)
        jax.block_until_ready(
            (g_rows, g_lanes, g_w, route_key, s_lanes, s_rows))

        TBg = 512

        def lg_mul_k(x_ref, l_ref, w_ref, o_ref):
            o_ref[...] = w_ref[...] * jnp.take_along_axis(
                x_ref[...], l_ref[...], axis=1)

        def lane_gather_mul(x, l, w):
            return pl.pallas_call(
                lg_mul_k,
                grid=(GT // TBg,),
                in_specs=[
                    pl.BlockSpec((TBg, 128), lambda i: (i, 0)),
                    pl.BlockSpec((TBg, 128), lambda i: (i, 0)),
                    pl.BlockSpec((TBg, 128), lambda i: (i, 0)),
                ],
                out_specs=pl.BlockSpec((TBg, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((GT, 128), jnp.float32),
            )(x, l, w)

        onehot_tile = make_onehot(GT)

        def routed(fx, g_rows, g_lanes, g_w, route_key, s_lanes, s_rows):
            rows = fx[g_rows]  # (GT,128) row gather
            vals = lane_gather_mul(rows, g_lanes, g_w)
            _, sorted_vals = jax.lax.sort(
                (route_key, vals.reshape(-1)), num_keys=1)
            partials = onehot_tile(sorted_vals.reshape(GT, 128), s_lanes)
            return jnp.zeros((R, 128), jnp.float32).at[s_rows].add(partials)

        measure("M composed routed-overflow (19.2M slots)", chain(routed),
                f2d, g_rows, g_lanes, g_w, route_key, s_lanes, s_rows,
                per_edge=True)


if __name__ == "__main__":
    main()
