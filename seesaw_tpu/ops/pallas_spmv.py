"""Windowed SpMV Pallas kernel: label propagation's gather at lane speed.

The propagation step needs wf_i = sum_k w[i,k] * f[nbr[i,k]] over a
fixed-degree kNN graph. XLA lowers the (N*K,)-element scalar gather to a
~9ns/element loop — 287 ms/iter at 1M x K=32, flat across index locality,
sortedness and dtype (scripts/perf_probe.py stage J). Mosaic's ONE fast
data-movement primitive for this is the intra-tile lane shuffle:
`take_along_axis` on (rows, 128) with (rows, 128) lane indices runs at
~3.3 G elem/s (scripts/probe_gather_envelope.py) — 29x XLA.

Design (scripts/probe_spmv_kernel.py: 28.5 ms/iter at 1M x K=32, 10x XLA):
- Vertices are processed in blocks of B. Each block b gets a WINDOW of W
  consecutive f values (W/128 rows of f viewed as (R, 128)); an edge is
  "window-local" when its neighbor lies inside the block's window.
- At BUILD time (static graph), each vertex's window-local edges are
  grouped by their window row u and packed into at most `cap` lane slots
  per (vertex, u): arrays cidx/wslab of shape (NB, W/128, B*cap/128, 128).
  Empty slots carry weight 0. Out-of-window / over-cap edges go to a COO
  overflow list served by the XLA gather (fast iff rare).
- Per grid step the kernel loads the full (R, 128) f once (VMEM-resident,
  4MB at 1M tiles, 40MB at 10M), and for each window row u lane-gathers
  from that row broadcast across the edge tile — no HBM random access at
  all. Per-vertex sums over the cap lanes happen in XLA afterwards (Mosaic
  cannot reshape lanes).
- Locality is a property of the vertex LABELING: real kNN graphs cluster,
  and `rcm_order` (reverse Cuthill-McKee over the symmetric adjacency)
  concentrates neighbors near the diagonal. `coverage` reports the
  window-local edge fraction so callers can check before opting in.
- No fixed (B, W, cap) serves all graphs: post-RCM real kNN graphs are
  perfectly local but CONCENTRATED (all K neighbors in 1-2 window rows —
  a fixed cap 12 caps coverage at 12/K), while spread-out graphs need
  window width over capacity. `select_windowed_params` measures the
  graph's own occupancy histogram and picks the layout; on a real 1M x 32
  exact-kNN graph the selected (128, 256, 32) runs 4.5 ms/iter vs 366.9
  for the old fixed default (scripts/probe_layout_select_r4.json).

Windowed propagation is numerically equal to the XLA step up to f32
summation order (edges sum grouped by window row + overflow); it is OPT-IN
at serving scale — the default XLA path stays bit-identical to the
reference for the fidelity differentials.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _win_base_row(b: int | jnp.ndarray, B: int, W: int, R: int):
    """First f-row of block b's window; same formula traced in-kernel and
    concretely in the builder."""
    center = b * B + B // 2
    base = (center - W // 2) // 128
    lo, hi = 0, R - W // 128
    if isinstance(b, (int, np.integer)):
        return int(np.clip(base, lo, hi))
    return jnp.clip(base, lo, hi)


@dataclass(frozen=True)
class RoutedOverflow:
    """Structured replacement for the scalar-COO overflow path.

    Every overflow edge in the scalar path pays an XLA scalar gather
    (~7.4ns) plus a scalar scatter-add (~10.9ns) — 18ns/edge flat
    (scripts/probe_overflow_routing.py stages A-C), which is 250 of the
    286 ms/iter on a 10M x 32 graph at 4.4% overflow. This layout serves
    the same edges through lane/row-structured primitives only:

      1. edges grouped by NEIGHBOR f-row: one (T,128) row gather fetches
         each tile's source row (0.26 ns/edge, stage E), a Pallas
         take_along_axis picks each edge's lane and multiplies its weight
         (0.27 ns/edge, stage J),
      2. a fixed-key `lax.sort` routes the per-edge products to a layout
         grouped by DESTINATION f-row (3.3 ns/edge, stage G — sorting
         BEATS applying the same permutation as a scalar gather),
      3. a Pallas one-hot compare reduces each dest tile's slots onto
         their dest lanes (handles arbitrary per-vertex multiplicity,
         hubs included), and one row-granular scatter-add lands the
         (T,128) partials (0.33 ns/edge, stage F).

    Both sides pad edge groups to 128-slot tiles (pad slots carry w=0 and
    route into pad slots of the other side), so total slots are ~1.3x the
    edge count; the route key is a permutation fixed at build time — only
    the VALUES move per iteration. Numerics: per-vertex sums accumulate
    in src-sorted slot order, within the windowed contract (f32 summation
    order may differ from the scalar path)."""

    g_rows: np.ndarray  # (T,) int32: f2d row fetched by each gather tile
    g_lanes: np.ndarray  # (T, 128) int32: edge's lane within that row
    g_w: np.ndarray  # (T, 128) float32 edge weight, 0 = padding slot
    route_key: np.ndarray  # (T*128,) int32 permutation: gather pos -> dest pos
    s_lanes: np.ndarray  # (T, 128) int32: dest lane (src % 128)
    s_rows: np.ndarray  # (T,) int32: dest f2d row (src // 128)
    n_edges: int

    def device_arrays(self):
        dev = getattr(self, "_device_arrays", None)
        if dev is None:
            dev = tuple(
                jnp.asarray(x)
                for x in (self.g_rows, self.g_lanes, self.g_w,
                          self.route_key, self.s_lanes, self.s_rows)
            )
            object.__setattr__(self, "_device_arrays", dev)
        return dev

    def to_coo(self):
        """Reconstruct the scalar (src, nbr, w) COO — consumers that split
        overflow per shard (parallel.sharded_graph) need the flat edge list,
        and the layout's own COO fields are vestigial once routing is
        attached."""
        g_w = np.asarray(self.g_w).reshape(-1)
        real = np.flatnonzero(g_w != 0)
        nbr = (np.asarray(self.g_rows).repeat(128)[real] * 128
               + np.asarray(self.g_lanes).reshape(-1)[real])
        q = np.asarray(self.route_key)[real]
        src = (np.asarray(self.s_rows)[q >> 7] * 128
               + np.asarray(self.s_lanes).reshape(-1)[q])
        return (src.astype(np.int32), nbr.astype(np.int32), g_w[real])


# tiles per Pallas grid step for the routed-overflow kernels; T is padded
# to a multiple of the larger at build time. The one-hot reduce block is
# bounded by its (TB, 128, 128) f32 compare mask in scoped VMEM (32 -> 2MB).
_ROUTED_GATHER_TILES = 512
_ROUTED_ONEHOT_TILES = 32


def build_routed_overflow(
    ovf_src, ovf_nbr, ovf_w, *, min_edges: int = 1 << 17
) -> "RoutedOverflow | None":
    """Build the routed layout from the scalar overflow COO (padding slots
    carry w == 0, as both windowed builders construct them). Returns None
    below `min_edges` real edges — the scalar path costs ~18ns/edge, so
    routing only pays once overflow reaches milliseconds (and each layout
    adds ~20 device bytes/edge plus two small kernels to the program)."""
    src = np.asarray(ovf_src)
    nbr = np.asarray(ovf_nbr)
    w = np.asarray(ovf_w, dtype=np.float32)
    real = w != 0
    src, nbr, w = src[real].astype(np.int64), nbr[real].astype(np.int64), w[real]
    M = int(src.size)
    if M < min_edges:
        return None

    def grouped_positions(group_of):
        """Stable-sort edges by group; pad each group to whole 128-slot
        tiles. Returns (pos per original edge, tile group ids)."""
        order = np.argsort(group_of, kind="stable")
        g_s = group_of[order]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
        cnt = np.diff(np.r_[starts, M])
        tiles = -(-cnt // 128)
        tile_off = np.r_[0, np.cumsum(tiles)]
        within = np.arange(M, dtype=np.int64) - np.repeat(starts, cnt)
        pos_sorted = np.repeat(tile_off[:-1] * 128, cnt) + within
        pos = np.empty(M, np.int64)
        pos[order] = pos_sorted
        tile_groups = np.repeat(g_s[starts], tiles)
        return pos, tile_groups

    g_pos, g_tile_rows = grouped_positions(nbr >> 7)
    s_pos, s_tile_rows = grouped_positions(src >> 7)

    tile_mult = max(_ROUTED_GATHER_TILES, _ROUTED_ONEHOT_TILES)
    T = -(-max(len(g_tile_rows), len(s_tile_rows)) // tile_mult) * tile_mult
    SZ = T * 128

    g_rows = np.zeros(T, np.int32)
    g_rows[:len(g_tile_rows)] = g_tile_rows
    g_lanes = np.zeros(SZ, np.int32)
    g_lanes[g_pos] = nbr & 127
    g_w = np.zeros(SZ, np.float32)
    g_w[g_pos] = w

    s_rows = np.zeros(T, np.int32)
    s_rows[:len(s_tile_rows)] = s_tile_rows
    s_lanes = np.zeros(SZ, np.int32)
    s_lanes[s_pos] = src & 127

    route_key = np.full(SZ, -1, np.int64)
    route_key[g_pos] = s_pos
    used_q = np.zeros(SZ, bool)
    used_q[s_pos] = True
    route_key[route_key < 0] = np.flatnonzero(~used_q)

    return RoutedOverflow(
        g_rows=g_rows,
        g_lanes=g_lanes.reshape(T, 128),
        g_w=g_w.reshape(T, 128),
        route_key=route_key.astype(np.int32),
        s_lanes=s_lanes.reshape(T, 128),
        s_rows=s_rows,
        n_edges=M,
    )


def _lane_gather_mul_kernel(x_ref, l_ref, w_ref, o_ref):
    o_ref[...] = w_ref[...] * jnp.take_along_axis(
        x_ref[...], l_ref[...], axis=1
    )


def _onehot_reduce_kernel(v_ref, l_ref, o_ref):
    v = v_ref[...]  # (TB, 128)
    lanes = l_ref[...]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    m = (lanes[..., None] == iota).astype(jnp.float32)  # (TB, 128, 128)
    o_ref[...] = (m * v[..., None]).sum(axis=1)


def routed_overflow_2d(
    f2d, g_rows, g_lanes, g_w, route_key, s_lanes, s_rows, *, interpret: bool
):
    """Overflow contribution as a (R, 128) addend (jit-composable; see
    `RoutedOverflow` for the pipeline and per-stage measurements)."""
    T = g_rows.shape[0]
    rows = f2d[g_rows]
    tile_spec = pl.BlockSpec((_ROUTED_GATHER_TILES, 128), lambda i: (i, 0))
    vals = pl.pallas_call(
        _lane_gather_mul_kernel,
        grid=(T // _ROUTED_GATHER_TILES,),
        in_specs=[tile_spec, tile_spec, tile_spec],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
        interpret=interpret,
    )(rows, g_lanes, g_w)
    _, routed = jax.lax.sort((route_key, vals.reshape(-1)), num_keys=1)
    oh_spec = pl.BlockSpec((_ROUTED_ONEHOT_TILES, 128), lambda i: (i, 0))
    partials = pl.pallas_call(
        _onehot_reduce_kernel,
        grid=(T // _ROUTED_ONEHOT_TILES,),
        in_specs=[oh_spec, oh_spec],
        out_specs=oh_spec,
        out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
        interpret=interpret,
    )(routed.reshape(T, 128), s_lanes)
    return jnp.zeros_like(f2d).at[s_rows].add(partials)


@dataclass(frozen=True)
class WindowedSpmv:
    """Build-time edge layout for `windowed_spmv` (numpy, graph-static).

    Frozen: `device_arrays` caches the one-time upload, so in-place field
    mutation (e.g. reweighting wslab between rounds) would silently serve
    stale device data — rebuild the layout instead."""

    cidx: np.ndarray  # (NB, UROWS, EROWS, 128) int16 lane index in window row
    wslab: np.ndarray  # (NB, UROWS, EROWS, 128) float32, 0 = empty slot
    ovf_src: np.ndarray  # (M,) int32 destination vertex (padded with 0)
    ovf_nbr: np.ndarray  # (M,) int32 source vertex (padded with 0)
    ovf_w: np.ndarray  # (M,) float32 (padded with 0)
    n: int
    B: int
    W: int
    cap: int
    coverage: float  # fraction of edges served by the kernel
    # optional vertex relabeling baked into the layout (order[new] = old id):
    # slabs/overflow are expressed in the RELABELED space; propagate_windowed
    # permutes its (N,) inputs in and the scores back out, so callers see
    # original-order semantics. None = identity (the common serving case).
    order: "np.ndarray | None" = None
    # optional routed-overflow layout (build_routed_overflow / attach via
    # `with_routed_overflow`): when set, `windowed_spmv` serves the overflow
    # edges through the structured route instead of the scalar COO path.
    routed: "RoutedOverflow | None" = None

    @property
    def n_pad(self) -> int:
        return self.cidx.shape[0] * self.B

    @property
    def slab_bytes(self) -> int:
        return self.cidx.nbytes + self.wslab.nbytes

    def order_arrays(self):
        """Device-resident (order, inv) int32 pair for the baked-in
        relabeling (cached like `device_arrays`); None when identity."""
        if self.order is None:
            return None
        dev = getattr(self, "_order_arrays", None)
        if dev is None:
            order = np.asarray(self.order, dtype=np.int32)
            inv = np.empty_like(order)
            inv[order] = np.arange(self.n, dtype=np.int32)
            dev = (jnp.asarray(order), jnp.asarray(inv))
            object.__setattr__(self, "_order_arrays", dev)
        return dev

    def device_arrays(self):
        """Device-resident (cidx, wslab, ovf_src, ovf_nbr, ovf_w), uploaded
        ONCE and cached — the slabs are ~0.5GB at 1M x K=32 and the serving
        loop calls propagation every round (re-uploading per call costs ~20s
        through a dev tunnel and dwarfs the iteration time)."""
        dev = getattr(self, "_device_arrays", None)
        if dev is None:
            dev = tuple(
                jnp.asarray(x)
                for x in (self.cidx, self.wslab, self.ovf_src,
                          self.ovf_nbr, self.ovf_w)
            )
            object.__setattr__(self, "_device_arrays", dev)
        return dev

    def routed_arrays(self):
        """The routed-overflow device 6-tuple, or None when the layout
        serves overflow through the scalar COO path."""
        return None if self.routed is None else self.routed.device_arrays()


# Defaults from the on-chip sweep at 1M x K=32 on the post-RCM regime
# (97% local edges, scripts/probe_spmv_cap_sweep.py): (512, 1408, 12) hits
# the graph's coverage ceiling 0.970 at the SAME slab bytes as the old
# (1024, 2048, 8) default (1.1GB) and runs 19.3 vs 26.3 ms/iter — the
# decomposition probe (probe_spmv_overflow.py) showed slab slots are
# near-free while every overflow edge costs ~10-15ns, so trading window
# width for per-row capacity (which eliminates Poisson cap collisions at
# ~5 local edges per window row) is strictly better at fixed bytes.
_DEFAULT_B, _DEFAULT_W, _DEFAULT_CAP = 512, 1408, 12


def build_windowed_layout(
    nbr: np.ndarray,  # (N, K) int32, -1 padding
    w: np.ndarray,  # (N, K) float32
    *,
    B: int = _DEFAULT_B,
    W: int = _DEFAULT_W,
    cap: int = _DEFAULT_CAP,
) -> WindowedSpmv:
    assert B % 128 == 0 and W % 128 == 0 and (B * cap) % 128 == 0
    N, K = nbr.shape
    NB = -(-N // B)
    N_pad = NB * B
    W = min(W, N_pad)  # small graphs: the window cannot exceed the array
    R = N_pad // 128
    UROWS = W // 128
    EROWS = B * cap // 128

    # all (N, K) row-wise vectorized ops — no 32M global argsort (a 1-vCPU
    # host builds the 1M x 32 layout in seconds, not minutes)
    dst = nbr.astype(np.int64)
    real = dst >= 0
    blk = (np.arange(N, dtype=np.int64) // B)[:, None]
    base_row = np.array(
        [_win_base_row(b, B, W, R) for b in range(NB)], dtype=np.int64
    )
    rel = dst - (base_row[blk] * 128).repeat(K).reshape(N, K)
    inside = real & (rel >= 0) & (rel < W)
    u = np.where(inside, rel >> 7, UROWS)  # outside -> sentinel row

    # per-(vertex, u) occurrence index: sort each row of K by u (stable)
    order = np.argsort(u, axis=1, kind="stable")
    u_s = np.take_along_axis(u, order, axis=1)
    same = np.zeros((N, K), dtype=np.int64)
    same[:, 1:] = (u_s[:, 1:] == u_s[:, :-1]).astype(np.int64)
    # occurrence = run position via per-row cumulative count of same-run
    occ = np.zeros((N, K), dtype=np.int64)
    run = same.copy()
    for k in range(1, K):  # K is small (<=64): per-column carry propagate
        run[:, k] = np.where(same[:, k] == 1, run[:, k - 1] + 1, 0)
    occ = run

    inside_s = u_s < UROWS
    keep_s = inside_s & (occ < cap)
    vv = np.broadcast_to(np.arange(N, dtype=np.int64)[:, None], (N, K))
    dst_s = np.take_along_axis(dst, order, axis=1)
    wt_s = np.take_along_axis(w.astype(np.float32), order, axis=1)
    lane_s = np.where(inside_s, np.take_along_axis(rel, order, axis=1) & 127, 0)

    cidx = np.zeros((NB, UROWS, B * cap), dtype=np.int16)
    wslab = np.zeros((NB, UROWS, B * cap), dtype=np.float32)
    km = keep_s
    vb = vv[km] % B
    flat = vb * cap + occ[km]
    cidx[vv[km] // B, u_s[km], flat] = lane_s[km].astype(np.int16)
    wslab[vv[km] // B, u_s[km], flat] = wt_s[km]
    cidx = cidx.reshape(NB, UROWS, EROWS, 128)
    wslab = wslab.reshape(NB, UROWS, EROWS, 128)

    real_s = dst_s >= 0
    ovf_mask = real_s & ~km
    v_ovf = vv[ovf_mask]
    dst_ovf = dst_s[ovf_mask]
    wt_ovf = wt_s[ovf_mask]
    M = int(ovf_mask.sum())
    Mp = max(-(-M // 128) * 128, 128)
    ovf_src = np.zeros(Mp, dtype=np.int32)
    ovf_nbr = np.zeros(Mp, dtype=np.int32)
    ovf_w = np.zeros(Mp, dtype=np.float32)
    ovf_src[:M] = v_ovf
    ovf_nbr[:M] = dst_ovf
    ovf_w[:M] = wt_ovf

    total = int(real.sum())
    return WindowedSpmv(
        cidx=cidx, wslab=wslab,
        ovf_src=ovf_src, ovf_nbr=ovf_nbr, ovf_w=ovf_w,
        n=N, B=B, W=W, cap=cap,
        coverage=1.0 - (M / max(total, 1)),
    )


@functools.partial(
    jax.jit, static_argnames=("B", "W", "cap", "nb_total")
)
def _build_slabs_device(nbr, w, row0, *, B: int, W: int, cap: int,
                        nb_total: int):
    """Traced core of `build_windowed_layout_device`: identical algorithm to
    the numpy builder, on the accelerator. Returns the packed slabs plus the
    row-major overflow mask/positions for the second (static-Mp) pass.

    `nbr`/`w` may be a contiguous ROW SLICE of the full graph starting at
    global row `row0` (a traced scalar, multiple of B): window base rows are
    computed from GLOBAL block ids against the full graph's `nb_total`
    blocks, so per-chunk builds compose into exactly the one-shot layout
    (the chunked entry in `build_windowed_layout_device` bounds transient
    device memory — a one-shot 10M x 32 build holds ~10 (N, K) buffers)."""
    N, K = nbr.shape
    NB = -(-N // B)
    R = nb_total * B // 128  # GLOBAL padded row count
    UROWS = W // 128
    EROWS = B * cap // 128

    dst = nbr.astype(jnp.int32)
    real = dst >= 0
    vv = jnp.arange(N, dtype=jnp.int32)[:, None]
    blk = vv // B  # slice-local block (indexes this slice's slab chunk)
    blk_g = row0 // B + blk
    base_row = jnp.clip(
        (blk_g * B + B // 2 - W // 2) // 128, 0, R - UROWS
    )  # (N, 1): per-row value equals the per-block one (rows share blk_g)
    rel = dst - base_row * 128
    inside = real & (rel >= 0) & (rel < W)
    u = jnp.where(inside, rel >> 7, UROWS).astype(jnp.int32)

    order = jnp.argsort(u, axis=1, stable=True).astype(jnp.int32)
    u_s = jnp.take_along_axis(u, order, axis=1)
    kk = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (N, K))
    changes = jnp.concatenate(
        [jnp.ones((N, 1), bool), u_s[:, 1:] != u_s[:, :-1]], axis=1
    )
    # run position within each equal-u group = k - index of the group start
    occ = kk - jax.lax.cummax(jnp.where(changes, kk, 0), axis=1)
    keep = (u_s < UROWS) & (occ < cap)

    dst_s = jnp.take_along_axis(dst, order, axis=1)
    wt_s = jnp.take_along_axis(w.astype(jnp.float32), order, axis=1)
    rel_s = jnp.take_along_axis(rel, order, axis=1)
    lane_s = jnp.where(u_s < UROWS, rel_s & 127, 0).astype(jnp.int32)

    size = NB * UROWS * B * cap
    slab_idx = jnp.where(
        keep,
        (blk * UROWS + u_s) * (B * cap) + (vv % B) * cap + occ,
        size,  # dropped by scatter mode='drop'
    ).reshape(-1)
    cidx = (
        jnp.zeros(size, jnp.int16)
        .at[slab_idx].set(lane_s.reshape(-1).astype(jnp.int16), mode="drop")
        .reshape(NB, UROWS, EROWS, 128)
    )
    wslab = (
        jnp.zeros(size, jnp.float32)
        .at[slab_idx].set(wt_s.reshape(-1), mode="drop")
        .reshape(NB, UROWS, EROWS, 128)
    )

    ovf_mask = ((dst_s >= 0) & ~keep).reshape(-1)
    positions = jnp.cumsum(ovf_mask.astype(jnp.int32)) - 1
    return (cidx, wslab, dst_s, wt_s, ovf_mask, positions,
            ovf_mask.sum(), real.sum())


@functools.partial(jax.jit, static_argnames=("Mp",))
def _extract_overflow_device(dst_s, wt_s, ovf_mask, positions, row0, *,
                             Mp: int):
    N, K = dst_s.shape
    vv = jnp.broadcast_to(
        row0 + jnp.arange(N, dtype=jnp.int32)[:, None], (N, K)
    ).reshape(-1)
    tgt = jnp.where(ovf_mask, positions, Mp)  # non-overflow -> dropped
    ovf_src = jnp.zeros(Mp, jnp.int32).at[tgt].set(vv, mode="drop")
    ovf_nbr = jnp.zeros(Mp, jnp.int32).at[tgt].set(
        dst_s.reshape(-1), mode="drop"
    )
    ovf_w = jnp.zeros(Mp, jnp.float32).at[tgt].set(
        wt_s.reshape(-1), mode="drop"
    )
    return ovf_src, ovf_nbr, ovf_w


def build_windowed_layout_device(
    nbr,  # (N, K) int32, -1 padding — host numpy or device array
    w,  # (N, K) float32
    *,
    B: int = _DEFAULT_B,
    W: int = _DEFAULT_W,
    cap: int = _DEFAULT_CAP,
    chunk_rows: int | None = None,
) -> WindowedSpmv:
    """`build_windowed_layout` computed ON the accelerator; the returned
    layout's slab/overflow fields are device arrays (`device_arrays()` then
    uploads nothing). Field-for-field equal to the host builder (oracle test
    in tests/test_pallas_spmv.py). Use for serving-scale graphs: the host
    build is ~35 passes over (N,K) arrays — minutes at 1M x 32 on a small
    host — while the device build is milliseconds of device time + one
    scalar fetch.

    Transient device memory is ~8-10 (N, K) buffers — fine at 1M x 32
    (~1.3GB), an OOM at 10M x 32 (>12GB on a 16GB chip). `chunk_rows`
    bounds it: the build runs per contiguous row slice (window base rows
    stay GLOBAL, so chunked output is field-for-field equal to one-shot,
    incl. overflow order — row-major either way). Defaults to auto-chunking
    past ~2M edges-rows so serving-scale graph builds just work."""
    assert B % 128 == 0 and W % 128 == 0 and (B * cap) % 128 == 0
    N, K = nbr.shape
    NB = -(-N // B)
    N_pad = NB * B
    W = min(W, N_pad)
    if chunk_rows is None and N * K > 64 * 1024 * 1024:
        chunk_rows = max(B, (64 * 1024 * 1024 // K) // B * B)
    nbr = jnp.asarray(nbr)
    w = jnp.asarray(w)
    if chunk_rows is None or chunk_rows >= N:
        (cidx, wslab, dst_s, wt_s, ovf_mask, positions, m, total) = (
            _build_slabs_device(nbr, w, jnp.int32(0),
                                B=B, W=W, cap=cap, nb_total=NB)
        )
        M, total = int(m), int(total)
        Mp = max(-(-M // 128) * 128, 128)
        ovf_src, ovf_nbr, ovf_w = _extract_overflow_device(
            dst_s, wt_s, ovf_mask, positions, jnp.int32(0), Mp=Mp
        )
        return WindowedSpmv(
            cidx=cidx, wslab=wslab,
            ovf_src=ovf_src, ovf_nbr=ovf_nbr, ovf_w=ovf_w,
            n=N, B=B, W=W, cap=cap,
            coverage=1.0 - (M / max(total, 1)),
        )

    # chunked: slabs fill a preallocated device array in place (donation —
    # concatenation would hold 2x); per-chunk overflow lands on host (small
    # by construction: windowed only wins when overflow is rare) and is
    # re-uploaded once, preserving global row-major edge order
    chunk_rows = max(B, chunk_rows // B * B)
    UROWS = W // 128
    EROWS = B * cap // 128
    cidx_g = jnp.zeros((NB, UROWS, EROWS, 128), jnp.int16)
    wslab_g = jnp.zeros((NB, UROWS, EROWS, 128), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _fill(g, c, b0):
        return jax.lax.dynamic_update_slice(
            g, c, (b0, jnp.int32(0), jnp.int32(0), jnp.int32(0))
        )

    ovf_parts = []
    total = 0
    for c0 in range(0, N, chunk_rows):
        c1 = min(c0 + chunk_rows, N)
        (cidx_c, wslab_c, dst_s, wt_s, ovf_mask, positions, m, tot) = (
            _build_slabs_device(nbr[c0:c1], w[c0:c1], jnp.int32(c0),
                                B=B, W=W, cap=cap, nb_total=NB)
        )
        M_c, total = int(m), total + int(tot)
        # bucketed pad keeps the extract program's shape count small
        Mp_c = max(128, -(-M_c // (1 << 18)) * (1 << 18))
        o_src, o_nbr, o_w = _extract_overflow_device(
            dst_s, wt_s, ovf_mask, positions, jnp.int32(c0), Mp=Mp_c
        )
        ovf_parts.append(tuple(
            np.asarray(jax.device_get(a))[:M_c] for a in (o_src, o_nbr, o_w)
        ))
        cidx_g = _fill(cidx_g, cidx_c, jnp.int32(c0 // B))
        wslab_g = _fill(wslab_g, wslab_c, jnp.int32(c0 // B))
    M = sum(len(p[0]) for p in ovf_parts)
    Mp = max(-(-M // 128) * 128, 128)
    ovf_src = np.zeros(Mp, dtype=np.int32)
    ovf_nbr = np.zeros(Mp, dtype=np.int32)
    ovf_w = np.zeros(Mp, dtype=np.float32)
    at = 0
    for p_src, p_nbr, p_w in ovf_parts:
        ovf_src[at:at + len(p_src)] = p_src
        ovf_nbr[at:at + len(p_src)] = p_nbr
        ovf_w[at:at + len(p_src)] = p_w
        at += len(p_src)
    # overflow stays HOST-side: device_arrays() uploads lazily on first
    # use, and with_routed_overflow consumes it on host (at 10M the COO is
    # ~170MB — an eager upload would be wasted the moment routing replaces
    # it with vestigial zeros)
    return WindowedSpmv(
        cidx=cidx_g, wslab=wslab_g,
        ovf_src=ovf_src, ovf_nbr=ovf_nbr, ovf_w=ovf_w,
        n=N, B=B, W=W, cap=cap,
        coverage=1.0 - (M / max(total, 1)),
    )


def _spmv_kernel(base_ref, f_ref, idx_ref, w_ref, out_ref, *, UROWS, EROWS):
    # base_ref: scalar-prefetched (NB,) int32 of per-block window base rows
    # (build-time values — in the mesh-sharded case the local grid's block b
    # is a GLOBAL block whose window indexes the replicated (R, 128) f)
    base_row = base_ref[pl.program_id(0)]
    acc = jnp.zeros((EROWS, 128), jnp.float32)
    for u in range(UROWS):
        frow = f_ref[pl.ds(base_row + u, 1), :]  # (1, 128) dynamic row
        src = jnp.broadcast_to(frow, (EROWS, 128))
        # cidx is stored int16 (lane ids < 128; slabs are the HBM-budget
        # term at 10M — 6 vs 8 B/slot buys cap 8 -> 11 under the same
        # roof, coverage 0.9563 -> 0.9694, probe_slot_budget_10M.py);
        # Mosaic wants int32 for the lane shuffle, widen in VMEM
        g = jnp.take_along_axis(src, idx_ref[0, u].astype(jnp.int32), axis=1)
        acc = acc + w_ref[0, u] * g
    out_ref[0] = acc


def _base_rows(NB: int, B: int, W: int, R: int) -> np.ndarray:
    """Build-time per-block window base rows (the clip bound R is the
    BUILD's padded row count; slab lane indices are relative to these)."""
    return np.array(
        [_win_base_row(b, B, W, R) for b in range(NB)], dtype=np.int32
    )


def _spmv_core(f2d, cidx, wslab, base_rows, *, interpret: bool):
    """Windowed slab contraction: (R, 128) scores x local slabs ->
    (NB, EROWS, 128) partial products (per-vertex cap-lane sums happen in
    XLA afterwards — Mosaic cannot reshape lanes). f2d may have MORE rows
    than the build's padded size (mesh case: replicated global scores);
    base_rows must be the build-time values."""
    NB, UROWS, EROWS, _ = cidx.shape
    R = f2d.shape[0]
    return pl.pallas_call(
        functools.partial(_spmv_kernel, UROWS=UROWS, EROWS=EROWS),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                # index maps take the scalar-prefetch ref as a trailing arg
                pl.BlockSpec((R, 128), lambda i, *_: (0, 0)),  # full f, VMEM
                pl.BlockSpec((1, UROWS, EROWS, 128),
                             lambda i, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, UROWS, EROWS, 128),
                             lambda i, *_: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, EROWS, 128), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((NB, EROWS, 128), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=(R * 128 * 4 + 8 * UROWS * EROWS * 128 * 6)
            // (1024 * 1024) * 1024 * 1024 + 24 * 1024 * 1024,
        ),
    )(base_rows, f2d, cidx, wslab)


@functools.partial(
    jax.jit, static_argnames=("n", "B", "W", "cap", "interpret")
)
def windowed_spmv(
    f: jnp.ndarray,  # (N,) float32
    cidx: jnp.ndarray,
    wslab: jnp.ndarray,
    ovf_src: jnp.ndarray,
    ovf_nbr: jnp.ndarray,
    ovf_w: jnp.ndarray,
    routed=None,  # optional RoutedOverflow.device_arrays() 6-tuple
    *,
    n: int,
    B: int,
    W: int,
    cap: int,
    interpret: bool = False,
) -> jnp.ndarray:
    NB, UROWS, EROWS, _ = cidx.shape
    if UROWS != W // 128:
        # the builder clamps W on small graphs (W = min(W, N_pad)); a caller
        # passing its REQUESTED W instead of layout.W would make every
        # block's base-row clip negative and gather from wrong window rows
        raise ValueError(
            f"W={W} does not match the layout's window ({UROWS * 128}); "
            "pass layout.W"
        )
    N_pad = NB * B
    R = N_pad // 128
    f_pad = jnp.pad(f, (0, N_pad - n)) if N_pad != n else f
    f2d = f_pad.reshape(R, 128)

    out = _spmv_core(
        f2d, cidx, wslab, jnp.asarray(_base_rows(NB, B, W, R)),
        interpret=interpret,
    )

    wf = out.reshape(NB, EROWS * 128 // cap, cap).sum(-1).reshape(N_pad)[:n]
    if routed is not None:
        # structured overflow: ~4.4ns/edge vs the scalar path's ~18
        # (see RoutedOverflow); the COO arrays are vestigial 128-slot
        # zeros when a routed layout is attached
        ovf2d = routed_overflow_2d(f2d, *routed, interpret=interpret)
        return wf + ovf2d.reshape(N_pad)[:n]
    # overflow edges: XLA gather + scatter-add (rare by construction)
    g = ovf_w * f[jnp.clip(ovf_nbr, 0, n - 1)]
    wf = wf + jnp.zeros(n, jnp.float32).at[ovf_src].add(g)
    return wf


@jax.jit
def _occ_hist(nbr, B, W):
    """Exact layout-coverage probe for one (B, W) candidate: histogram of
    per-(vertex, window-row) occurrence indices over real in-window edges
    (bucket K collects over-window + padding). coverage(cap) is then
    hist[:cap].sum()/total and the in-window CEILING is hist[:K].sum()/total
    — one cheap dispatch tells the selector the whole cap-coverage curve
    without building anything. Mirrors the builder's occ computation.

    B and W are TRACED scalars, not static: they only enter through scalar
    arithmetic (the per-vertex window base row and the in-window tests), so
    one compile serves every candidate — the selector's 16-candidate sweep
    at 10M paid ~600s in per-(B, W) compiles through the tunnel when these
    were static_argnames."""
    N, K = nbr.shape
    B = jnp.asarray(B, jnp.int32)
    W = jnp.asarray(W, jnp.int32)
    NB = (N + B - 1) // B
    R = NB * B // 128
    UROWS = W // 128
    dst = nbr.astype(jnp.int32)
    real = dst >= 0
    vv = jnp.arange(N, dtype=jnp.int32)[:, None]
    # per-vertex window base row, elementwise (the builders compute the
    # same value per block then index by vv // B)
    base_row = jnp.clip(
        ((vv // B) * B + B // 2 - W // 2) // 128, 0, R - UROWS
    )
    rel = dst - base_row * 128
    inside = real & (rel >= 0) & (rel < W)
    u = jnp.where(inside, rel >> 7, UROWS).astype(jnp.int32)
    order = jnp.argsort(u, axis=1, stable=True).astype(jnp.int32)
    u_s = jnp.take_along_axis(u, order, axis=1)
    kk = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (N, K))
    changes = jnp.concatenate(
        [jnp.ones((N, 1), bool), u_s[:, 1:] != u_s[:, :-1]], axis=1
    )
    occ = kk - jax.lax.cummax(jnp.where(changes, kk, 0), axis=1)
    real_s = jnp.take_along_axis(real, order, axis=1)
    key = jnp.where(real_s & (u_s < UROWS), occ, K).reshape(-1)
    hist = jnp.zeros(K + 1, jnp.int32).at[key].add(1)
    return hist, real.sum()


# slot budget (slab ints+floats per vertex) of the swept default layout —
# candidates trade window rows for per-row capacity under this roof
_BUDGET_SLOTS = (_DEFAULT_W // 128) * _DEFAULT_CAP  # 11 * 12 = 132


def _layout_candidates(N: int, K: int, budget: int = _BUDGET_SLOTS):
    """(B, W, cap) candidates at <= the default slab byte budget. cap is
    clamped to K (slots past the max per-row occupancy are dead bytes), so
    narrow-window candidates often cost LESS than the default. W clamps to
    the per-B padded size exactly like the builders do.

    Auto-selected caps are constrained so the slab's trailing-dims shape
    (EROWS, 128) = (B*cap/128, 128) is TILE-ALIGNED for every slab dtype
    (int16 cidx wants EROWS % 16, f32 wslab % 8): an unaligned EROWS makes
    XLA relayout-copy BOTH slab arrays into padded tiled temps at every
    program entry — measured at 10M: a cap=10 layout's fused KnnProp2
    round carried 9.77GB of temps (2x slab copies at 1.6x padding, OOM
    next to the database) vs 0.72GB for an aligned cap (the compiled
    memory_analysis is the evidence; tests pin the alignment)."""
    cands = []
    for B in (512, 128):
        n_pad = -(-N // B) * B
        for U in (2, 3, 5, 7, 9, 11, 13, 22):
            W = min(U * 128, n_pad)
            if W < B:
                continue
            Ueff = W // 128
            cap = min(budget // Ueff, K, 64)
            while cap >= 1 and (B * cap) % (128 * 16):
                cap -= 1
            if cap < 1:
                continue
            if (B, W, cap) not in cands:
                cands.append((B, W, cap))
    return cands


def select_windowed_params(nbr, *, budget: int = _BUDGET_SLOTS,
                           sample_rows: int | None = None):
    """Pick (B, W, cap) for this graph by measuring, not guessing: probe the
    exact cap-coverage curve of every candidate (one `_occ_hist` dispatch
    each) and keep the best coverage, tie-broken by fewer slab slots then
    narrower window. Returns (B, W, cap, coverage, ceiling) where ceiling is
    the best candidate's in-window edge fraction at infinite cap (what a
    relabeling could still improve).

    `sample_rows` probes only a contiguous row prefix: per-row occupancy is
    translation-invariant in this block/window geometry (tail clipping
    aside), and `_occ_hist` at 10M x 32 would hold ~8 (N, K) transients per
    candidate; the BUILD still reports exact coverage.

    Motivation (probe_real_graph_rcm, real 1M x 32 kNN graph): after RCM the
    graph is perfectly local but every vertex's 32 neighbors land in 1-2
    window rows — the swept (512, 1408, 12) default caps out at coverage
    0.375 (= 12/32 exactly) and LOSES to plain XLA. The right layout there
    is narrow-window high-cap (e.g. 128, 384, 32): cap >= K makes cap
    collisions impossible and costs FEWER bytes. No single default serves
    both regimes; the graph's own occupancy histogram decides."""
    nbr_dev = jnp.asarray(nbr)
    N, K = nbr.shape
    if sample_rows is not None and sample_rows < N:
        sample_rows = max(128, sample_rows // 128 * 128)
        nbr_dev = nbr_dev[:sample_rows]
        N = sample_rows
    best = None
    for B, W, cap in _layout_candidates(N, K, budget):
        hist, total = jax.device_get(_occ_hist(nbr_dev, B, W))
        total = max(int(total), 1)
        cov = float(hist[:cap].sum()) / total
        ceil = float(hist[:K].sum()) / total
        slots = (W // 128) * cap
        key = (-cov, slots, W)
        if best is None or key < best[0]:
            best = (key, (B, W, cap, cov, ceil))
    return best[1]


"""Slab-HBM roof for auto-selected layouts: the default 132-slot budget is
0.8GB at 1M vertices but 7.9GB at 10M — an OOM next to the database on a
16GB chip. Past the roof the per-vertex slot budget shrinks proportionally
(107 slots at 10M with int16 cidx; cap>=K layouts of post-RCM real kNN
graphs fit comfortably — their occupancy concentrates in 1-2 window
rows). _SLOT_BYTES is the per-slot storage (2B int16 cidx + 4B f32
wslab); the int16 cidx bought 80 -> 107 slots/vertex at 10M under the
same roof (coverage 0.9563 -> ~0.97, overflow 14.0M -> ~10M edges —
scripts/probe_slot_budget_10M.py). Steady 10M serving set: slabs ~6.2GB
+ routed overflow 0.3GB + int8 database 5.2GB + aligned-layout program
temps 0.7GB = ~12.5GB of the 15.75GB chip."""
_AUTO_SLAB_BYTES = 6 * 1024**3
_SLOT_BYTES = 6


def build_windowed_layout_auto(
    nbr,
    w,
    *,
    device: bool = True,
    relabel: bool = True,
    relabel_threshold: float = 0.85,
    min_coverage: float | None = 0.55,
    slot_budget: int | None = None,
) -> "WindowedSpmv | None":
    """Measure-then-build: `select_windowed_params` probes the graph's own
    occupancy structure and picks the best (B, W, cap) at the default byte
    budget; when even the best candidate's in-window CEILING is poor (an
    arbitrary-order ingest graph carries no locality at any window width)
    the graph is RCM-relabeled and re-probed.

    The layout is kept only when coverage clears `min_coverage`: each
    overflow edge costs a gather AND a scatter-add (~18ns) vs ~9ns/edge in
    the plain XLA step, so windowed LOSES below ~0.55 coverage
    (probe_real_graph_rcm: a shuffled-order real 1M x 32 kNN graph has
    coverage 0.0013 and runs 709 ms/iter vs the 287 XLA baseline). Below
    the floor this returns None = use the XLA path.

    The RCM fallback (`rcm_order` baked into the layout via the `order`
    field; one-time host cost at build) keeps the relabeling INTERNAL:
    `propagate_windowed` permutes its inputs/outputs, so callers keep
    original-id semantics. It is kept only when it buys >5% coverage."""
    build = build_windowed_layout_device if device else build_windowed_layout

    # past ~2M rows, probe candidates on a 1M prefix (exact coverage still
    # comes from the build); the device build auto-chunks its transients
    N = nbr.shape[0]
    sample = 1_048_576 if N > 2_097_152 else None
    if slot_budget is None:
        slot_budget = _BUDGET_SLOTS
        if N * _BUDGET_SLOTS * _SLOT_BYTES > _AUTO_SLAB_BYTES:
            slot_budget = max(16, int(_AUTO_SLAB_BYTES // (_SLOT_BYTES * N)))
    B, W, cap, cov, ceil = select_windowed_params(
        nbr, budget=slot_budget, sample_rows=sample
    )
    chosen = (nbr, w, B, W, cap, cov, None)
    # relabeling only moves edges INTO the window; when the deficit is cap
    # collisions (ceiling already high) no vertex order can fix it
    if relabel and cov < relabel_threshold and ceil < relabel_threshold:
        order = rcm_order(np.asarray(nbr))
        nbr_r, w_r, _ = apply_order(np.asarray(nbr), np.asarray(w), order)
        B2, W2, cap2, cov2, _ = select_windowed_params(
            nbr_r, budget=slot_budget, sample_rows=sample
        )
        if cov2 > cov + 0.05:
            chosen = (nbr_r, w_r, B2, W2, cap2, cov2, order)
    nbr_c, w_c, B, W, cap, cov, order = chosen
    if min_coverage is not None and cov < min_coverage:
        return None
    layout = build(nbr_c, w_c, B=B, W=W, cap=cap)
    if order is not None:
        import dataclasses

        layout = dataclasses.replace(layout, order=order)
    # large overflows get the structured route (~4.4 vs 18 ns/edge —
    # RoutedOverflow): at 10M x 32 / coverage 0.956 this is the difference
    # between 286 and ~100 ms/iter
    return with_routed_overflow(layout)


def with_routed_overflow(
    layout: WindowedSpmv, *, min_edges: int = 1 << 17
) -> WindowedSpmv:
    """Attach a routed-overflow layout (see `RoutedOverflow`) when the
    scalar COO is large enough to pay for it; the COO fields shrink to
    vestigial 128-slot zeros so the ~12 bytes/edge are not held twice.
    No-op below `min_edges` or when already attached."""
    import dataclasses

    if layout.routed is not None:
        return layout
    routed = build_routed_overflow(
        layout.ovf_src, layout.ovf_nbr, layout.ovf_w, min_edges=min_edges
    )
    if routed is None:
        return layout
    z = np.zeros(128, np.int32)
    return dataclasses.replace(
        layout,
        ovf_src=z, ovf_nbr=z, ovf_w=np.zeros(128, np.float32),
        routed=routed,
    )


def rcm_order(nbr: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee vertex ordering over the symmetrized adjacency:
    relabeling real kNN graphs with this concentrates neighbors inside the
    windows (perm[new] = old; apply with `apply_order`)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    N, K = nbr.shape
    v = np.repeat(np.arange(N, dtype=np.int64), K)
    dst = nbr.reshape(-1).astype(np.int64)
    m = (dst >= 0) & (dst != v)
    A = sp.csr_array(
        (np.ones(int(m.sum()), dtype=np.int8), (v[m], dst[m])), shape=(N, N)
    )
    A = A + A.T
    return np.asarray(reverse_cuthill_mckee(A), dtype=np.int64)


def apply_order(nbr: np.ndarray, w: np.ndarray, order: np.ndarray):
    """Relabel the graph: vertex order[i] becomes i. Returns (nbr2, w2, inv)
    with inv mapping old ids -> new ids (scores reorder as f_new = f_old[order])."""
    N = nbr.shape[0]
    inv = np.empty(N, dtype=np.int64)
    inv[order] = np.arange(N)
    nbr2 = np.where(nbr >= 0, inv[np.clip(nbr, 0, None)], -1)[order]
    return nbr2.astype(np.int32), w[order], inv
