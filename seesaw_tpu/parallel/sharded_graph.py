"""Mesh-sharded graph stack: exact kNN build + Jacobi label propagation.

SURVEY §7 stages 5-6: at 10M vectors the O(N²D) exact kNN build is the one
workload that needs every chip. Design (no reference counterpart — the
reference approximates with pynndescent on one host,
`/root/reference/seesaw/knn_graph.py:193-211`):

- **kNN build** (`sharded_exact_knn`): rows are block-sharded over the mesh;
  the column blocks rotate systolically via `ppermute` so every chip scans
  its row block against each column shard in S steps, keeping a running
  top-k merged by (negated raw similarity, index)-lexicographic sort —
  exactly `lax.top_k`-over-similarity's lowest-index-on-ties convention,
  so results match the single-device `ops.knn.exact_knn` bit-for-bit
  (clipped cosine distance is emitted only at the end, so sims > 1.0 from
  duplicate vectors under f32 rounding cannot collapse the tie order). Per step the only cross-
  chip traffic is one (Ns, D) block riding ICI; compute is an MXU matmul.

- **propagation** (`sharded_propagate`): the padded fixed-degree graph is
  row-sharded; each Jacobi step all-gathers the score vector (N floats over
  ICI), gathers neighbors locally, and reduces convergence with `pmax`.
  The whole convergence loop is one `lax.while_loop` inside `shard_map` —
  same update rule, clamping, and stopping test as `ops.propagation`, so
  single- and multi-chip runs agree bit-for-bit.

- **windowed propagation** (`sharded_propagate_windowed`): the Pallas
  lane-shuffle formulation (ops.pallas_spmv — 4.5 ms/iter on a real 1M x 32
  kNN graph vs 287 XLA) composed with the mesh: slab blocks shard on the
  block axis, the score vector all-gathers per iteration (4MB at 1M — ICI
  noise next to slab streaming), each shard's local grid indexes the
  replicated scores through its scalar-prefetched build-time base rows,
  and the overflow COO splits by source shard at setup. This is the path
  that lets the graph story and the scale story compose: slab HBM divides
  by the shard count (a 10M x 32 graph's ~8GB of slabs fits 8 chips).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

AXIS = "data"


def _pad_rows(arr: np.ndarray, n_pad: int, fill=0):
    if n_pad == 0:
        return arr
    pad = np.full((n_pad,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _merge_topk(best_k, best_i, new_k, new_i, k: int):
    """Row-wise merge of two candidate sets on an ascending sort key (the
    NEGATED raw similarity — NOT the clipped distance, so that duplicate
    vectors with sims > 1.0 under f32 rounding keep their relative order);
    ties broken toward the lower index (lax.top_k convention, matching the
    single-device ops.knn.exact_knn path bit-for-bit)."""
    kk = jnp.concatenate([best_k, new_k], axis=1)
    i = jnp.concatenate([best_i, new_i], axis=1)
    k_sorted, i_sorted = jax.lax.sort((kk, i), num_keys=2, dimension=1)
    return k_sorted[:, :k], i_sorted[:, :k]


def sharded_exact_knn(
    vectors: np.ndarray, n_neighbors: int, mesh: Mesh
) -> tuple[np.ndarray, np.ndarray]:
    """(N, k) neighbor ids + cosine distances over a device mesh; exact, and
    identical to ops.knn.exact_knn run on one device."""
    N, D = vectors.shape
    S = mesh.devices.size
    k = min(n_neighbors, N - 1)
    assert k >= 1, "need at least 2 vectors"
    Ns = -(-N // S)  # rows per shard
    Np = Ns * S

    Vp = _pad_rows(np.asarray(vectors, np.float32), Np - N)
    valid = np.zeros(Np, dtype=bool)
    valid[:N] = True

    sharding = NamedSharding(mesh, P(AXIS))
    Vd = jax.device_put(Vp, sharding)
    validd = jax.device_put(valid, sharding)

    kb = min(k, Ns)  # per-block candidate width

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS)),
    )
    def build(V_local, valid_local):
        me = jax.lax.axis_index(AXIS)
        row_ids = me * Ns + jnp.arange(Ns, dtype=jnp.int32)[:, None]

        perm = [(i, (i - 1) % S) for i in range(S)]

        def step(s, carry):
            best_k, best_i, cols, col_valid, col_base = carry
            sims = (V_local @ cols.T).astype(jnp.float32)  # (Ns, Ns)
            col_ids = col_base * Ns + jnp.arange(Ns, dtype=jnp.int32)[None, :]
            masked = jnp.where(
                col_valid[None, :] & (row_ids != col_ids), sims, -jnp.inf
            )
            top_s, top_j = jax.lax.top_k(masked, kb)
            new_k = jnp.where(jnp.isfinite(top_s), -top_s, jnp.inf)
            new_i = jnp.take_along_axis(
                jnp.broadcast_to(col_ids, sims.shape), top_j, axis=1
            )
            new_i = jnp.where(jnp.isfinite(top_s), new_i, jnp.iinfo(jnp.int32).max)
            best_k, best_i = _merge_topk(best_k, best_i, new_k, new_i, k)
            cols = jax.lax.ppermute(cols, AXIS, perm)
            col_valid = jax.lax.ppermute(col_valid, AXIS, perm)
            col_base = jax.lax.ppermute(col_base, AXIS, perm)
            return best_k, best_i, cols, col_valid, col_base

        # mark the device-constant inits as mesh-varying (they become varying
        # after the first merge with per-shard data)
        vary = lambda x: jax.lax.pvary(x, (AXIS,))
        init = (
            vary(jnp.full((Ns, k), jnp.inf, dtype=jnp.float32)),
            vary(jnp.full((Ns, k), jnp.iinfo(jnp.int32).max, dtype=jnp.int32)),
            V_local,
            valid_local,
            me,
        )
        best_k, best_i, _, _, _ = jax.lax.fori_loop(0, S, step, init)
        # emit the reference's clipped cosine distance only at the end; the
        # merge itself ranked on raw similarity (see _merge_topk)
        best_d = jnp.where(
            jnp.isfinite(best_k), jnp.clip(1.0 + best_k, 0.0), jnp.inf
        )
        return best_i, best_d

    ids, dist = build(Vd, validd)
    return np.asarray(ids)[:N], np.asarray(dist)[:N]


def sharded_propagate(
    nbr: np.ndarray,  # (N, Kp) int32, -1 padding
    w: np.ndarray,  # (N, Kp) float32
    degree: np.ndarray,  # (N,)
    prior: np.ndarray,
    labels: np.ndarray,
    is_labeled: np.ndarray,
    start: np.ndarray,
    mesh: Mesh,
    *,
    reg_lambda: float,
    max_iter: int = 300,
    epsilon: float = 1e-5,
) -> np.ndarray:
    """Row-sharded Jacobi propagation; numerically identical to
    ops.propagation.propagate on one device."""
    N, Kp = nbr.shape
    S = mesh.devices.size
    Ns = -(-N // S)
    Np = Ns * S
    n_pad = Np - N

    sharding = NamedSharding(mesh, P(AXIS))
    args = (
        _pad_rows(np.asarray(nbr, np.int32), n_pad, fill=-1),
        _pad_rows(np.asarray(w, np.float32), n_pad),
        _pad_rows(np.asarray(degree, np.float32), n_pad),
        _pad_rows(np.asarray(prior, np.float32), n_pad),
        _pad_rows(np.asarray(labels, np.float32), n_pad),
        _pad_rows(np.asarray(is_labeled, bool), n_pad),
        _pad_rows(np.asarray(start, np.float32), n_pad),
    )
    args = tuple(jax.device_put(a, sharding) for a in args)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS),) * 7,
        out_specs=P(AXIS),
    )
    def run(nbr_l, w_l, deg_l, prior_l, labels_l, is_lab_l, start_l):
        idx = jnp.clip(nbr_l, 0, None)
        valid = nbr_l >= 0
        denom = deg_l + reg_lambda
        denom = jnp.where(denom > 0, denom, 1.0)
        f0 = jnp.where(is_lab_l, labels_l, start_l)

        def step(f_local):
            f_global = jax.lax.all_gather(f_local, AXIS, tiled=True)  # (Np,)
            gathered = jnp.where(valid, f_global[idx], 0.0)
            wf = (w_l * gathered).sum(axis=1)
            new_f = (wf + reg_lambda * prior_l) / denom
            return jnp.where(is_lab_l, labels_l, new_f)

        def cond(state):
            f, _, i, done = state
            return (~done) & (i < max_iter)

        def body(state):
            f, _, i, _ = state
            new_f = step(f)
            local_max = jnp.max((new_f - f) ** 2)
            done = jax.lax.pmax(local_max, AXIS) < epsilon
            return (new_f, f, i + 1, done)

        f, f_prev, _, done = jax.lax.while_loop(
            cond, body, (f0, f0 + 1.0, 0, jnp.asarray(False))
        )
        # converged -> return the PRE-step iterate, matching both the
        # single-device program and the reference (label_propagation.py:66-79)
        return jnp.where(done, f_prev, f)

    out = run(*args)
    return np.asarray(out)[:N]


class _WindowedMeshPrep:
    """Device-resident, call-invariant setup for mesh windowed propagation:
    sharded slab blocks, base rows, per-shard overflow COO, shapes and the
    relabeling permutation. Built once per (layout, mesh) and cached — a
    serving round must not re-split the overflow COO (O(edges) host work)
    or re-upload slabs on every click."""

    __slots__ = ("n", "Np", "Ns", "NBs", "S", "B", "cap", "UROWS", "EROWS",
                 "Mp", "order", "inv", "cidx_d", "wslab_d", "base_d",
                 "ovf_args", "sharding")


_WPREP_CACHE: dict = {}


def _prep_windowed_mesh(layout, mesh: Mesh) -> _WindowedMeshPrep:
    from ..ops.pallas_spmv import _base_rows

    key = (id(layout), id(mesh))
    hit = _WPREP_CACHE.get(key)
    if hit is not None and hit[0] is layout and hit[1] is mesh:
        return hit[2]

    hostify = lambda x: np.asarray(x)
    p = _WindowedMeshPrep()
    p.order = getattr(layout, "order", None)
    p.n = layout.n
    if p.order is not None:
        p.inv = np.empty(p.n, np.int64)
        p.inv[np.asarray(p.order)] = np.arange(p.n)
    else:
        p.inv = None

    B, W, cap = layout.B, layout.W, layout.cap
    cidx = hostify(layout.cidx)
    wslab = hostify(layout.wslab)
    NB, UROWS, EROWS, _ = cidx.shape
    S = mesh.devices.size
    NBs = -(-NB // S)
    nb_pad = NBs * S - NB
    p.Np = NBs * S * B
    p.Ns = NBs * B
    p.NBs, p.S, p.B, p.cap = NBs, S, B, cap
    p.UROWS, p.EROWS = UROWS, EROWS
    if nb_pad:
        zpad = lambda a: np.concatenate(
            [a, np.zeros((nb_pad,) + a.shape[1:], a.dtype)], axis=0
        )
        cidx, wslab = zpad(cidx), zpad(wslab)
    base = np.zeros(NBs * S, np.int32)
    base[:NB] = _base_rows(NB, B, W, (NB * B) // 128)
    base = base.reshape(S, NBs)

    # overflow COO split by source shard (local row ids; zero-weight pads)
    if getattr(layout, "routed", None) is not None:
        src, onbr, ow = layout.routed.to_coo()
    else:
        src = hostify(layout.ovf_src)
        onbr = hostify(layout.ovf_nbr)
        ow = hostify(layout.ovf_w)
    shard_of = src // p.Ns
    counts = np.bincount(shard_of[ow != 0], minlength=S)
    p.Mp = max(-(-int(counts.max(initial=0)) // 128) * 128, 128)
    ovf_src_l = np.zeros((S, p.Mp), np.int32)
    ovf_nbr_l = np.zeros((S, p.Mp), np.int32)
    ovf_w_l = np.zeros((S, p.Mp), np.float32)
    for s in range(S):
        m = (shard_of == s) & (ow != 0)
        c = int(m.sum())
        ovf_src_l[s, :c] = src[m] - s * p.Ns
        ovf_nbr_l[s, :c] = onbr[m]
        ovf_w_l[s, :c] = ow[m]

    blocked = lambda a: jax.device_put(
        a.reshape((S, NBs) + a.shape[1:]), NamedSharding(mesh, P(AXIS))
    )
    p.sharding = NamedSharding(mesh, P(AXIS))
    p.cidx_d, p.wslab_d = blocked(cidx), blocked(wslab)
    p.base_d = jax.device_put(base, p.sharding)
    p.ovf_args = tuple(
        jax.device_put(a, p.sharding) for a in (ovf_src_l, ovf_nbr_l, ovf_w_l)
    )
    while len(_WPREP_CACHE) >= 4:  # a serving process holds O(1) layouts
        _WPREP_CACHE.pop(next(iter(_WPREP_CACHE)))
    _WPREP_CACHE[key] = (layout, mesh, p)
    return p


@functools.lru_cache(maxsize=16)
def _windowed_mesh_run(mesh: Mesh, NBs: int, Np: int, Ns: int, UROWS: int,
                       EROWS: int, cap: int, reg_lambda: float,
                       max_iter: int, epsilon: float, interpret: bool):
    """The compiled mesh Jacobi program, cached by (mesh, shapes, params):
    the previous per-call shard_map closure re-traced on EVERY serving
    round."""
    from ..ops.pallas_spmv import _spmv_core

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS),) * 5 + (P(AXIS, None),) * 2
        + (P(AXIS),) + (P(AXIS, None),) * 3,
        out_specs=P(AXIS),
        # the pallas_call's out_shape carries no varying-mesh-axes
        # annotation, which trips shard_map's replication checker — the
        # data flow here is plainly per-shard (slabs local, scores
        # all-gathered)
        check_rep=False,
    )
    def run(deg_l, prior_l, labels_l, is_lab_l, start_l,
            cidx_l, wslab_l, base_l, osrc_l, onbr_l, ow_l):
        # sharded leading dim arrives as 1; drop it to local block shapes
        cidx_l = cidx_l.reshape(NBs, UROWS, EROWS, 128)
        wslab_l = wslab_l.reshape(NBs, UROWS, EROWS, 128)
        base_l = base_l.reshape(-1)
        denom = deg_l + reg_lambda
        denom = jnp.where(denom > 0, denom, 1.0)
        f0 = jnp.where(is_lab_l, labels_l, start_l)
        osrc, onbr_, ow_ = (
            osrc_l.reshape(-1), onbr_l.reshape(-1), ow_l.reshape(-1)
        )

        def step(f_local):
            f_global = jax.lax.all_gather(f_local, AXIS, tiled=True)  # (Np,)
            f2d = f_global.reshape(Np // 128, 128)
            core = _spmv_core(f2d, cidx_l, wslab_l, base_l,
                              interpret=interpret)
            wf = core.reshape(NBs, EROWS * 128 // cap, cap).sum(-1).reshape(Ns)
            g = ow_ * f_global[onbr_]
            wf = wf + jnp.zeros(Ns, jnp.float32).at[osrc].add(g)
            new_f = (wf + reg_lambda * prior_l) / denom
            return jnp.where(is_lab_l, labels_l, new_f)

        def cond(state):
            f, _, i, done = state
            return (~done) & (i < max_iter)

        def body(state):
            f, _, i, _ = state
            new_f = step(f)
            local_max = jnp.max((new_f - f) ** 2)
            done = jax.lax.pmax(local_max, AXIS) < epsilon
            return (new_f, f, i + 1, done)

        f, f_prev, _, done = jax.lax.while_loop(
            cond, body, (f0, f0 + 1.0, 0, jnp.asarray(False))
        )
        return jnp.where(done, f_prev, f)

    return jax.jit(run)


def sharded_propagate_windowed(
    layout,  # ops.pallas_spmv.WindowedSpmv (host or device fields)
    degree: np.ndarray,
    prior: np.ndarray,
    labels: np.ndarray,
    is_labeled: np.ndarray,
    start: np.ndarray,
    mesh: Mesh,
    *,
    reg_lambda: float,
    max_iter: int = 300,
    epsilon: float = 1e-5,
    interpret: bool | None = None,
) -> np.ndarray:
    """Row-sharded Jacobi propagation through the windowed-SpMV Pallas
    kernel: slab blocks shard on the mesh, the (N,) score vector all-gathers
    per iteration (4MB at 1M tiles — ICI noise next to the slab streaming),
    and each shard's local grid indexes the replicated scores through its
    build-time base rows (scalar-prefetched into the kernel). The overflow
    COO splits by source shard at setup. Matches `propagate_windowed` up to
    f32 summation order (per-shard overflow scatters), and the XLA paths to
    the same tolerance. Layouts with a baked-in RCM relabeling (`order`)
    are handled here at the host boundary: inputs permute in, scores
    permute back out — callers keep original vertex ids.

    The layout-dependent setup (slab sharding, overflow split, uploads) is
    CACHED per (layout, mesh) and the compiled program per (mesh, shapes),
    so a KnnProp2 serving round pays only the per-round vector uploads +
    one dispatch."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    p = _prep_windowed_mesh(layout, mesh)
    vecs = [np.asarray(v) for v in (degree, prior, labels, is_labeled, start)]
    if p.order is not None:
        vecs = [v[p.order] for v in vecs]
    degree, prior, labels, is_labeled, start = vecs

    pad_n = p.Np - p.n
    fvec = lambda v, fill=0: jax.device_put(
        _pad_rows(v.astype(np.float32) if v.dtype != bool else v, pad_n,
                  fill=fill),
        p.sharding,
    )
    run = _windowed_mesh_run(
        mesh, p.NBs, p.Np, p.Ns, p.UROWS, p.EROWS, p.cap,
        float(reg_lambda), int(max_iter), float(epsilon), bool(interpret),
    )
    out = np.asarray(run(
        fvec(degree), fvec(prior), fvec(labels), fvec(is_labeled),
        fvec(start), p.cidx_d, p.wslab_d, p.base_d, *p.ovf_args,
    ))[: p.n]
    if p.inv is not None:
        out = out[p.inv]
    return out
