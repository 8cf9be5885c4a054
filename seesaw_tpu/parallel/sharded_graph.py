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
