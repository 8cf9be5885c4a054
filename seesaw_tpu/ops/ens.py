"""Vectorized one-step-lookahead ENS utility as a blocked device program.

Re-derivation of the reference's `_top_sum` (`/root/reference/seesaw/
research/active_search/efficient_nonmyopic_search.py:94-169`): for every
candidate vertex i, the expected number of positives collected over the next
K steps if i is queried now,

    E[i] = p_i * (1 + Σ top-K scores | y_i=1) + (1-p_i) * (Σ top-K scores | y_i=0)

where conditioning on y_i updates only i's neighbors. Per candidate the
conditional top-K is assembled from the global top-(K+D) list (with i itself
and i's updated neighbors overwritten) plus i's updated neighbor scores —
exactly the reference's searchsorted-overwrite trick, expressed as masked
comparisons. The reference materializes N x (K+D) matrices in numpy
(a noted memory hazard); here rows are processed in fixed-size blocks under
`lax.map`, bounding memory at block_size x (K+2D).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


@functools.partial(jax.jit, static_argnames=("K", "block_size"))
def ens_expected_value(
    scores: jnp.ndarray,  # (N,) current scores, seen = -inf
    num: jnp.ndarray,  # (N,) numerators + gamma (seen = -inf)
    den1: jnp.ndarray,  # (N,) denominators + 1
    nbr: jnp.ndarray,  # (N, D) int32, -1 padding
    *,
    K: int,
    block_size: int = 1024,
) -> jnp.ndarray:
    N, D = nbr.shape
    kk = min(K + D, N)
    top_scores, top_ids = jax.lax.top_k(scores, kk)

    nblocks = -(-N // block_size)
    pad_n = nblocks * block_size
    row_ids = jnp.arange(pad_n, dtype=jnp.int32).reshape(nblocks, block_size)

    def per_block(rows):
        i = rows  # (B,)
        in_range = i < N
        i_safe = jnp.clip(i, 0, N - 1)
        n = nbr[i_safe]  # (B, D)
        n_pad = n < 0
        n_safe = jnp.clip(n, 0, N - 1)

        new_den = den1[n_safe] + 1.0
        s_upd1 = (num[n_safe] + 1.0) / new_den
        s_upd0 = num[n_safe] / new_den
        self_or_pad = n_pad | (n == i[:, None])
        s_upd1 = jnp.where(self_or_pad, NEG_INF, s_upd1)
        s_upd0 = jnp.where(self_or_pad, NEG_INF, s_upd0)

        # copy of the global top list with overwritten entries masked
        is_self = top_ids[None, :] == i[:, None]  # (B, kk)
        in_nbrs = (top_ids[None, :, None] == n[:, None, :]).any(axis=2)
        top_copy = jnp.where(
            is_self | in_nbrs, NEG_INF, jnp.broadcast_to(top_scores, (rows.shape[0], kk))
        )

        def cond_sum(s_upd):
            allscores = jnp.concatenate([top_copy, s_upd], axis=1)
            best, _ = jax.lax.top_k(allscores, min(K, allscores.shape[1]))
            # -inf slots (fewer than K finite candidates) contribute 0
            return jnp.where(jnp.isfinite(best), best, 0.0).sum(axis=1)

        e1 = cond_sum(s_upd1)
        e0 = cond_sum(s_upd0)
        p = scores[i_safe]
        ev = p * (1.0 + e1) + (1.0 - p) * e0
        return jnp.where(in_range & jnp.isfinite(p), ev, NEG_INF)

    out = jax.lax.map(per_block, row_ids)
    return out.reshape(-1)[:N]
