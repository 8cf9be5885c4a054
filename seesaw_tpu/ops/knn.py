"""Exact kNN construction as blocked device matmuls.

Replaces pynndescent (`/root/reference/seesaw/knn_graph.py:193-211`) with an
exact blocked scan: for each block of query rows, scores = block @ V^T on
the MXU, then top-(k+1) per row. Exactness supersedes NN-descent's
approximation; the O(N²D) cost is MXU-friendly and sharded across chips for
large N (each chip scans its row block against the full matrix, or against
column shards with a top-k merge).

Distance convention matches the reference: cosine distance = 1 - dot
(vectors are expected L2-normalized), clipped at 0.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _block_topk(block: jnp.ndarray, V: jnp.ndarray, row_offset: jnp.ndarray, *, k: int):
    """Top-k neighbors (excluding self) for a block of rows."""
    sims = (block @ V.T).astype(jnp.float32)  # (B, N)
    B, N = sims.shape
    rows = row_offset + jnp.arange(B)[:, None]
    cols = jnp.arange(N)[None, :]
    sims = jnp.where(rows == cols, -jnp.inf, sims)  # mask self
    top_sims, top_idx = jax.lax.top_k(sims, k)
    dist = jnp.clip(1.0 - top_sims, 0.0)
    return top_idx.astype(jnp.int32), dist


def exact_knn(
    vectors: np.ndarray, n_neighbors: int, block_size: int = 8192
) -> tuple[np.ndarray, np.ndarray]:
    """(N, k) neighbor ids + cosine distances, ascending by distance.

    k is capped at N-1. Blocked over query rows; V stays device-resident.
    """
    N = vectors.shape[0]
    k = min(n_neighbors, N - 1)
    V = jnp.asarray(vectors)

    ids_out = np.empty((N, k), dtype=np.int32)
    dist_out = np.empty((N, k), dtype=np.float32)
    # pad N to a multiple of block for a single compiled shape
    for lo in range(0, N, block_size):
        hi = min(lo + block_size, N)
        block = np.zeros((block_size, vectors.shape[1]), dtype=vectors.dtype)
        block[: hi - lo] = vectors[lo:hi]
        idx, dist = _block_topk(
            jnp.asarray(block), V, jnp.asarray(lo, dtype=jnp.int32), k=k
        )
        ids_out[lo:hi] = np.asarray(idx)[: hi - lo]
        dist_out[lo:hi] = np.asarray(dist)[: hi - lo]
    return ids_out, dist_out
