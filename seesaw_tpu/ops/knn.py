"""Exact kNN construction as blocked device matmuls.

Replaces pynndescent (`/root/reference/seesaw/knn_graph.py:193-211`) with an
exact blocked scan: for each block of query rows, scores = block @ V^T on
the MXU, then an exact hierarchical top-k per row. Exactness supersedes
NN-descent's approximation; the O(N²D) cost is MXU-friendly and sharded
across chips for large N (each chip scans its row block against the full
matrix, or against column shards with a top-k merge).

Selection is the real cost, not the matmul (at 1M x 64-d the matmuls are
~3s of MXU; a flat `lax.top_k` over megarow widths streamed at ~20GB/s and
dominated the r4 build at 277s/1M). The hierarchical selection here is
EXACT: at most k segments can contain elements >= the k-th largest value
(elements >= lambda_k number exactly k up to ties), so the top-k segments
by segment-max are guaranteed to contain every top-k element; two levels of
8-wide segment-max shrink the top_k width 64x and the final candidate
gather is k*64 elements per row. The whole build runs as ONE jitted
program (fori over row blocks, scan over column chunks) so the tunnel's
per-dispatch latency is paid once.

Distance convention matches the reference: cosine distance = 1 - dot
(vectors are expected L2-normalized), clipped at 0.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SEG = 8  # segment width per hierarchy level (two levels -> 64x narrower)


def _hierarchical_topk(sims: jnp.ndarray, k: int):
    """Exact top-k over the last axis via two-level segment-max selection.

    sims: (B, W) with W % 64 == 0. Returns (values, indices) like
    jax.lax.top_k. Exactness: any element >= the k-th largest of its row
    lies in a level-2 segment whose max is >= that value, and at most k
    level-2 segments can have max >= lambda_k, so the top-k level-2
    segments contain all top-k elements.
    """
    B, W = sims.shape
    if W <= 4096 or W % (_SEG * _SEG) or W // (_SEG * _SEG) < k:
        return jax.lax.top_k(sims, k)
    n2 = W // (_SEG * _SEG)  # number of level-2 segments (width 64 each)
    seg2 = jnp.max(sims.reshape(B, n2, _SEG * _SEG), axis=2)  # (B, n2)
    # segments ranked (max desc, seg idx asc) — lax.top_k's positional tie
    # break IS segment-index order, which the tie proof needs: on value
    # ties the lowest-index copies live in the lowest-index segments
    _, seg_idx = jax.lax.top_k(seg2, k)  # (B, k) level-2 segment ids
    # gather the k winning 64-wide segments per row
    cand = jnp.take_along_axis(
        sims.reshape(B, n2, _SEG * _SEG), seg_idx[:, :, None], axis=1
    )  # (B, k, 64)
    cand = cand.reshape(B, k * _SEG * _SEG)
    cand_idx = (
        seg_idx[:, :, None] * (_SEG * _SEG)
        + jnp.arange(_SEG * _SEG)[None, None, :]
    ).reshape(B, k * _SEG * _SEG)
    # final selection with lax.top_k's EXACT tie protocol (value desc,
    # column id asc) — a positional top_k over the gathered candidates
    # would break ties by segment RANK instead, diverging from the
    # single-pass semantics the sharded build bit-matches
    neg_v, idx_sorted = jax.lax.sort(
        (-cand, cand_idx), num_keys=2, dimension=1
    )
    return -neg_v[:, :k], idx_sorted[:, :k]


@functools.partial(
    jax.jit, static_argnames=("k", "block", "chunk", "g_blocks", "n_valid")
)
def _knn_block_group(V: jnp.ndarray, row_start, *, k: int, block: int,
                     chunk: int, g_blocks: int, n_valid: int):
    """(g_blocks*block, k) ids + sims for one group of row blocks.

    One BOUNDED dispatch: the whole-matrix single program tripped this
    environment's device watchdog (programs >~60s are killed — see
    .claude/skills/verify 'Round-4 additions'); the host loops over groups
    (same compiled program, row_start as a runtime scalar) with a 2-deep
    download pipeline so dispatch i+1 overlaps i's fetch."""
    N, D = V.shape
    n_chunks = N // chunk
    neg = jnp.float32(-jnp.inf)

    def do_block(g, outs):
        ids_out, sims_out = outs
        r0 = row_start + g * block
        rows = jax.lax.dynamic_slice(V, (r0, 0), (block, D))
        row_ids = r0 + jnp.arange(block)[:, None]

        def do_chunk(carry, c):
            best_s, best_i = carry
            cols = jax.lax.dynamic_slice(V, (c * chunk, 0), (chunk, D))
            sims = jnp.dot(
                rows, cols.T, preferred_element_type=jnp.float32
            )
            col_ids = c * chunk + jnp.arange(chunk)[None, :]
            # mask self-edges and the zero-padded tail columns
            sims = jnp.where(
                (row_ids == col_ids) | (col_ids >= n_valid), neg, sims
            )
            s, i = _hierarchical_topk(sims, k)
            i = i + c * chunk
            cat_s = jnp.concatenate([best_s, s], axis=1)
            cat_i = jnp.concatenate([best_i, i], axis=1)
            # merge under (value desc, global id asc) — bit-identical tie
            # handling to a single flat lax.top_k over all columns
            neg_m, i2s = jax.lax.sort(
                (-cat_s, cat_i), num_keys=2, dimension=1
            )
            return (-neg_m[:, :k], i2s[:, :k]), None

        init = (jnp.full((block, k), neg, jnp.float32),
                jnp.zeros((block, k), jnp.int32))
        (best_s, best_i), _ = jax.lax.scan(
            do_chunk, init, jnp.arange(n_chunks)
        )
        ids_out = jax.lax.dynamic_update_slice(
            ids_out, best_i.astype(jnp.int32), (g * block, 0)
        )
        sims_out = jax.lax.dynamic_update_slice(
            sims_out, best_s, (g * block, 0)
        )
        return (ids_out, sims_out)

    outs = (jnp.zeros((g_blocks * block, k), jnp.int32),
            jnp.zeros((g_blocks * block, k), jnp.float32))
    ids, sims = jax.lax.fori_loop(0, g_blocks, do_block, outs)
    return ids, sims


# Column-chunk sizing drives the gather cost: the winning-segment gather
# issues block*k slices per chunk regardless of chunk width, so total
# slices = k * N^2 / chunk — wider chunks amortize the per-slice latency
# (measured ~53ns/slice; at 32k-wide chunks the gather was 7 of the 12
# ms/tile). Large problems use 256k-wide chunks (sims buffer 1GB f32);
# small ones fall back to 32k so padding waste and CPU-test buffers stay
# bounded.
_CHUNK_LG = 1 << 18
_BLOCK_LG = 1024
_CHUNK_SM = 1 << 15
_BLOCK_SM = 4096


def exact_knn(
    vectors: np.ndarray, n_neighbors: int, block_size: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(N, k) neighbor ids + cosine distances, ascending by distance.

    k is capped at N-1. One fused device program per bounded row-group;
    V stays device-resident in f32 (MXU default precision). Results are
    bit-identical to a flat lax.top_k over the full similarity row — the
    hierarchical selection and cross-chunk merges both break value ties by
    ascending column id — and to the sharded systolic build
    (tests/test_sharded_stress.py::test_sharded_knn_12k_bit_equal).
    """
    N, D = vectors.shape
    k = min(n_neighbors, N - 1)

    if N <= 8192:  # small problems: the simple one-dispatch path, f32
        V = jnp.asarray(vectors)
        sims = jnp.dot(V, V.T, preferred_element_type=jnp.float32)
        sims = jnp.where(jnp.eye(N, dtype=bool), -jnp.inf, sims)
        top_s, top_i = jax.lax.top_k(sims, k)
        dist = jnp.clip(1.0 - top_s, 0.0)
        return (np.asarray(top_i, dtype=np.int32),
                np.asarray(dist, dtype=np.float32))

    if N >= _CHUNK_LG:
        block, chunk = _BLOCK_LG, _CHUNK_LG
    else:
        block, chunk = _BLOCK_SM, _CHUNK_SM
    if block_size is not None:
        block = block_size
    N_pad = _round_up(N, max(block, chunk))
    # f32 storage with the MXU's default precision (bf16-truncated inputs,
    # f32 accumulation — the SAME arithmetic the f32 sharded systolic build
    # and the old flat scan perform, so the three stay bit-equal; explicit
    # bf16 storage ROUNDS instead and swaps near-tie neighbors)
    V = jnp.zeros((N_pad, D), dtype=jnp.float32)
    V = jax.lax.dynamic_update_slice(
        V, jnp.asarray(vectors, dtype=jnp.float32), (0, 0)
    )
    # bounded dispatches: ~target_pairs row*col work each (device seconds,
    # far under the watchdog), host loop + 2-deep download pipeline
    target_pairs = 1 << 35
    g_blocks = max(1, min(N_pad // block, target_pairs // (N_pad * block)))
    rows_per = g_blocks * block

    ids_np = np.empty((N, k), dtype=np.int32)
    sims_np = np.empty((N, k), dtype=np.float32)
    pending = None  # (ids_dev, sims_dev, lo)

    def materialize():
        nonlocal pending
        if pending is not None:
            idd, simd, plo = pending
            phi = min(plo + rows_per, N)
            ids_np[plo:phi] = np.asarray(idd)[: phi - plo]
            sims_np[plo:phi] = np.asarray(simd)[: phi - plo]
            pending = None

    for lo in range(0, N, rows_per):
        idd, simd = _knn_block_group(
            V, jnp.int32(lo), k=k, block=block, chunk=chunk,
            g_blocks=g_blocks, n_valid=N,
        )
        materialize()
        pending = (idd, simd, lo)
    materialize()
    dist_np = np.clip(1.0 - sims_np, 0.0, None)
    return ids_np, dist_np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
