"""Pallas TPU kernel: fused multi-head self-attention for small-sequence
ViT shapes (CLIP ViT-B/32: seq 50, head_dim 64).

Why XLA loses here: the round-4 on-chip ablation (PARITY.md round-4 item
10) shows attention costing 58% of the ViT-B/32 forward for ~8% of its
FLOPs — the (B*H, 50, 64) batched QK^T/AV matmuls run ~30x under MXU peak
(64-deep contractions on a 128x128 systolic array) and the head
split/merge transposes re-lay out every tensor through HBM. XLA-level
reformulations (no-transpose einsums, merged QKV, bf16 logits, 12-head
block-masking) measured equal or worse.

This kernel changes the SHAPES instead of the schedule, exploiting
head_dim 64 = exactly half the 128-lane register width:

- Heads are processed in PAIRS: two 64-lane heads side by side occupy
  exactly 128 lanes, so Q/K/V are read directly from the natural
  (B, L, width) projection layout (head h lives in channels
  [64h, 64h+64) — the same convention as reshape(B, L, H, 64)), and the
  output is written back merged. NO split/merge transposes anywhere.
- K and V are block-diagonalized IN VMEM with two lane-masked copies and
  a sublane concat (no transposes): k2 rows 0:L = [K_A | 0], rows
  L:2L = [0 | K_B]. Contracting q (L, 128) against k2 (2L, 128) over
  lanes then yields both heads' logits in one (L, 2L) MXU op with a
  FULL 128-deep contraction; the AV dot contracts 2L=100 sublanes (vs
  50). The block-diagonal zeros double the nominal FLOPs, but attention
  is 8% of model FLOPs and the MXU pipeline is depth-limited at these
  sizes — filling the contraction dimension is what matters.
- Softmax is SEGMENTED across the two heads' column ranges with lane-iota
  masks (f32, numerically-stable max-subtraction per segment), matching
  the reference pipeline's fp32-softmax-accumulation semantics
  (models/clip.py MultiHeadAttention; reference CLIP does the same).

The kernel covers BOTH tower types: non-causal (vision) and, with
causal=True, the text tower's triu(-inf) mask rebuilt from iotas inside
the kernel (segment-aware). Requirements: head_dim == 64, an even number
of heads, L <= 384 (covers all three CLIP vision towers: ViT-B/32 seq 50,
ViT-B/16 seq 197, ViT-L/14 seq 257, and text seq 77; the block batch
auto-shrinks for the long-seq towers to stay inside VMEM).
`interpret=True` makes it testable on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # -inf-like that survives bf16/f32 masking arithmetic


def _pack_pair(x, in_a):
    """Block-diagonalize one head-pair: two lane-masked copies + sublane
    concat (no transposes). (L, 128) -> (2L, 128): rows 0:L = [X_A | 0],
    rows L:2L = [0 | X_B]."""
    zero = jnp.zeros((), x.dtype)
    return jnp.concatenate(
        [jnp.where(in_a, x, zero), jnp.where(in_a, zero, x)], axis=0
    )


def _pair_softmax(q, k2, *, scale: float, causal: bool, L: int):
    """Both heads' logits in ONE 128-deep-contraction MXU op, then the
    segmented fp32 softmax over the two heads' column ranges (stable:
    per-segment max subtraction). Shared verbatim by the forward kernel and
    the backward's recompute — any semantic change applies to both.
    Returns (p_f32 (L, 2L), seg_a (L, 2L) bool)."""
    s = jax.lax.dot_general(
        q, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (L, 2L): cols 0:L head A, L:2L head B

    col = jax.lax.broadcasted_iota(jnp.int32, (L, 2 * L), 1)
    seg_a = col < L
    if causal:
        # key position within its head's segment; query i attends to
        # keys <= i (the text tower's triu(-inf) mask, iota-built here
        # instead of shipping a dense mask tensor)
        row = jax.lax.broadcasted_iota(jnp.int32, (L, 2 * L), 0)
        keypos = jnp.where(seg_a, col, col - L)
        s = jnp.where(keypos <= row, s, NEG)
    m_a = jnp.max(jnp.where(seg_a, s, NEG), axis=1, keepdims=True)
    m_b = jnp.max(jnp.where(seg_a, NEG, s), axis=1, keepdims=True)
    e = jnp.exp(s - jnp.where(seg_a, m_a, m_b))
    d_a = jnp.sum(jnp.where(seg_a, e, 0.0), axis=1, keepdims=True)
    d_b = jnp.sum(jnp.where(seg_a, 0.0, e), axis=1, keepdims=True)
    return e / jnp.where(seg_a, d_a, d_b), seg_a


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 causal: bool = False):
    bb, L, _ = q_ref.shape  # (bb, L, 128): bb images, one head-pair

    for i in range(bb):  # unrolled: bb is a small static block
        q = q_ref[i]  # (L, 128) = two heads side by side
        k = k_ref[i]
        v = v_ref[i]

        lane = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 1)
        in_a = lane < 64
        k2 = _pack_pair(k, in_a)
        v2 = _pack_pair(v, in_a)
        p, _ = _pair_softmax(q, k2, scale=scale, causal=causal, L=L)
        p = p.astype(v.dtype)

        # AV with a 2L-deep contraction; output lands pre-merged
        o = jax.lax.dot_general(
            p, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, 128) = [O_A | O_B]
        o_ref[i] = o.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                     scale: float, causal: bool = False):
    """Pair-packed attention backward: recompute the segmented softmax in
    VMEM (flash-attention style — nothing but q/k/v/g is read from HBM),
    then all three input gradients from four MXU contractions:

      dp  = g · v2ᵀ        (L,128)×(128,2L) — full 128-deep contraction
      ds  = p ∘ (dp − rowsum_seg(p ∘ dp)) · scale   (softmax backward,
            segmented per head exactly like the forward softmax)
      dq  = ds · k2        (L,2L)×(2L,128) — 2L-deep contraction
      dk2 = dsᵀ · q,  dv2 = pᵀ · g   — (2L,L)×(L,128); head A's gradient
            lands in rows 0:L lanes 0:64 and head B's in rows L:2L lanes
            64:128 (the cross blocks are dsᵀA·qB-style garbage), so the
            same lane-iota select that builds k2 collapses (2L,128)→(L,128)
            pre-merged. No transposes anywhere — the "transposed" operands
            are expressed as dot_general contracting dimension choices.

    Causal rows need no special casing: masked logits give p = 0 there,
    which zeroes both ds and the dv2 contribution identically.
    """
    bb, L, _ = q_ref.shape

    for i in range(bb):  # unrolled: bb is a small static block
        q = q_ref[i]  # (L, 128) = two heads side by side
        k = k_ref[i]
        v = v_ref[i]
        g = g_ref[i]

        lane = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 1)
        in_a = lane < 64
        k2 = _pack_pair(k, in_a)
        v2 = _pack_pair(v, in_a)
        # recompute logits + segmented softmax: the SAME traced helper as
        # the forward kernel, so fwd/bwd cannot drift
        p, seg_a = _pair_softmax(q, k2, scale=scale, causal=causal, L=L)

        # --- softmax backward, segmented ---
        dp = jax.lax.dot_general(
            g, v2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, 2L) = dL/dp
        pdp = p * dp
        r_a = jnp.sum(jnp.where(seg_a, pdp, 0.0), axis=1, keepdims=True)
        r_b = jnp.sum(jnp.where(seg_a, 0.0, pdp), axis=1, keepdims=True)
        ds = (p * (dp - jnp.where(seg_a, r_a, r_b))) * scale  # d(raw logits)

        dsc = ds.astype(q.dtype)
        pc = p.astype(q.dtype)
        dq = jax.lax.dot_general(
            dsc, k2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, 128)
        dk2 = jax.lax.dot_general(
            dsc, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2L, 128): dsᵀ·q without a transpose
        dv2 = jax.lax.dot_general(
            pc, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2L, 128): pᵀ·g
        dk = jnp.where(in_a, dk2[:L], dk2[L:])
        dv = jnp.where(in_a, dv2[:L], dv2[L:])

        dq_ref[i] = dq.astype(dq_ref.dtype)
        dk_ref[i] = dk.astype(dk_ref.dtype)
        dv_ref[i] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(q, k, v, block_b, interpret, causal):
    return _pallas_forward(q, k, v, block_b, interpret, causal)


def _fused_fwd(q, k, v, block_b, interpret, causal):
    return _pallas_forward(q, k, v, block_b, interpret, causal), (q, k, v)


def _fused_bwd(block_b, interpret, causal, res, g):
    q, k, v = res
    return _pallas_backward(q, k, v, g, block_b, interpret, causal)


_fused.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "causal", "heads")
)
def fused_pair_attention(q, k, v, *, block_b: int = 16,
                         interpret: bool = False, causal: bool = False,
                         heads: int | None = None):
    """softmax(q kᵀ / sqrt(64)) v per 64-wide head, fused on TPU.

    q, k, v: (B, L, width) in the natural projection layout (no head
    split); width = heads * 64, heads even, L <= 384. Returns (B, L, width)
    merged output, ready for the out-projection. Differentiable: the VJP
    runs a pair-packed Pallas backward (`_attn_bwd_kernel`) that recomputes
    the segmented softmax in VMEM (flash-attention style) and yields
    dq/dk/dv via the same 128-lane collapse trick — fine-tuning
    (models/clip_finetune.py) trains through the kernel in both towers.
    causal=True applies the text tower's triu(-inf) mask (built from iotas
    inside the kernel, segment-aware). Pass `heads` to have the 64-wide
    precondition CHECKED: the (B, L, W) layout alone cannot distinguish
    H heads of head_dim 64 from H/2 heads of head_dim 128 — the kernel is
    only correct for head_dim 64 (and scales by 1/8 accordingly).

    block_b=16: measured 8286 (einsum) -> 11661/11932/11994 img/s at
    block_b 8/16/32 on the full ViT-B/32 B=1024 forward (v5e chip,
    scripts/probe_fused_attention.py) — 16 is within noise of 32 at less
    VMEM and compile.
    """
    if heads is not None and heads * 64 != q.shape[-1]:
        # ValueError (not assert): under python -O a stripped check would
        # let the kernel silently mis-scale and mis-pair wider heads
        raise ValueError(
            f"kernel requires head_dim 64: got heads={heads}, "
            f"width={q.shape[-1]}"
        )
    return _fused(q, k, v, block_b, interpret, causal)


def _pallas_forward(q, k, v, block_b, interpret, causal=False):
    B, L, W = q.shape
    if W % 128 != 0:
        raise ValueError("needs an even number of 64-wide heads")
    if L > 384:
        raise ValueError(
            "short-sequence kernel (ViT towers: seq 50/197/257)"
        )
    if L > 128:
        # VMEM per image ~ 24*L^2 (three f32 (L,2L) intermediates) +
        # ~1.8KB*L; cap the block so a double-buffered block stays well
        # inside the 32MB limit (ViT-B/16 L=197, ViT-L/14 L=257)
        block_b = min(block_b, 4)
    if B % block_b:  # pad batch to the block size; sliced off below
        pad = block_b - B % block_b
        zq = jnp.zeros((pad, L, W), q.dtype)
        q, k, v = (jnp.concatenate([t, zq], 0) for t in (q, k, v))
    Bp = q.shape[0]

    spec = pl.BlockSpec((block_b, L, 128), lambda i, j: (i, 0, j))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=1.0 / 8.0, causal=causal),
        grid=(Bp // block_b, W // 128),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Bp, L, W), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # keep MINIMAL: oversized vmem limits inflate Mosaic compile
            # ~16x at identical runtime (scripts/bisect_chain_compile.py)
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(q, k, v)
    return out[:B]


def _pallas_backward(q, k, v, g, block_b, interpret, causal=False):
    B, L, W = q.shape
    if L > 128:
        # the backward holds ~5 (L,2L) f32 intermediates + 4 (2L,128)
        # operands per image — roughly 2x the forward's footprint, so halve
        # the long-seq block cap (fine-tune shapes are L=50/77 anyway)
        block_b = min(block_b, 2)
    if B % block_b:
        pad = block_b - B % block_b
        zq = jnp.zeros((pad, L, W), q.dtype)
        q, k, v, g = (jnp.concatenate([t, zq], 0) for t in (q, k, v, g))
    Bp = q.shape[0]

    spec = pl.BlockSpec((block_b, L, 128), lambda i, j: (i, 0, j))
    shape = jax.ShapeDtypeStruct((Bp, L, W), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=1.0 / 8.0, causal=causal),
        grid=(Bp // block_b, W // 128),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(q, k, v, g)
    return dq[:B], dk[:B], dv[:B]
