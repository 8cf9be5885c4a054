"""Pallas TPU kernel: fused score + frame-max over the padded layout.

One pass over the HBM-resident embedding matrix per query: each grid step
loads a (BF*T, D) block into VMEM, runs the matvec on the MXU (bf16 or
int8->int32), reshapes to (BF, T), masks padding/exclusion and writes the
per-frame maxima — the shortlist stage of `ops.frame_scoring.query_program`
without materializing the (N,) score vector in HBM (SURVEY.md 'TPU kernel
target #1'). Top-k over the (F,) maxima and the shortlist augmentation stay
in XLA (tiny arrays).

The kernel is numerically identical to the XLA formulation; `interpret=True`
makes it testable on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _vmem_limit_mb(BF: int, T: int, D: int, itemsize: int) -> int:
    """Smallest VMEM budget that fits the double-buffered (BF*T, D) block
    (2x block + small operands, rounded up). Keep this MINIMAL: on the v5e
    toolchain the Mosaic/XLA compile time of a program embedding this kernel
    scales brutally with the declared limit — 64MB took 352.6s to compile
    the 32-query bench chain where 24MB takes 22.0s, at IDENTICAL runtime
    (scripts/bisect_chain_compile.py, round-4 sweep; this was VERDICT r3's
    ~8x bench-stage regression). SEESAW_VMEM_MB overrides for bisects."""
    import os

    override = os.environ.get("SEESAW_VMEM_MB")
    if override:
        return int(override)
    block_mb = -(-(BF * T * D * itemsize) // (1024 * 1024))
    return max(24, 3 * block_mb)


def _kernel(q_ref, v_ref, valid_ref, excluded_ref, *rest, tile_bound: int):
    *scale_refs, out_ref = rest
    V = v_ref[...]  # (BF*T, D)
    q = q_ref[...]  # (D, 1) f32
    if V.dtype == jnp.int8:
        scores = jax.lax.dot_general(
            V, q.astype(jnp.int8),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        if scale_refs:  # per-row dequantization scales (BF*T, 1)
            scores = scores * scale_refs[0][...]
    else:
        scores = jnp.dot(
            V, q.astype(V.dtype), preferred_element_type=jnp.float32
        )
    BF = valid_ref.shape[0]
    s = scores.reshape(BF, tile_bound)
    s = jnp.where(valid_ref[...], s, NEG_INF)
    fmax = jnp.max(s, axis=1)
    out_ref[...] = jnp.where(excluded_ref[...], NEG_INF, fmax)


@functools.partial(
    jax.jit, static_argnames=("tile_bound", "block_frames", "interpret")
)
def fused_frame_max(
    vectors: jnp.ndarray,  # (F*T, D) frame-major padded, bf16/f32/int8
    valid: jnp.ndarray,  # (F, T) bool
    excluded: jnp.ndarray,  # (F,) bool
    qvec: jnp.ndarray,  # (D,) f32
    row_scale: jnp.ndarray | None = None,  # (F*T,) int8 per-row dequant scales
    *,
    tile_bound: int,
    block_frames: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    F, T = valid.shape
    assert T == tile_bound
    D = vectors.shape[1]
    # Mosaic tiling: 1-D operands carry XLA's T(1024) layout, so frame-axis
    # blocks must be multiples of 1024 (index build pads F accordingly).
    BF = max(1024, (block_frames // 1024) * 1024)
    grid = -(-F // BF)
    Fp = grid * BF
    assert vectors.shape[0] == Fp * T, (
        f"vectors must be padded to {Fp} frames x {T} tiles "
        f"(= {Fp * T} rows, got {vectors.shape[0]}); pad at index build"
    )
    if Fp != F:
        valid = jnp.pad(valid, ((0, Fp - F), (0, 0)))
        excluded = jnp.pad(excluded, ((0, Fp - F),), constant_values=True)

    assert vectors.dtype == jnp.int8 or row_scale is None, (
        f"row_scale is only meaningful for int8 vectors (got {vectors.dtype})"
    )
    # int8 query quantization (same scheme as ops.frame_scoring.scoring_matvec)
    if vectors.dtype == jnp.int8:
        qmax = jnp.max(jnp.abs(qvec)) + 1e-12
        q_in = jnp.clip(jnp.round(qvec / qmax * 127.0), -127, 127).astype(jnp.float32)
        scale = qmax / 127.0
    else:
        q_in = qvec
        scale = None

    in_specs = [
        pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BF * T, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BF, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BF,), lambda i: (i,), memory_space=pltpu.VMEM),
    ]
    operands = [q_in.reshape(D, 1), vectors, valid, excluded]
    if vectors.dtype == jnp.int8 and row_scale is not None:
        assert row_scale.shape[0] == vectors.shape[0]
        in_specs.append(
            pl.BlockSpec((BF * T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(row_scale.reshape(-1, 1))

    out = pl.pallas_call(
        functools.partial(_kernel, tile_bound=T),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BF,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Fp,), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # double-buffered (BF*T, D) blocks exceed the default 16MB scoped
            # budget; size the limit to the block sweep (v5e has 128MB VMEM).
            # SEESAW_VMEM_MB overrides for compile-time bisects (the r3 bench
            # chain-compile regression was suspected here; see
            # scripts/bisect_chain_compile.py findings in PARITY.md).
            vmem_limit_bytes=_vmem_limit_mb(BF, T, D, vectors.dtype.itemsize)
            * 1024 * 1024,
        ),
    )(*operands)

    out = out[:F]
    if scale is not None:
        # -inf * scale stays -inf; finite maxima rescale to score units
        out = jnp.where(jnp.isfinite(out), out * scale, out)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "shortlist_size", "topk", "tile_bound", "block_frames",
        "aug_larger", "aug_weight", "agg_method", "max_zoom", "interpret",
    ),
)
def query_program_fused(
    vectors: jnp.ndarray,  # (Fp*T, D) padded to block_frames granularity
    valid: jnp.ndarray,  # (F, T)
    boxes: jnp.ndarray,  # (F*T, 4) (unpadded tail ok — gathered via fids < F)
    zoom: jnp.ndarray,  # (F*T,)
    qvec: jnp.ndarray,
    excluded: jnp.ndarray,  # (F,)
    row_scale: jnp.ndarray | None = None,  # (Fp*T,) int8 per-row scales
    *,
    shortlist_size: int,
    topk: int,
    tile_bound: int,
    block_frames: int = 1024,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
    interpret: bool = False,
):
    """Full query with the Pallas shortlist stage: the (N,) score vector is
    never materialized in HBM — per-tile scores are recomputed only for the
    shortlisted frames (B*T rows, frame_scoring.rank_from_frame_max)."""
    from .frame_scoring import rank_from_frame_max

    fmax = fused_frame_max(
        vectors, valid, excluded, qvec, row_scale,
        tile_bound=tile_bound, block_frames=block_frames, interpret=interpret,
    )
    return rank_from_frame_max(
        vectors, valid, boxes, zoom, qvec, fmax, row_scale, None,
        shortlist_size=shortlist_size, topk=topk, tile_bound=tile_bound,
        aug_larger=aug_larger, aug_weight=aug_weight,
        agg_method=agg_method, max_zoom=max_zoom,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "shortlist_size", "topk", "tile_bound", "block_frames",
        "aug_larger", "aug_weight", "agg_method", "max_zoom", "interpret",
    ),
)
def query_program_fused_incr(
    vectors: jnp.ndarray,
    valid: jnp.ndarray,
    boxes: jnp.ndarray,
    zoom: jnp.ndarray,
    qvec: jnp.ndarray,
    excluded: jnp.ndarray,  # (F,) bool device-persistent mask
    new_excluded_ids: jnp.ndarray,  # (M,) int32 frame ordinals, -1 padded
    row_scale: jnp.ndarray | None = None,
    *,
    shortlist_size: int,
    topk: int,
    tile_bound: int,
    block_frames: int = 1024,
    aug_larger: str = "all",
    aug_weight: str = "level_max",
    agg_method: str = "avg_score",
    max_zoom: int = 8,
    interpret: bool = False,
):
    """query_program_fused with the incremental exclusion update fused into
    the same dispatch (serving path: the mask never leaves the device);
    returns (QueryResult, updated mask)."""
    from .frame_scoring import apply_new_exclusions

    excluded = apply_new_exclusions(excluded, new_excluded_ids)
    res = query_program_fused(
        vectors, valid, boxes, zoom, qvec, excluded, row_scale,
        shortlist_size=shortlist_size, topk=topk, tile_bound=tile_bound,
        block_frames=block_frames, aug_larger=aug_larger,
        aug_weight=aug_weight, agg_method=agg_method, max_zoom=max_zoom,
        interpret=interpret,
    )
    return res, excluded
