"""Fused pair-packed attention kernel vs the reference einsum formulation
(models/clip.py MultiHeadAttention inner ops, reference CLIP semantics:
fp32 softmax accumulation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seesaw_tpu.ops.pallas_attention import fused_pair_attention


def einsum_attention(q, k, v, heads: int, causal: bool = False):
    """The XLA formulation the kernel replaces (clip.py:90-101)."""
    B, L, W = q.shape
    hd = W // heads

    def split(t):
        return t.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    logits = logits / np.sqrt(hd)
    if causal:
        logits = logits + jnp.triu(
            jnp.full((L, L), -jnp.inf, dtype=jnp.float32), k=1
        )
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, L, W)


@pytest.mark.parametrize("B,L,heads", [(3, 77, 8), (2, 12, 2), (1, 197, 2)])
def test_causal_matches_einsum(B, L, heads):
    # the text tower's triu(-inf) mask, rebuilt from iotas in-kernel
    W = heads * 64
    rng = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, L, W)).astype(np.float32))
        for _ in range(3)
    )
    ref = einsum_attention(q, k, v, heads, causal=True)
    got = fused_pair_attention(q, k, v, block_b=2, interpret=True, causal=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6, rtol=2e-6
    )


def test_causal_gradients_match_einsum():
    rng = np.random.default_rng(8)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 12, 128)).astype(np.float32))
        for _ in range(3)
    )
    cot = jnp.asarray(rng.normal(size=(2, 12, 128)).astype(np.float32))
    g_ref = jax.grad(
        lambda *a: jnp.sum(einsum_attention(*a, 2, causal=True) * cot),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_fused = jax.grad(
        lambda *a: jnp.sum(
            fused_pair_attention(*a, block_b=2, interpret=True, causal=True)
            * cot
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5
        )


def test_text_tower_fused_wiring(monkeypatch):
    # the causal fused path through the full text tower vs the einsum tower
    import dataclasses

    from seesaw_tpu.models.clip import ClipConfig, TextTower, init_params

    monkeypatch.setenv("SEESAW_FUSED_ATTN_INTERPRET", "1")
    base = ClipConfig(
        embed_dim=32, image_size=32, patch_size=16, vision_width=48,
        vision_layers=1, vision_heads=4, vocab_size=99, context_length=16,
        text_width=128, text_layers=2, text_heads=2,
    )
    cfgs = [dataclasses.replace(base, fused_attention=f) for f in (False, True)]
    params = init_params(cfgs[0], seed=0)["text"]
    rng = np.random.default_rng(9)
    toks = jnp.asarray(rng.integers(0, 99, size=(3, 16)).astype(np.int32))
    ref, got = (
        TextTower(c).apply({"params": params}, toks) for c in cfgs
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize(
    "B,L,heads",
    [(3, 50, 12), (2, 77, 8), (5, 64, 2), (2, 197, 2), (1, 257, 2)],
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matches_einsum(B, L, heads, dtype):
    W = heads * 64
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, L, W)).astype(np.float32), dtype)
        for _ in range(3)
    )
    ref = einsum_attention(q, k, v, heads)
    got = fused_pair_attention(q, k, v, block_b=2, interpret=True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=tol, rtol=tol,
    )


def test_batch_padding():
    # B not divisible by block_b exercises the pad+slice path
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.normal(size=(5, 50, 128)).astype(np.float32))
        for _ in range(3)
    )
    ref = einsum_attention(q, k, v, 2)
    got = fused_pair_attention(q, k, v, block_b=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6, rtol=2e-6
    )


def test_vision_tower_fused_wiring(monkeypatch):
    # ClipConfig.fused_attention must thread through ResidualBlock into the
    # kernel (interpret mode on CPU) and match the einsum tower end-to-end
    import dataclasses

    from seesaw_tpu.models.clip import ClipConfig, VisionTower, init_params

    monkeypatch.setenv("SEESAW_FUSED_ATTN_INTERPRET", "1")
    base = ClipConfig(
        embed_dim=32, image_size=32, patch_size=16, vision_width=128,
        vision_layers=2, vision_heads=2, vocab_size=99, context_length=12,
        text_width=32, text_layers=1, text_heads=4,
    )
    cfgs = [dataclasses.replace(base, fused_attention=f) for f in (False, True)]
    params = init_params(cfgs[0], seed=0)["vision"]
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    ref, got = (
        VisionTower(c).apply({"params": params}, px) for c in cfgs
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_gradients_match_einsum():
    # fine-tuning differentiates through the vision tower: the custom VJP
    # (backward-by-einsum) must match grads of the unfused formulation
    rng = np.random.default_rng(4)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 50, 128)).astype(np.float32))
        for _ in range(3)
    )
    cot = jnp.asarray(rng.normal(size=(2, 50, 128)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(einsum_attention(q, k, v, 2) * cot)

    def loss_fused(q, k, v):
        return jnp.sum(
            fused_pair_attention(q, k, v, block_b=2, interpret=True) * cot
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5
        )


def test_long_seq_default_block():
    # L>128 must auto-shrink the block batch (VMEM guard) — exercised here
    # at the DEFAULT block_b the model path uses, including the B->pad path
    rng = np.random.default_rng(11)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 197, 128)).astype(np.float32))
        for _ in range(3)
    )
    ref = einsum_attention(q, k, v, 2)
    got = fused_pair_attention(q, k, v, interpret=True)  # default block_b=16
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6, rtol=2e-6
    )


def test_heads_precondition_checked():
    q = jnp.zeros((1, 8, 256), jnp.float32)
    with pytest.raises(ValueError, match="head_dim 64"):
        fused_pair_attention(q, q, q, heads=2, interpret=True)


def test_tower_gradients_fused_vs_einsum(monkeypatch):
    # guards the Pallas backward kernel (which recomputes the softmax
    # semantics) against drift from clip.py's own einsum formulation:
    # grads of the full vision tower must match between fused and unfused
    # configs
    import dataclasses

    from seesaw_tpu.models.clip import ClipConfig, VisionTower, init_params

    monkeypatch.setenv("SEESAW_FUSED_ATTN_INTERPRET", "1")
    base = ClipConfig(
        embed_dim=32, image_size=32, patch_size=16, vision_width=128,
        vision_layers=2, vision_heads=2, vocab_size=99, context_length=12,
        text_width=32, text_layers=1, text_heads=4,
    )
    cfgs = [dataclasses.replace(base, fused_attention=f) for f in (False, True)]
    params = init_params(cfgs[0], seed=0)["vision"]
    rng = np.random.default_rng(12)
    px = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

    def loss(p, cfg):
        return jnp.sum(VisionTower(cfg).apply({"params": p}, px) ** 2)

    g_ref, g_fused = (
        jax.grad(lambda p: loss(p, c))(params) for c in cfgs
    )
    flat_ref = jax.tree.leaves(g_ref)
    flat_fused = jax.tree.leaves(g_fused)
    for a, b in zip(flat_fused, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )


@pytest.mark.parametrize("causal", [False, True])
def test_backward_bf16(causal):
    # the Pallas backward in the training dtype: compare against einsum
    # grads computed in bf16 too (same forward dtypes), f32 reference
    # only sets the tolerance scale
    rng = np.random.default_rng(14)
    qf, kf, vf, cotf = (
        rng.normal(size=(3, 50, 128)).astype(np.float32) for _ in range(4)
    )
    q, k, v, cot = (
        jnp.asarray(t, jnp.bfloat16) for t in (qf, kf, vf, cotf)
    )
    g_ref = jax.grad(
        lambda *a: jnp.sum(
            einsum_attention(*a, 2, causal=causal).astype(jnp.float32)
            * cot.astype(jnp.float32)
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_fused = jax.grad(
        lambda *a: jnp.sum(
            fused_pair_attention(
                *a, block_b=2, interpret=True, causal=causal
            ).astype(jnp.float32)
            * cot.astype(jnp.float32)
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_fused, g_ref):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=0.15, rtol=0.1,
        )


def test_backward_long_seq_padding():
    # L>128 exercises the backward's own block cap; B=3 with the default
    # block exercises its pad+slice path (pad rows must not pollute grads)
    rng = np.random.default_rng(15)
    q, k, v, cot = (
        jnp.asarray(rng.normal(size=(3, 197, 128)).astype(np.float32))
        for _ in range(4)
    )
    g_ref = jax.grad(
        lambda *a: jnp.sum(einsum_attention(*a, 2) * cot), argnums=(0, 1, 2)
    )(q, k, v)
    g_fused = jax.grad(
        lambda *a: jnp.sum(fused_pair_attention(*a, interpret=True) * cot),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5
        )


def test_extreme_logits_stable():
    # large-magnitude q/k: the segmented-softmax max subtraction must keep
    # exp() in range exactly like jax.nn.softmax does
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 50, 128)).astype(np.float32) * 40)
    k = jnp.asarray(rng.normal(size=(2, 50, 128)).astype(np.float32) * 40)
    v = jnp.asarray(rng.normal(size=(2, 50, 128)).astype(np.float32))
    ref = einsum_attention(q, k, v, 2)
    got = fused_pair_attention(q, k, v, block_b=2, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    # saturated softmax amplifies f32 ULP differences in the (huge) logits;
    # the property under test is stability, not bitwise agreement
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3
    )
