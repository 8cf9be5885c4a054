"""CLIP fine-tuning infra: grouped optimizer freezing, contrastive training
reduces loss, successive-halving search."""
import numpy as np
import pytest
import jax

from seesaw_tpu.models.clip import ClipEmbedding
from seesaw_tpu.models.clip_finetune import (
    CLIPFineTuner,
    clip_contrastive_loss,
    sample_search_space,
    successive_halving_search,
)


@pytest.fixture(scope="module")
def data():
    emb = ClipEmbedding(variant="test")
    rng = np.random.default_rng(0)
    n = 32
    pixels = rng.normal(size=(n, emb.cfg.image_size, emb.cfg.image_size, 3)).astype(
        np.float32
    )
    texts = [f"object number {i}" for i in range(n)]
    tokens = np.stack([emb.tokenizer.encode(t) for t in texts])
    return emb, pixels, tokens


def test_contrastive_loss_identity():
    import jax.numpy as jnp

    feats = jnp.eye(4)
    loss_aligned = clip_contrastive_loss(feats, feats, jnp.asarray(2.0))
    loss_shuffled = clip_contrastive_loss(feats, feats[::-1], jnp.asarray(2.0))
    assert float(loss_aligned) < float(loss_shuffled)


def test_finetune_reduces_loss_and_freezes_groups(data):
    emb, pixels, tokens = data
    ft = CLIPFineTuner(
        emb,
        dict(opt_config={"text/projection": {"lr": 1e-2, "weight_decay": 0.0}}),
    )
    vision_before = np.asarray(
        jax.tree.leaves(ft.params["vision"])[0]
    ).copy()
    proj_before = np.asarray(ft.params["text"]["projection"]["kernel"]).copy()
    before = ft.eval_loss(pixels, tokens)
    ft.fit(pixels, tokens, epochs=4, batch_size=16)
    after = ft.eval_loss(pixels, tokens)
    assert after < before
    # frozen groups untouched; configured group moved
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(ft.params["vision"])[0]), vision_before
    )
    assert not np.allclose(
        np.asarray(ft.params["text"]["projection"]["kernel"]), proj_before
    )
    # converts back to a usable embedding
    emb2 = ft.to_embedding()
    v = emb2.from_string(string="object number 0")
    assert np.isfinite(v).all()


def test_sample_search_space():
    import random

    rng = random.Random(0)
    space = {"lr": {"loguniform": [1e-5, 1e-2]}, "bs": {"choose": [8, 16]},
             "nested": {"wd": {"choose": [0.0, 0.1]}}, "fixed": 7}
    s = sample_search_space(space, rng)
    assert 1e-5 <= s["lr"] <= 1e-2
    assert s["bs"] in (8, 16) and s["fixed"] == 7
    assert s["nested"]["wd"] in (0.0, 0.1)


def test_successive_halving():
    calls = []

    def eval_fn(cfg, budget):
        calls.append((cfg["x"], budget))
        return abs(cfg["x"] - 3.0) / budget  # larger budget -> better estimate

    best, loss, hist = successive_halving_search(
        {"x": {"choose": [0.0, 1.0, 2.9, 5.0]}},
        eval_fn, n_trials=4, rungs=[1, 2], eta=2, seed=1,
    )
    assert best["x"] == 2.9
    # later rungs evaluated fewer configs
    assert sum(1 for _, b in calls if b == 2) <= sum(1 for _, b in calls if b == 1)


def test_search_checkpoint_resume(tmp_path):
    """A restarted search skips completed (config, budget) evaluations."""
    from seesaw_tpu.models.clip_finetune import successive_halving_search

    calls = []

    def evaluate(cfg, budget):
        calls.append((cfg["lr"], budget))
        return abs(cfg["lr"] - 3e-4) * budget

    space = {"lr": {"choose": [1e-4, 3e-4, 1e-3]}}
    best1, loss1, hist1 = successive_halving_search(
        space, evaluate, n_trials=4, rungs=[1, 2], seed=0,
        checkpoint_dir=str(tmp_path),
    )
    n_first = len(calls)
    assert n_first > 0 and (tmp_path / "search_state.json").exists()

    best2, loss2, hist2 = successive_halving_search(
        space, evaluate, n_trials=4, rungs=[1, 2], seed=0,
        checkpoint_dir=str(tmp_path),
    )
    assert len(calls) == n_first  # everything replayed from the checkpoint
    assert best2 == best1 and loss2 == loss1


def test_to_embedding_preserves_custom_cfg(monkeypatch):
    # a tuner built on a custom-cfg embedding (no named variant) must hand
    # the cfg back out — the variant string alone reconstructs the DEFAULT
    # vit-b32 config and encode_image_batch then fails on param shapes.
    # Custom cfg here also engages the fused-attention gate (64-wide heads,
    # interpret mode), driving the Pallas fwd+bwd through CLIPFineTuner.
    import dataclasses

    import jax.numpy as jnp

    from seesaw_tpu.models.clip import VARIANTS

    monkeypatch.setenv("SEESAW_FUSED_ATTN_INTERPRET", "1")
    cfg = dataclasses.replace(
        VARIANTS["test"], vision_width=128, vision_heads=2, text_width=128,
        text_heads=2, embed_dim=32, dtype=jnp.bfloat16,
    )
    # dtype=None: the constructor must take cfg.dtype (bf16) as-is; the
    # f32 default would silently rebuild the model in float32
    emb = ClipEmbedding(cfg=cfg, dtype=None)
    ft = CLIPFineTuner(emb, {"opt_config": {"": {"lr": 1e-3}}, "warmup": 0})
    assert ft.model.cfg.fused_attention
    rng = np.random.default_rng(0)
    px = rng.normal(size=(8, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )
    toks = rng.integers(1, cfg.vocab_size, size=(8, cfg.context_length)).astype(
        np.int32
    )
    ft.fit(px, toks, epochs=4, batch_size=8)
    assert ft.losses[-1] < ft.losses[0]
    out = ft.to_embedding()
    assert out.cfg == emb.cfg
    feats = out.encode_image_batch(jnp.asarray(px))
    assert feats.shape == (8, cfg.embed_dim)
    assert bool(jnp.isfinite(feats).all())
