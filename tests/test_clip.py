"""Torch-parity golden tests for the flax CLIP: random-init HF CLIPModel on
CPU, weights converted, outputs compared. No network, no pretrained files."""
import numpy as np
import pytest

import jax.numpy as jnp

from seesaw_tpu.models.clip import (
    ClipConfig,
    ClipEmbedding,
    ClipModel,
    VARIANTS,
    convert_hf_state_dict,
    init_params,
    save_params_npz,
    load_checkpoint,
)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig as HFConfig
    from transformers import CLIPModel as HFModel

    cfg = ClipConfig(
        embed_dim=32,
        image_size=32,
        patch_size=16,
        vision_width=48,
        vision_layers=2,
        vision_heads=4,
        vocab_size=99,
        context_length=12,
        text_width=32,
        text_layers=2,
        text_heads=4,
    )
    hf_cfg = HFConfig(
        projection_dim=cfg.embed_dim,
        text_config=dict(
            hidden_size=cfg.text_width,
            intermediate_size=cfg.text_width * 4,
            num_hidden_layers=cfg.text_layers,
            num_attention_heads=cfg.text_heads,
            vocab_size=cfg.vocab_size,
            max_position_embeddings=cfg.context_length,
            hidden_act="quick_gelu",
            bos_token_id=cfg.vocab_size - 2,
            eos_token_id=cfg.vocab_size - 1,
        ),
        vision_config=dict(
            hidden_size=cfg.vision_width,
            intermediate_size=cfg.vision_width * 4,
            num_hidden_layers=cfg.vision_layers,
            num_attention_heads=cfg.vision_heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            hidden_act="quick_gelu",
        ),
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_state_dict(sd, cfg)
    return hf, cfg, params


def test_image_tower_matches_hf(hf_pair):
    import torch

    hf, cfg, params = hf_pair
    rng = np.random.default_rng(0)
    px = rng.normal(size=(3, 3, cfg.image_size, cfg.image_size)).astype(np.float32)

    with torch.no_grad():
        want = hf.get_image_features(pixel_values=torch.from_numpy(px)).numpy()

    model = ClipModel(cfg)
    got = model.apply(
        {"params": params},
        jnp.asarray(px.transpose(0, 2, 3, 1)),  # NCHW -> NHWC
        method=ClipModel.encode_image,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_text_tower_matches_hf(hf_pair):
    import torch

    hf, cfg, params = hf_pair
    rng = np.random.default_rng(1)
    # HF pools at the eos_token_id position; emulate the argmax convention by
    # making the largest id the terminator, like CLIP's tokenizer does.
    eos = hf.config.text_config.eos_token_id
    L = cfg.context_length
    toks = rng.integers(0, min(eos, cfg.vocab_size - 1), size=(4, L)).astype(np.int64)
    lengths = rng.integers(3, L, size=4)
    for i, l in enumerate(lengths):
        toks[i, l] = eos
        toks[i, l + 1:] = 0

    with torch.no_grad():
        want = hf.get_text_features(input_ids=torch.from_numpy(toks)).numpy()

    model = ClipModel(cfg)
    got = model.apply(
        {"params": params},
        jnp.asarray(toks.astype(np.int32)),
        jnp.asarray(lengths.astype(np.int32)),
        method=ClipModel.encode_text,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_embedding_wrapper_roundtrip(tmp_path):
    emb = ClipEmbedding(variant="test")
    v1 = emb.from_string(string="a dog")
    v2 = emb.from_string(string="a dog")
    np.testing.assert_allclose(v1, v2)
    assert v1.shape == (emb.dim,)
    assert np.linalg.norm(v1) == pytest.approx(1.0, rel=1e-5)

    img = (np.random.default_rng(0).random((40, 50, 3)) * 255).astype(np.uint8)
    iv = emb.from_image(image=img)
    assert iv.shape == (1, emb.dim)
    assert np.linalg.norm(iv) == pytest.approx(1.0, rel=1e-5)

    # save/load params roundtrip
    p = tmp_path / "clip_test.npz"
    save_params_npz(emb.params, str(p))
    params2 = load_checkpoint(str(p), emb.cfg)
    emb2 = ClipEmbedding(variant="test", params=params2)
    np.testing.assert_allclose(
        emb2.from_string(string="a dog"), v1, atol=1e-6
    )


def test_variants_table():
    b32 = VARIANTS["vit-b32"]
    assert b32.grid == 7 and b32.embed_dim == 512
    l14 = VARIANTS["vit-l14"]
    assert l14.embed_dim == 768
