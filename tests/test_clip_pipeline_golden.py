"""Golden end-to-end real-CLIP pipeline test.

Builds an actual HF CLIP checkpoint directory (CLIPModel.save_pretrained +
real CLIPTokenizer files on a synthetic deterministic vocab), converts it
with scripts/convert_clip_checkpoint.py, loads the artifact through the
model registry, and asserts that raw strings and raw images produce the
same embeddings as the HF torch pipeline (tokenizer + preprocessing +
towers as ONE path). This is the documented 'images -> real-CLIP index ->
session' route needing only a checkpoint dir (reference
`embeddings.py:405-466`).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from test_tokenizer_parity import CORPUS  # noqa: E402


@pytest.fixture(scope="module")
def hf_checkpoint_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig, CLIPModel, CLIPTokenizer

    from seesaw_tpu.models.bpe_train import write_artifacts

    d = tmp_path_factory.mktemp("hf_ckpt")
    vocab_path, merges_path = write_artifacts(d, CORPUS, n_merges=200)
    tok = CLIPTokenizer(str(vocab_path), str(merges_path), model_max_length=16)
    vocab_size = tok.vocab_size

    cfg = CLIPConfig(
        projection_dim=32,
        text_config=dict(
            hidden_size=32, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, vocab_size=vocab_size,
            max_position_embeddings=16, hidden_act="quick_gelu",
            bos_token_id=tok.bos_token_id, eos_token_id=tok.eos_token_id,
        ),
        vision_config=dict(
            hidden_size=48, intermediate_size=192, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=16,
            hidden_act="quick_gelu",
        ),
    )
    torch.manual_seed(0)
    hf = CLIPModel(cfg).eval()
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, tok


@pytest.fixture(scope="module")
def artifact(hf_checkpoint_dir, tmp_path_factory):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from convert_clip_checkpoint import convert

    d, hf, tok = hf_checkpoint_dir
    out = tmp_path_factory.mktemp("artifact")
    convert(str(d), str(out), variant="test")
    return out


def test_registry_loads_artifact(artifact):
    from seesaw_tpu.models.registry import load_embedding
    from seesaw_tpu.models.tokenizer import BpeTokenizer

    emb = load_embedding(f"clip-test:{artifact}")
    assert isinstance(emb.tokenizer, BpeTokenizer)
    assert emb.dim == 32
    v = emb.from_string(string="a photo of a dog")
    assert v.shape == (32,)
    assert np.linalg.norm(v) == pytest.approx(1.0, rel=1e-5)


def test_text_pipeline_matches_hf(hf_checkpoint_dir, artifact):
    import torch

    from seesaw_tpu.models.clip import ClipEmbedding

    _, hf, tok = hf_checkpoint_dir
    emb = ClipEmbedding.from_artifact(str(artifact))

    for s in ["a photo of a dog", "the quick brown fox", "café straße 123",
              "it's a bird! no, a plane"]:
        with torch.inference_mode():
            toks = tok(s, return_tensors="pt", truncation=True, max_length=16)
            want = hf.get_text_features(**toks).numpy().reshape(-1)
        want = want / np.linalg.norm(want)
        got = emb.from_string(string=s)
        np.testing.assert_allclose(got, want, atol=2e-4, err_msg=s)


def test_image_pipeline_matches_hf(hf_checkpoint_dir, artifact):
    import torch
    from transformers import CLIPImageProcessor

    from seesaw_tpu.models.clip import ClipEmbedding

    _, hf, _ = hf_checkpoint_dir
    emb = ClipEmbedding.from_artifact(str(artifact))

    proc = CLIPImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32},
    )
    rng = np.random.default_rng(0)
    from PIL import Image

    for hw in [(32, 32), (48, 64), (100, 40)]:
        img = Image.fromarray(
            (rng.random((hw[0], hw[1], 3)) * 255).astype(np.uint8)
        )
        with torch.inference_mode():
            px = proc(img, return_tensors="pt")["pixel_values"]
            want = hf.get_image_features(pixel_values=px).numpy().reshape(-1)
        want = want / np.linalg.norm(want)
        got = emb.from_image(image=img).reshape(-1)
        np.testing.assert_allclose(got, want, atol=5e-3, err_msg=str(hw))
