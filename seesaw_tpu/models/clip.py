"""CLIP in flax: ViT image tower + causal text tower, TPU-first.

From-scratch implementation matching the HF/OpenAI CLIP architecture
numerically (quick-GELU, pre-LN transformer, EOS-token text pooling,
projection heads) so real checkpoints convert directly. The reference wraps
torch CLIP models (`/root/reference/seesaw/models/embeddings.py:427-540`);
here the towers are flax modules compiled by XLA, run in bf16 on the MXU
with fp32 layernorm/softmax accumulation.

Weight loading: `convert_hf_state_dict` maps a torch `CLIPModel` state_dict
(HF transformers) into this module's param tree — used both for loading
pretrained checkpoints from disk and for the torch-parity golden tests
(random-init HF model, no network needed).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    embed_dim: int = 512
    # vision
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    # numerics
    dtype: Any = jnp.float32
    # fused pair-packed Pallas attention on eligible shapes (head_dim 64,
    # even heads, no mask, L <= 384 — all three ViT vision towers) — see
    # ops/pallas_attention.py; the einsum path is used wherever ineligible
    fused_attention: bool = True

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


VARIANTS = {
    "vit-b32": ClipConfig(),
    "vit-b16": ClipConfig(patch_size=16),
    "vit-l14": ClipConfig(
        embed_dim=768, patch_size=14, vision_width=1024, vision_layers=24,
        vision_heads=16, text_width=768, text_layers=12, text_heads=12,
    ),
    # tiny variant for tests
    "test": ClipConfig(
        embed_dim=16, image_size=32, patch_size=16, vision_width=24,
        vision_layers=2, vision_heads=2, vocab_size=128, context_length=16,
        text_width=16, text_layers=2, text_heads=2,
    ),
}

# CLIP preprocessing constants (reference `embeddings.py:405-419`)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32
    fused: bool = False
    # causal=True promises the dense `mask` argument is exactly the
    # triu(-inf) causal mask, letting the fused kernel rebuild it from
    # iotas instead of consuming the tensor (einsum fallback still uses it)
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        B, L, _ = x.shape
        head_dim = self.width // self.heads
        if self.causal and mask is None:
            # causal is authoritative: normalize so the einsum fallback and
            # the fused kernel (which rebuilds the mask from iotas) can
            # never diverge when a caller omits the dense tensor
            mask = jnp.triu(jnp.full((L, L), -jnp.inf, dtype=jnp.float32), k=1)
        dense = functools.partial(
            nn.Dense, self.width, dtype=self.dtype, param_dtype=jnp.float32
        )
        q = dense(name="q_proj")(x)
        k = dense(name="k_proj")(x)
        v = dense(name="v_proj")(x)

        # fused pair-packed Pallas attention (ops/pallas_attention.py):
        # reads/writes the natural (B, L, width) layout — no head
        # split/merge transposes, 128-deep MXU contractions. Ablation shows
        # the einsum path below spends 58% of the ViT forward here for ~8%
        # of its FLOPs (PARITY.md round-4 item 10).
        if (self.fused and (mask is None or self.causal) and head_dim == 64
                and self.heads % 2 == 0 and L <= 384):
            backend = jax.default_backend()
            if backend != "cpu" or os.environ.get(
                "SEESAW_FUSED_ATTN_INTERPRET"
            ):
                from ..ops.pallas_attention import fused_pair_attention

                # NOTE: backend + SEESAW_FUSED_ATTN_INTERPRET are read at
                # TRACE time; a cached jit pins the choice made when first
                # traced (toggling the env var mid-process won't retrace)
                out = fused_pair_attention(
                    q, k, v, heads=self.heads,
                    interpret=(backend == "cpu"), causal=self.causal,
                )
                return dense(name="out_proj")(out)

        def split(t):
            return t.reshape(B, L, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        # fp32 softmax accumulation regardless of compute dtype.
        # KEEP IN SYNC with ops/pallas_attention (forward AND backward
        # kernels recompute these semantics; the tower-level grad
        # differential guards the pairing:
        # tests/test_pallas_attention.py test_tower_gradients_fused_vs_einsum)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        logits = logits / np.sqrt(head_dim)
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.width)
        return dense(name="out_proj")(out)


class MLP(nn.Module):
    width: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4 * self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        h = quick_gelu(h)
        return nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(h)


class ResidualBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32
    fused: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm1")
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")
        x = x + MultiHeadAttention(
            self.width, self.heads, dtype=self.dtype, fused=self.fused,
            causal=self.causal, name="self_attn"
        )(ln1(x).astype(self.dtype), mask)
        x = x + MLP(self.width, dtype=self.dtype, name="mlp")(
            ln2(x).astype(self.dtype)
        )
        return x


class VisionTower(nn.Module):
    cfg: ClipConfig

    @nn.compact
    def __call__(self, pixels):
        """pixels: (B, H, W, 3) normalized. Returns (B, embed_dim) UNnormalized."""
        c = self.cfg
        x = nn.Conv(
            c.vision_width,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=c.dtype,
            param_dtype=jnp.float32,
            name="patch_embedding",
        )(pixels.astype(c.dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, c.vision_width)  # (B, grid*grid, width)

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.vision_width,),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(c.dtype), (B, 1, c.vision_width)), x], axis=1
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (c.grid * c.grid + 1, c.vision_width),
            jnp.float32,
        )
        x = x + pos.astype(c.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_layernorm")(x)
        x = x.astype(c.dtype)
        for i in range(c.vision_layers):
            x = ResidualBlock(
                c.vision_width, c.vision_heads, dtype=c.dtype,
                fused=c.fused_attention, name=f"layer_{i}"
            )(x)
        pooled = x[:, 0]
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_layernorm")(
            pooled
        )
        out = nn.Dense(
            c.embed_dim, use_bias=False, dtype=c.dtype, param_dtype=jnp.float32,
            name="projection",
        )(pooled.astype(c.dtype))
        return out.astype(jnp.float32)


class TextTower(nn.Module):
    cfg: ClipConfig

    @nn.compact
    def __call__(self, tokens, eot_positions=None, return_preprojection=False):
        """tokens: (B, L) int32. Pools at eot_positions (default: argmax id,
        the OpenAI convention — EOT has the largest token id).
        return_preprojection=True yields pooled features before the
        projection head (textual-feedback fine-tuning trains only the
        projection — reference `textual_feedback_box.py:162-203`)."""
        c = self.cfg
        emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (c.vocab_size, c.text_width), jnp.float32,
        )
        x = emb[tokens].astype(c.dtype)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (c.context_length, c.text_width), jnp.float32,
        )
        L = tokens.shape[1]
        x = x + pos[:L].astype(c.dtype)

        causal = jnp.triu(jnp.full((L, L), -jnp.inf, dtype=jnp.float32), k=1)
        for i in range(c.text_layers):
            x = ResidualBlock(
                c.text_width, c.text_heads, dtype=c.dtype,
                fused=c.fused_attention, causal=True, name=f"layer_{i}"
            )(x, mask=causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")(x)
        if eot_positions is None:
            eot_positions = jnp.argmax(tokens, axis=1)
        pooled = x[jnp.arange(x.shape[0]), eot_positions]
        out = nn.Dense(
            c.embed_dim, use_bias=False, dtype=c.dtype, param_dtype=jnp.float32,
            name="projection",
        )(pooled.astype(c.dtype))
        if return_preprojection:
            return pooled.astype(jnp.float32)
        return out.astype(jnp.float32)


class ClipModel(nn.Module):
    cfg: ClipConfig

    def setup(self):
        self.vision = VisionTower(self.cfg, name="vision")
        self.text = TextTower(self.cfg, name="text")
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(np.log(1 / 0.07)), (), jnp.float32
        )

    def encode_image(self, pixels):
        return self.vision(pixels)

    def encode_text(self, tokens, eot_positions=None):
        return self.text(tokens, eot_positions)

    def encode_text_preproj(self, tokens):
        return self.text(tokens, None, return_preprojection=True)

    def __call__(self, pixels, tokens):
        img = self.encode_image(pixels)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T


# ---------------------------------------------------------------------------
# torch (HF transformers CLIPModel) -> flax param conversion
# ---------------------------------------------------------------------------
def _t(x):
    return jnp.asarray(np.asarray(x, dtype=np.float32))


def convert_hf_state_dict(sd: dict, cfg: ClipConfig) -> dict:
    """Map a HF `CLIPModel.state_dict()` to this module's params tree."""

    def lin(prefix):
        return {
            "kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"]),
        }

    def ln(prefix):
        return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}

    def block(prefix):
        return {
            "layer_norm1": ln(f"{prefix}.layer_norm1"),
            "layer_norm2": ln(f"{prefix}.layer_norm2"),
            "self_attn": {
                "q_proj": lin(f"{prefix}.self_attn.q_proj"),
                "k_proj": lin(f"{prefix}.self_attn.k_proj"),
                "v_proj": lin(f"{prefix}.self_attn.v_proj"),
                "out_proj": lin(f"{prefix}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": lin(f"{prefix}.mlp.fc1"),
                "fc2": lin(f"{prefix}.mlp.fc2"),
            },
        }

    vision = {
        # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
        "patch_embedding": {
            "kernel": _t(
                sd["vision_model.embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0)
        },
        "class_embedding": _t(sd["vision_model.embeddings.class_embedding"]),
        "position_embedding": _t(
            sd["vision_model.embeddings.position_embedding.weight"]
        ),
        "pre_layernorm": ln("vision_model.pre_layrnorm"),
        "post_layernorm": ln("vision_model.post_layernorm"),
        "projection": {"kernel": _t(sd["visual_projection.weight"]).T},
    }
    for i in range(cfg.vision_layers):
        vision[f"layer_{i}"] = block(f"vision_model.encoder.layers.{i}")

    text = {
        "token_embedding": _t(sd["text_model.embeddings.token_embedding.weight"]),
        "position_embedding": _t(
            sd["text_model.embeddings.position_embedding.weight"]
        ),
        "final_layer_norm": ln("text_model.final_layer_norm"),
        "projection": {"kernel": _t(sd["text_projection.weight"]).T},
    }
    for i in range(cfg.text_layers):
        text[f"layer_{i}"] = block(f"text_model.encoder.layers.{i}")

    return {
        "vision": vision,
        "text": text,
        "logit_scale": _t(sd["logit_scale"]),
    }


def config_from_hf(hf_cfg: dict) -> ClipConfig:
    """Derive a ClipConfig from an HF CLIP config.json dict."""
    tc, vc = hf_cfg["text_config"], hf_cfg["vision_config"]
    return ClipConfig(
        embed_dim=hf_cfg.get("projection_dim", 512),
        image_size=vc.get("image_size", 224),
        patch_size=vc.get("patch_size", 32),
        vision_width=vc.get("hidden_size", 768),
        vision_layers=vc.get("num_hidden_layers", 12),
        vision_heads=vc.get("num_attention_heads", 12),
        vocab_size=tc.get("vocab_size", 49408),
        context_length=tc.get("max_position_embeddings", 77),
        text_width=tc.get("hidden_size", 512),
        text_layers=tc.get("num_hidden_layers", 12),
        text_heads=tc.get("num_attention_heads", 8),
    )


_CONFIG_FIELDS = (
    "embed_dim", "image_size", "patch_size", "vision_width", "vision_layers",
    "vision_heads", "vocab_size", "context_length", "text_width",
    "text_layers", "text_heads",
)


def config_to_info(cfg: ClipConfig) -> dict:
    return {f: getattr(cfg, f) for f in _CONFIG_FIELDS}


def config_from_info(info: dict) -> ClipConfig:
    return ClipConfig(**{f: int(info[f]) for f in _CONFIG_FIELDS if f in info})


def init_params(cfg: ClipConfig, seed: int = 0) -> dict:
    model = ClipModel(cfg)
    pixels = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    tokens = jnp.zeros((1, cfg.context_length), dtype=jnp.int32)
    return model.init(jax.random.PRNGKey(seed), pixels, tokens)["params"]


# ---------------------------------------------------------------------------
# Embedding wrapper (XEmbedding contract)
# ---------------------------------------------------------------------------
class ClipEmbedding:
    """XEmbedding backed by the flax CLIP. Caches string embeddings;
    jit-compiles the two tower applies once per batch shape bucket."""

    def __init__(
        self,
        variant: str = "vit-b32",
        checkpoint: Optional[str] = None,
        dtype=jnp.float32,
        params: Optional[dict] = None,
        tokenizer=None,
        cfg: Optional[ClipConfig] = None,
    ):
        if cfg is None:
            cfg = VARIANTS[variant]
        if dtype is not None and dtype != cfg.dtype:
            cfg = dataclasses.replace(cfg, dtype=dtype)
        self.cfg = cfg
        self.variant = variant
        self.model = ClipModel(cfg)
        if params is not None:
            self.params = params
        elif checkpoint is not None:
            self.params = load_checkpoint(checkpoint, cfg)
        else:
            self.params = init_params(cfg)
        if tokenizer is None:
            from .tokenizer import default_tokenizer

            tokenizer = default_tokenizer(cfg.context_length, cfg.vocab_size)
        self.tokenizer = tokenizer
        self._string_cache: dict = {}

        self._encode_image = jax.jit(
            lambda p, px: self.model.apply({"params": p}, px,
                                           method=ClipModel.encode_image)
        )
        self._encode_text = jax.jit(
            lambda p, tok: self.model.apply({"params": p}, tok,
                                            method=ClipModel.encode_text)
        )

    @property
    def dim(self) -> int:
        return self.cfg.embed_dim

    def from_string(self, *, string: str = None, str_list=None) -> np.ndarray:
        if string is not None:
            if string in self._string_cache:
                return self._string_cache[string]
            out = self.from_string(str_list=[string])[0]
            self._string_cache[string] = out
            return out
        tokens = np.stack([self.tokenizer.encode(s) for s in (str_list or [])])
        out = np.asarray(self._encode_text(self.params, jnp.asarray(tokens)))
        return out / np.linalg.norm(out, axis=-1, keepdims=True)

    def from_image(self, *, preprocessed_image=None, image=None) -> np.ndarray:
        if preprocessed_image is None:
            from .preprocess import preprocess_image

            preprocessed_image = preprocess_image(image, self.cfg.image_size)
        px = np.asarray(preprocessed_image, dtype=np.float32)
        if px.ndim == 3:
            px = px[None]
        out = np.asarray(self._encode_image(self.params, jnp.asarray(px)))
        return out / np.linalg.norm(out, axis=-1, keepdims=True)

    def encode_image_batch(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """Raw (unnormalized) device-side batch encode for the ingestion
        pipeline; caller handles normalization/sharding."""
        return self._encode_image(self.params, pixels)

    def from_raw(self, data) -> np.ndarray:
        return self.from_string(string=data) if isinstance(data, str) else self.from_image(image=data)

    @staticmethod
    def from_artifact(path: str, dtype=jnp.float32) -> "ClipEmbedding":
        """Load a converted checkpoint directory (params.npz + info.json +
        vocab.json/merges.txt) as produced by scripts/convert_clip_checkpoint.py
        — the 'images -> real-CLIP index -> session' entry point."""
        import json
        import pathlib

        from .tokenizer import default_tokenizer

        p = pathlib.Path(path)
        info = json.loads((p / "info.json").read_text())
        cfg = config_from_info(info)
        if dtype is not None:
            cfg = dataclasses.replace(cfg, dtype=dtype)
        params = load_checkpoint(str(p / "params.npz"), cfg)
        tok = default_tokenizer(cfg.context_length, cfg.vocab_size, vocab_dir=p)
        emb = ClipEmbedding(
            variant=info.get("variant", "vit-b32"), params=params,
            tokenizer=tok, dtype=None, cfg=cfg,
        )
        return emb


def load_checkpoint(path: str, cfg: ClipConfig) -> dict:
    """Load params from .npz (flax flat) or a torch state-dict file."""
    import pathlib

    p = pathlib.Path(path)
    if p.is_dir():
        p = p / "params.npz"
    if p.suffix == ".npz":
        import flax.traverse_util as tu

        with np.load(p) as z:
            flat = {tuple(k.split("/")): jnp.asarray(z[k]) for k in z.files}
        return tu.unflatten_dict(flat)
    # torch checkpoint
    import torch

    sd = torch.load(p, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_hf_state_dict(sd, cfg)


def save_params_npz(params: dict, path: str):
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    np.savez(path, **{"/".join(k): np.asarray(v) for k, v in flat.items()})
