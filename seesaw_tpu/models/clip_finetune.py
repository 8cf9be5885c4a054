"""Offline CLIP fine-tuning: contrastive training + hyperparameter search.

Re-derivation of the reference's `clip_module.py` stack
(`/root/reference/seesaw/models/clip_module.py:44-495`): symmetric
contrastive loss over (image, text) pairs, per-parameter-group optimizer
configuration by name prefix (each group with its own lr/weight_decay;
unlisted groups frozen), warmup schedule, and a successive-halving random
hyperparameter search replacing the ray.tune ASHA harness.
"""
from __future__ import annotations

import random
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .clip import ClipEmbedding, ClipModel


def clip_contrastive_loss(image_feats: jnp.ndarray, text_feats: jnp.ndarray,
                          logit_scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric InfoNCE over a batch of aligned (image, text) pairs."""
    img = image_feats / jnp.linalg.norm(image_feats, axis=-1, keepdims=True)
    txt = text_feats / jnp.linalg.norm(text_feats, axis=-1, keepdims=True)
    logits = jnp.exp(logit_scale) * img @ txt.T
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return (li + lt) / 2.0


def _prefix_label(path_str: str, opt_config: Dict[str, Optional[dict]]) -> str:
    """Longest configured prefix wins; unmatched params are frozen
    (reference `add_to_group`, clip_module.py:111-158)."""
    best, best_len = "frozen", -1
    for prefix, cfg in opt_config.items():
        if path_str.startswith(prefix) and len(prefix) > best_len:
            best = prefix if cfg is not None else "frozen"
            best_len = len(prefix)
    return best


def make_grouped_optimizer(params, opt_config: Dict[str, Optional[dict]],
                           warmup_steps: int = 0):
    """optax transform with per-prefix lr/weight_decay groups."""
    def label_fn(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _prefix_label(
                "/".join(p.key if hasattr(p, "key") else str(p) for p in path),
                opt_config,
            ),
            tree,
        )

    transforms = {"frozen": optax.set_to_zero()}
    for prefix, cfg in opt_config.items():
        if cfg is None:
            continue
        sched = (
            optax.warmup_constant_schedule(0.0, cfg["lr"], warmup_steps)
            if warmup_steps
            else cfg["lr"]
        )
        transforms[prefix] = optax.adamw(
            sched, weight_decay=cfg.get("weight_decay", 0.0)
        )
    return optax.multi_transform(transforms, label_fn)


class CLIPFineTuner:
    """Contrastive fine-tuning of the flax CLIP on (pixels, tokens) pairs."""

    def __init__(self, embedding: ClipEmbedding, config: dict):
        self.embedding = embedding
        self.config = dict(config)
        # train THROUGH the fused kernel: its pair-packed Pallas backward
        # (ops/pallas_attention._attn_bwd_kernel) recomputes the softmax in
        # VMEM instead of replaying the einsum forward — full contrastive
        # fwd+bwd measured 2034 einsum vs 2518 fused pairs/s (+24%, B=256,
        # scripts/probe_fused_attention_bwd.py; the earlier
        # backward-by-einsum VJP netted out neutral at 1994)
        self.model = ClipModel(embedding.cfg)
        self.params = jax.tree.map(jnp.asarray, embedding.params)
        opt_config = self.config.get("opt_config") or {
            "text/projection": {"lr": self.config.get("lr", 5e-5),
                                "weight_decay": 0.0}
        }
        self.tx = make_grouped_optimizer(
            self.params, opt_config, warmup_steps=self.config.get("warmup", 0)
        )
        self.opt_state = self.tx.init(self.params)
        self.losses: List[float] = []

        model = self.model
        tx = self.tx

        @jax.jit
        def train_step(params, opt_state, pixels, tokens):
            def loss_fn(p):
                img = model.apply({"params": p}, pixels, method=ClipModel.encode_image)
                txt = model.apply({"params": p}, tokens, method=ClipModel.encode_text)
                return clip_contrastive_loss(img, txt, p["logit_scale"])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_state, loss

        self._train_step = train_step

        @jax.jit
        def eval_step(params, pixels, tokens):
            img = model.apply({"params": params}, pixels,
                              method=ClipModel.encode_image)
            txt = model.apply({"params": params}, tokens,
                              method=ClipModel.encode_text)
            return clip_contrastive_loss(img, txt, params["logit_scale"])

        self._eval_step = eval_step

    def fit(self, pixels: np.ndarray, tokens: np.ndarray, *, epochs: int = 1,
            batch_size: int = 32, seed: int = 0):
        n = pixels.shape[0]
        if n == 0:
            raise ValueError("fit called with zero pairs")
        # small datasets still train: the old drop-remainder loop silently
        # performed ZERO steps whenever n < batch_size
        batch_size = min(batch_size, n)
        rng = np.random.default_rng(seed)
        for _ in range(epochs):
            order = rng.permutation(n)
            for lo in range(0, n - batch_size + 1, batch_size):
                sel = order[lo : lo + batch_size]
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state,
                    jnp.asarray(pixels[sel]), jnp.asarray(tokens[sel]),
                )
                self.losses.append(float(loss))
        return self

    def eval_loss(self, pixels: np.ndarray, tokens: np.ndarray) -> float:
        # one jitted dispatch, params as ARGUMENTS (an eager tower forward
        # dispatches hundreds of ops through a high-latency link)
        return float(self._eval_step(
            self.params, jnp.asarray(pixels), jnp.asarray(tokens)
        ))

    def to_embedding(self) -> ClipEmbedding:
        return ClipEmbedding(
            variant=self.embedding.variant,
            # cfg must ride along: the variant string alone reconstructs the
            # DEFAULT config (vit-b32) for embeddings built with a custom cfg
            cfg=self.embedding.cfg,
            # dtype=None: the constructor's f32 dtype DEFAULT would override
            # cfg.dtype (clip.py __init__), silently de-bf16ing the export
            dtype=None,
            params=jax.tree.map(np.asarray, self.params),
            tokenizer=self.embedding.tokenizer,
        )


def sample_search_space(space: dict, rng: random.Random) -> dict:
    """{k: {'choose': [...]}} or {'loguniform': [lo, hi]} leaves."""
    out = {}
    for k, v in space.items():
        if isinstance(v, dict) and "choose" in v:
            out[k] = rng.choice(v["choose"])
        elif isinstance(v, dict) and "loguniform" in v:
            lo, hi = v["loguniform"]
            out[k] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        elif isinstance(v, dict):
            out[k] = sample_search_space(v, rng)
        else:
            out[k] = v
    return out


def successive_halving_search(
    space: dict,
    make_and_eval: Callable[[dict, int], float],
    *,
    n_trials: int = 8,
    rungs: List[int] = (1, 2, 4),
    eta: int = 2,
    seed: int = 0,
    checkpoint_dir: Optional[str] = None,
):
    """Serial ASHA-style search: sample configs, train each for rung[0]
    budget, keep the best 1/eta fraction per rung at increasing budget.
    make_and_eval(config, budget_units) -> validation loss (lower better).
    Returns (best_config, best_loss, history).

    With checkpoint_dir, search state (history + survivors) persists to
    search_state.json after every trial, and a restarted search resumes past
    completed (config, budget) evaluations — the role of the reference's
    ray.tune checkpointing (`clip_module.py:290-304`)."""
    import json
    from pathlib import Path

    rng = random.Random(seed)
    trials = [sample_search_space(space, rng) for _ in range(n_trials)]
    history = []
    done = {}
    state_path = Path(checkpoint_dir) / "search_state.json" if checkpoint_dir else None
    if state_path and state_path.exists():
        history = json.loads(state_path.read_text())["history"]
        done = {
            (json.dumps(h["config"], sort_keys=True), h["budget"]): h["loss"]
            for h in history
        }

    def save_state():
        if state_path:
            state_path.parent.mkdir(parents=True, exist_ok=True)
            state_path.write_text(json.dumps({"history": history}))

    survivors = trials
    scored = []
    for rung in rungs:
        scored = []
        for cfg in survivors:
            key = (json.dumps(cfg, sort_keys=True), rung)
            if key in done:
                loss = done[key]
            else:
                loss = make_and_eval(cfg, rung)
                history.append({"config": cfg, "budget": rung, "loss": loss})
                done[key] = loss
                save_state()
            scored.append((loss, cfg))
        scored.sort(key=lambda t: t[0])
        keep = max(1, len(scored) // eta)
        survivors = [cfg for _, cfg in scored[:keep]]
    # best = the FINAL rung's winner: a min over all history would mix
    # budgets and could crown a barely-trained eliminated trial on noise
    best_loss, best_cfg = scored[0]
    return best_cfg, best_loss, history
