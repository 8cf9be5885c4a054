"""Online textual-feedback model: per-string linear scorers or text-tower
projection fine-tuning.

jax/optax re-derivation of the reference `OnlineModel`
(`/root/reference/seesaw/textual_feedback_box.py:120-420`):

- mode='linear': one LinearScorer per distinct description string
  (weight initialized from the string's CLIP embedding, plus a bias and a
  logit scale). Scores are the softmax over scorers; training = description
  cross-entropy (image -> its annotated string) + a pairwise hinge rank loss
  on the target string's log-softmax score, AdamW with the reference's two
  learning-rate groups and constant-with-warmup schedule.
- mode='finetune': the CLIP text tower is frozen up to the final projection;
  only `text_projection` trains, with multi-margin label loss + rank loss.

The model resets per session/update (reference `_reset_model`), and caches
pre-projection string encodings so only the trainable tail recomputes.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .clip import ClipEmbedding, ClipModel


def deduplicate_strings(strings: List[str]):
    s2id: Dict[str, int] = {}
    ids = []
    for s in strings:
        if s not in s2id:
            s2id[s] = len(s2id)
        ids.append(s2id[s])
    id2s = [None] * len(s2id)
    for s, i in s2id.items():
        id2s[i] = s
    return {"strings": id2s, "indices": np.array(ids)}


def _hinge_rank_loss(scores, marked_accepted, margin):
    """Mean hinge over (pos, neg) pairs; None-equivalent 0 when one-sided."""
    pos = marked_accepted
    npos = pos.sum()
    n = scores.shape[0]
    have_both = (npos > 0) & (npos < n)
    diff = scores[:, None] - scores[None, :]  # pos_i - neg_j when masked
    pair = pos[:, None] & (~pos)[None, :]
    losses = jnp.where(pair, jnp.maximum(0.0, margin - diff), 0.0)
    denom = jnp.maximum(pair.sum(), 1)
    return jnp.where(have_both, losses.sum() / denom, 0.0), have_both


class OnlineModel:
    def __init__(self, embedding: ClipEmbedding, config: dict):
        self.embedding = embedding
        self.config = dict(config)
        self.mode = self.config["mode"]
        assert self.mode in ("linear", "finetune")
        self.losses: list = []
        self._preproj_cache: Dict[str, np.ndarray] = {}
        self._target_string: Optional[str] = None
        self.reset()

    # -- plumbing ----------------------------------------------------------
    def reset(self):
        """Reset trainable state (reference `_reset_model`)."""
        self.scorer_names: List[str] = []
        self.scorer_params: Optional[dict] = None
        self.text_projection = np.asarray(
            self.embedding.params["text"]["projection"]["kernel"]
        ).copy()

    def encode_string(self, s: str) -> np.ndarray:
        """Normalized embedding through the CURRENT (possibly tuned) projection."""
        pre = self._encode_preprojection([s])
        out = pre @ self.text_projection
        return (out / np.linalg.norm(out, axis=1, keepdims=True))[0]

    _preproj_jit: dict = {}  # per-architecture traced fns, shared by sessions

    def _encode_preprojection(self, strings: List[str]) -> np.ndarray:
        """Pooled text features before the projection, cached per string
        (the frozen part of the tower — reference `compute_up_to`). ONE
        jitted dispatch with params as arguments (eager tower applies cost
        hundreds of per-op round-trips through a high-latency link); token
        batches pad to pow2 buckets to bound retraces."""
        missing = [s for s in strings if s not in self._preproj_cache]
        if missing:
            model = self.embedding.model
            toks = np.stack([self.embedding.tokenizer.encode(s) for s in missing])
            cfg = getattr(self.embedding, "cfg", None)
            if cfg is None:  # test stubs / non-flax embeddings: eager apply
                out = np.asarray(model.apply(
                    {"params": self.embedding.params}, jnp.asarray(toks),
                    method=ClipModel.encode_text_preproj,
                ))
            else:
                key = str(cfg)
                fn = OnlineModel._preproj_jit.get(key)
                if fn is None:
                    fn = jax.jit(
                        lambda p, tok: model.apply(
                            {"params": p}, tok,
                            method=ClipModel.encode_text_preproj,
                        )
                    )
                    OnlineModel._preproj_jit[key] = fn
                B = 1 << max(int(np.ceil(np.log2(len(missing)))), 0)
                toks_p = np.zeros((B,) + toks.shape[1:], toks.dtype)
                toks_p[: len(missing)] = toks
                out = np.asarray(
                    fn(self.embedding.params, jnp.asarray(toks_p))
                )[: len(missing)]
            for s, v in zip(missing, out):
                self._preproj_cache[s] = v
        return np.stack([self._preproj_cache[s] for s in strings])

    # -- scoring -----------------------------------------------------------
    def score_vecs(self, imagevecs: np.ndarray) -> np.ndarray:
        """Per-vector score of the target string (scorer/string 0)."""
        if self.mode == "linear":
            assert self.scorer_params is not None and len(self.scorer_names) > 0
            W = self.scorer_params["w"]  # (S, d)
            b = self.scorer_params["b"]
            ls = self.scorer_params["ls"]
            logits = imagevecs @ np.asarray(W).T * np.exp(np.asarray(ls)) + np.asarray(b)
            if logits.shape[1] > 1:
                z = logits - logits.max(axis=1, keepdims=True)
                e = np.exp(z)
                probs = e / e.sum(axis=1, keepdims=True)
                return probs[:, 0]
            return logits[:, 0]
        # finetune: cosine against the tuned target-string vector
        assert self._target_string is not None
        v = self.encode_string(self._target_string)
        return imagevecs @ v

    def get_lookup_vec(self, s: str) -> np.ndarray:
        if self.mode == "linear" and self.scorer_params is not None and s in self.scorer_names:
            return np.asarray(self.scorer_params["w"][self.scorer_names.index(s)])
        return self.encode_string(s)

    # -- training ----------------------------------------------------------
    def update(
        self,
        imagevecs: np.ndarray,
        marked_accepted: np.ndarray,
        annotations: np.ndarray,
        target_string: str,
    ):
        assert imagevecs.shape[0] == marked_accepted.shape[0] == annotations.shape[0]
        assert target_string != ""
        self._target_string = target_string
        self.reset()

        has_desc = np.array(
            [a != "" and a is not None for a in annotations], dtype=bool
        )  # explicit dtype: an empty comprehension would yield float64,
        # which is invalid as a boolean index
        desc_vecs = imagevecs[has_desc]
        desc_strs = list(np.asarray(annotations, dtype=object)[has_desc])

        d = deduplicate_strings([target_string] + desc_strs)
        strings = d["strings"]
        string_ids = d["indices"][1:]  # per annotated vec, its string id

        if self.mode == "linear":
            init_w = np.stack(
                [self._normalized_string_vec(s) for s in strings]
            )
            self.scorer_names = list(strings)
            self._train_linear(
                init_w, desc_vecs, string_ids, imagevecs, marked_accepted
            )
        else:
            pre = self._encode_preprojection(strings)
            self._train_finetune(
                pre, desc_vecs, string_ids, imagevecs, marked_accepted
            )
        return self.losses

    def _normalized_string_vec(self, s: str) -> np.ndarray:
        pre = self._encode_preprojection([s])
        out = pre @ np.asarray(self.embedding.params["text"]["projection"]["kernel"])
        return (out / np.linalg.norm(out, axis=1, keepdims=True))[0]

    def _train_linear(self, init_w, desc_vecs, string_ids, all_vecs, marked_accepted):
        cfg = self.config
        S, d = init_w.shape
        params = {
            "w": jnp.asarray(init_w),
            "b": jnp.zeros(S),
            "ls": jnp.zeros(S),
        }
        n_steps = cfg.get("rounds", 10) + cfg.get("num_warmup_steps", 4)
        warmup = cfg.get("num_warmup_steps", 4)
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, 1.0, warmup), optax.constant_schedule(1.0)],
            [warmup],
        )
        tx = optax.multi_transform(
            {
                "w": optax.chain(optax.adamw(0.001, weight_decay=0.0),
                                 optax.scale_by_schedule(sched)),
                "rest": optax.chain(optax.adamw(0.002, weight_decay=0.0),
                                    optax.scale_by_schedule(sched)),
            },
            {"w": "w", "b": "rest", "ls": "rest"},
        )
        opt_state = tx.init(params)

        dv = jnp.asarray(desc_vecs.astype(np.float32))
        sid = jnp.asarray(string_ids.astype(np.int32))
        av = jnp.asarray(all_vecs.astype(np.float32))
        acc = jnp.asarray(marked_accepted.astype(bool))
        n_desc = desc_vecs.shape[0]
        image_w = cfg.get("image_loss_weight", 0.5)
        margin = cfg.get("rank_margin", 0.1)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                def logits_of(X):
                    return X @ p["w"].T * jnp.exp(p["ls"]) + p["b"]

                if n_desc > 0 and S > 1:
                    lg = logits_of(dv)
                    logp = jax.nn.log_softmax(lg, axis=1)
                    l1 = -logp[jnp.arange(lg.shape[0]), sid].mean()
                else:
                    l1 = 0.0
                ranking = jax.nn.log_softmax(logits_of(av), axis=-1)[:, 0] if S > 1 else logits_of(av)[:, 0]
                l2, _ = _hinge_rank_loss(ranking, acc, margin)
                return (1.0 - image_w) * l1 + image_w * l2

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_state, loss

        for _ in range(n_steps):
            params, opt_state, loss = step(params, opt_state)
            self.losses.append(float(loss))
        self.scorer_params = jax.tree.map(np.asarray, params)

    def _train_finetune(self, pre_strings, desc_vecs, string_ids, all_vecs, marked_accepted):
        cfg = self.config
        P0 = jnp.asarray(self.text_projection)
        warmup = cfg.get("num_warmup_steps", 0)
        # constant-with-warmup schedule, like the reference's
        # get_constant_schedule_with_warmup (scaling the whole AdamW update
        # equals scaling its lr, weight decay included)
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, 1.0, max(warmup, 1)),
             optax.constant_schedule(1.0)],
            [max(warmup, 1)],
        ) if warmup else optax.constant_schedule(1.0)
        tx = optax.chain(
            optax.adamw(cfg.get("lr", 5e-4),
                        weight_decay=cfg.get("weight_decay", 0.0)),
            optax.scale_by_schedule(sched),
        )
        opt_state = tx.init(P0)

        pre = jnp.asarray(pre_strings.astype(np.float32))
        dv = jnp.asarray(desc_vecs.astype(np.float32))
        sid = jnp.asarray(string_ids.astype(np.int32))
        av = jnp.asarray(all_vecs.astype(np.float32))
        acc = jnp.asarray(marked_accepted.astype(bool))
        S = pre_strings.shape[0]
        n_desc = desc_vecs.shape[0]
        image_w = cfg.get("image_loss_weight", 0.5)
        rank_margin = cfg.get("rank_margin", 0.1)
        label_margin = cfg.get("label_margin", 0.1)

        @jax.jit
        def step(P, opt_state):
            def loss_fn(P):
                feats = pre @ P
                feats = feats / jnp.linalg.norm(feats, axis=1, keepdims=True)
                if n_desc > 0 and S > 1:
                    scores = dv @ feats.T  # (n, S)
                    s_t = scores[jnp.arange(scores.shape[0]), sid]
                    viol = jnp.maximum(0.0, label_margin - s_t[:, None] + scores)
                    not_t = jnp.arange(S)[None, :] != sid[:, None]
                    l1 = (jnp.where(not_t, viol, 0.0).sum(axis=1) / S).mean()
                else:
                    l1 = 0.0
                rank_scores = (av @ feats.T)[:, 0]
                l2, _ = _hinge_rank_loss(rank_scores, acc, rank_margin)
                return (1.0 - image_w) * l1 + image_w * l2

            loss, grads = jax.value_and_grad(loss_fn)(P)
            updates, new_state = tx.update(grads, opt_state, P)
            return optax.apply_updates(P, updates), new_state, loss

        P = P0
        n_steps = cfg.get("rounds", 10) + cfg.get("num_warmup_steps", 0)
        for _ in range(n_steps):
            P, opt_state, loss = step(P, opt_state)
            self.losses.append(float(loss))
        self.text_projection = np.asarray(P)
