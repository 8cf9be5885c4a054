"""Temperature-calibrated multiclass linear probe (research extra).

Re-design of the reference's pytorch-lightning experiment
(`/root/reference/seesaw/research/looptest.py:8-50`): logits are
(X @ normalize(W)ᵀ) · exp(log_temp) + b — a cosine classifier with a learned
per-class temperature — trained with cross-entropy. Here the whole training
loop is one jitted optax program (lax.scan over epochs of full-batch steps)
with the reference's per-group learning rates (W: 1e-3 + weight decay
surface, b: 5e-2, log_temp: 5e-3).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class TempRegressionParams(NamedTuple):
    W: jnp.ndarray  # (C, D)
    b: jnp.ndarray  # (C,)
    log_temps: jnp.ndarray  # (C,)


def init_params(in_features: int, out_classes: int, seed: int = 0,
                initial_weights: np.ndarray | None = None) -> TempRegressionParams:
    if initial_weights is not None:
        W = jnp.asarray(initial_weights, jnp.float32)
    else:
        k = jax.random.PRNGKey(seed)
        W = jax.random.normal(k, (out_classes, in_features)) / jnp.sqrt(in_features)
    return TempRegressionParams(
        W=W, b=jnp.zeros(out_classes), log_temps=jnp.zeros(out_classes)
    )


def logits_fn(p: TempRegressionParams, X: jnp.ndarray) -> jnp.ndarray:
    Wn = p.W / jnp.maximum(jnp.linalg.norm(p.W, axis=1, keepdims=True), 1e-12)
    return (X @ Wn.T) * jnp.exp(p.log_temps)[None, :] + p.b[None, :]


def _make_optimizer(lr_w=1e-3, lr_b=5e-2, lr_t=5e-3):
    return optax.multi_transform(
        {
            "W": optax.adamw(lr_w, weight_decay=0.0),
            "b": optax.adamw(lr_b, weight_decay=0.0),
            "log_temps": optax.adamw(lr_t, weight_decay=0.0),
        },
        TempRegressionParams(W="W", b="b", log_temps="log_temps"),
    )


@functools.partial(jax.jit, static_argnames=("epochs",))
def _fit(p0, X, y, *, epochs: int):
    opt = _make_optimizer()
    state0 = opt.init(p0)

    def loss_fn(p):
        lg = logits_fn(p, X)
        return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s2 = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s2), loss

    (p, _), losses = jax.lax.scan(step, (p0, state0), None, length=epochs)
    return p, losses


class TempRegression:
    """Cosine classifier with learned per-class temperature."""

    def __init__(self, in_features: int, out_classes: int,
                 initial_weights: np.ndarray | None = None, seed: int = 0):
        self.params = init_params(in_features, out_classes, seed, initial_weights)

    def fit(self, X: np.ndarray, y: np.ndarray, epochs: int = 200) -> np.ndarray:
        p, losses = _fit(
            self.params, jnp.asarray(X, jnp.float32),
            jnp.asarray(y, jnp.int32), epochs=epochs,
        )
        self.params = p
        return np.asarray(losses)

    def predict_logits(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(logits_fn(self.params, jnp.asarray(X, jnp.float32)))

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self.predict_logits(X).argmax(axis=1)

    @property
    def temperatures(self) -> np.ndarray:
        return np.exp(np.asarray(self.params.log_temps))
