"""Gaussian mixture with label-seeded initialization (research extra).

Re-design of the reference's torch/einops EM mixture
(`/root/reference/seesaw/research/mixture.py:144-240`): full-covariance EM
where the first center is seeded from the labeled positives' mean and the
rest by k-means++ D² sampling — the semi-supervised "find the positive
cluster" experiment. Here the E/M steps are one jitted XLA program each
(batched einsum covariance updates run on the MXU; responsibilities via
logsumexp), and the EM loop is a lax.fori_loop.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gen_data(n_classes: int = 3, n_dim: int = 2, n_samples: int = 1000,
             normalize: bool = False, seed: int = 0):
    """Synthetic mixture draw: returns (X (n,d), labels (n,), class_probs,
    mus, covs). Class 0 is the least popular (reference convention)."""
    rng = np.random.default_rng(seed)
    mus = rng.normal(scale=2.0, size=(n_classes, n_dim))
    class_probs = np.sort(rng.dirichlet(np.ones(n_classes)))
    cats = rng.choice(n_classes, size=n_samples, p=class_probs)
    X = mus[cats] + rng.normal(size=(n_samples, n_dim))
    if normalize:
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
    covs = np.stack([np.eye(n_dim)] * n_classes)
    return X.astype(np.float32), cats, class_probs, mus, covs


def kmeans_plusplus(X: np.ndarray, center0: np.ndarray, n_clusters: int,
                    seed: int = 0) -> np.ndarray:
    """D²-sampling seeding with a FIXED first center (the labeled-positive
    mean) — the rest chosen proportionally to squared distance."""
    rng = np.random.default_rng(seed)
    centers = [np.asarray(center0, dtype=np.float64)]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for _ in range(1, n_clusters):
        total = d2.sum()
        if total <= 0:
            idx = rng.integers(0, X.shape[0])
        else:
            idx = rng.choice(X.shape[0], p=d2 / total)
        centers.append(X[idx].astype(np.float64))
        d2 = np.minimum(d2, ((X - centers[-1]) ** 2).sum(axis=1))
    return np.stack(centers).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def _em(X, mus0, covs0, log_pz0, *, n_iters: int, reg: float = 1e-6):
    n, d = X.shape

    def log_px_given_z(mus, covs):
        # (k,) log normalization + (n, k) mahalanobis
        inv = jnp.linalg.inv(covs)  # (k, d, d)
        _, logdet = jnp.linalg.slogdet(covs)
        log_norm = -0.5 * (d * math.log(2 * math.pi) + logdet)  # (k,)
        diff = X[None, :, :] - mus[:, None, :]  # (k, n, d)
        m = jnp.einsum("kni,kij,knj->nk", diff, inv, diff)
        return log_norm[None, :] - 0.5 * m  # (n, k)

    def step(_, state):
        mus, covs, log_pz, _ = state
        # E-step
        log_joint = log_pz[None, :] + log_px_given_z(mus, covs)
        log_px = jax.scipy.special.logsumexp(log_joint, axis=1)
        resp = jnp.exp(log_joint - log_px[:, None])  # (n, k)
        # M-step
        nk = resp.sum(axis=0)  # (k,)
        new_log_pz = jnp.log(nk / n)
        w = resp / jnp.maximum(nk[None, :], 1e-12)  # (n, k) column-normalized
        new_mus = jnp.einsum("nk,nd->kd", w, X)
        diff = X[None, :, :] - new_mus[:, None, :]
        new_covs = jnp.einsum("kn,kni,knj->kij", w.T, diff, diff)
        new_covs = new_covs + reg * jnp.eye(d)[None]
        return new_mus, new_covs, new_log_pz, jnp.mean(log_px)

    state = (mus0, covs0, log_pz0, jnp.asarray(-jnp.inf))
    mus, covs, log_pz, ll = jax.lax.fori_loop(0, n_iters, step, state)
    return mus, covs, log_pz, ll


class MixtureModel:
    """Full-covariance GMM; fit() seeds center 0 from labeled positives."""

    def __init__(self, n_components: int, seed: int = 0):
        self.n_components = n_components
        self.seed = seed
        self.mus = self.covs = self.log_pz = None

    def fit(self, X: np.ndarray,
            Xys: Optional[Tuple[np.ndarray, np.ndarray]] = None,
            max_iters: int = 100) -> float:
        X = np.asarray(X, np.float32)
        d = X.shape[1]
        if Xys is not None:
            X2, ys = Xys
            center0 = np.asarray(X2)[np.asarray(ys) > 0].mean(axis=0)
            allX = np.concatenate([X, np.asarray(X2, np.float32)])
        else:
            center0 = X.mean(axis=0)
            allX = X
        mus0 = kmeans_plusplus(allX, center0, self.n_components, seed=self.seed)
        covs0 = np.stack([np.eye(d, dtype=np.float32)] * self.n_components)
        log_pz0 = np.full(self.n_components, -math.log(self.n_components),
                          dtype=np.float32)
        mus, covs, log_pz, ll = _em(
            jnp.asarray(X), jnp.asarray(mus0), jnp.asarray(covs0),
            jnp.asarray(log_pz0), n_iters=max_iters,
        )
        self.mus, self.covs, self.log_pz = map(np.asarray, (mus, covs, log_pz))
        return float(ll)

    def _log_joint(self, X):
        X = jnp.asarray(X, jnp.float32)
        inv = jnp.linalg.inv(jnp.asarray(self.covs))
        _, logdet = jnp.linalg.slogdet(jnp.asarray(self.covs))
        d = X.shape[1]
        log_norm = -0.5 * (d * math.log(2 * math.pi) + logdet)
        diff = X[None, :, :] - jnp.asarray(self.mus)[:, None, :]
        m = jnp.einsum("kni,kij,knj->nk", diff, inv, diff)
        return jnp.asarray(self.log_pz)[None, :] + log_norm[None, :] - 0.5 * m

    def log_px(self, X: np.ndarray) -> np.ndarray:
        """Per-point log likelihood under the fitted mixture."""
        return np.asarray(jax.scipy.special.logsumexp(self._log_joint(X), axis=1))

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        """Responsibilities p(z | x) (n, k)."""
        lj = self._log_joint(X)
        return np.asarray(jnp.exp(lj - jax.scipy.special.logsumexp(lj, axis=1, keepdims=True)))
