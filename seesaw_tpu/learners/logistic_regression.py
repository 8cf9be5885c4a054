"""Linear probes fit per feedback round, jit-compiled end to end.

Functional equivalents of the reference's `LogisticRegressionPT` /
`RankRegressionPT` (`/root/reference/seesaw/logistic_regression.py:126-421`):

- weighted binary cross-entropy (balanced class weights) or the fast
  pairwise-rank loss as the data term;
- optional feature centering ('centered' scale);
- regularizer anchored to the (normalized) query vector:
    (|w| - 1)^2 + |w/|w| - q̂|^2,  weighted by reg_lambda / n_examples;
- warm start from the previous round's weights;
- LBFGS with strong-Wolfe line search (ops.lbfgs), one device dispatch per
  fit.

The fit is a pure function of (X, y, sample_weights, w0); the classes here
only hold the warm-start state and configuration.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lbfgs import lbfgs_minimize
from ..ops.rank_loss import cheap_pairwise_rank_loss


def _anchor_regularizer(w: jnp.ndarray, qvec: Optional[jnp.ndarray]):
    """(|w|-1)^2 + |ŵ - q̂|^2 ; the angle term drops out with no anchor.

    Uses a smoothed norm: d|w|/dw is NaN at w=0 (the cold-start point)."""
    norm = jnp.sqrt(jnp.sum(w * w) + 1e-12)
    norm_penalty = (norm - 1.0) ** 2
    if qvec is None:
        return norm_penalty
    w_hat = w / norm
    return norm_penalty + jnp.sum((w_hat - qvec) ** 2)


@functools.partial(
    jax.jit, static_argnames=("fit_intercept", "max_iter", "loss_kind", "has_anchor")
)
def _fit_linear(
    X: jnp.ndarray,
    y: jnp.ndarray,
    sample_w: jnp.ndarray,
    pos_weight: jnp.ndarray,
    reg_weight: jnp.ndarray,
    qvec: jnp.ndarray,  # normalized anchor (ignored when not has_anchor)
    params0: jnp.ndarray,  # (d+1,) [w, b]
    *,
    fit_intercept: bool,
    max_iter: int,
    loss_kind: str,  # 'ce' | 'rank'
    has_anchor: bool,
):
    d = X.shape[1]

    def loss(params):
        w, b = params[:d], params[d]
        logits = X @ w + (b if fit_intercept else 0.0)
        if loss_kind == "ce":
            # weighted BCE-with-logits, pos_weight on the positive term
            per = jax.nn.softplus(-logits) * y * pos_weight + jax.nn.softplus(logits) * (
                1.0 - y
            )
            data = jnp.mean(per * sample_w)
        elif loss_kind == "rank":
            inv = cheap_pairwise_rank_loss(y, logits)
            data = inv.sum()
        else:
            raise ValueError(loss_kind)
        reg = _anchor_regularizer(w, qvec if has_anchor else None)
        return data + reg_weight * reg

    res = lbfgs_minimize(loss, params0, max_iter=max_iter, history=10)
    return res.x, res.f, res.diverged


@functools.partial(
    jax.jit, static_argnames=("fit_intercept", "max_iter", "has_anchor", "center")
)
def _fit_ce_rows(
    V: jnp.ndarray,  # (N, D) index matrix (f32/bf16/int8 padded layout)
    row_scale,  # (N,) int8 dequant scales or None
    prows: jnp.ndarray,  # (B,) int32 padded-layout rows, junk past n_real
    valid: jnp.ndarray,  # (B,) f32 1/0
    y: jnp.ndarray,  # (B,)
    sample_w: jnp.ndarray,  # (B,) zero on padding
    n_real: jnp.ndarray,  # () f32
    pos_weight: jnp.ndarray,
    reg_weight: jnp.ndarray,
    qvec: jnp.ndarray,
    params0: jnp.ndarray,
    *,
    fit_intercept: bool,
    max_iter: int,
    has_anchor: bool,
    center: bool,
):
    """The SERVING-path logistic fit: row gather (+ int8 dequant), centering
    and the LBFGS solve in ONE program — a per-click refine costs a single
    dispatch with no labeled-matrix transfer (the reference round-trips X
    through the host, `loops/log_reg.py:21-32`)."""
    X = V[prows]
    if X.dtype == jnp.int8:
        scale = row_scale[prows][:, None] if row_scale is not None else 1.0
        X = X.astype(jnp.float32) * scale
    X = X.astype(jnp.float32)
    vcol = valid[:, None]
    if center:
        mu = (X * vcol).sum(axis=0) / n_real
    else:
        mu = jnp.zeros(X.shape[1], dtype=jnp.float32)
    Xc = (X - mu) * vcol
    d = X.shape[1]

    def loss(params):
        w, b = params[:d], params[d]
        logits = Xc @ w + (b if fit_intercept else 0.0)
        per = jax.nn.softplus(-logits) * y * pos_weight + jax.nn.softplus(logits) * (
            1.0 - y
        )
        data = (per * sample_w).sum() / n_real  # == mean over REAL rows
        reg = _anchor_regularizer(w, qvec if has_anchor else None)
        return data + reg_weight * reg

    res = lbfgs_minimize(loss, params0, max_iter=max_iter, history=10)
    return res.x, res.f, res.diverged, mu


class _LinearProbeBase:
    loss_kind = "ce"

    def __init__(
        self,
        *,
        scale: Optional[str] = "centered",
        reg_lambda: float = 1.0,
        regularizer_vector: Optional[np.ndarray] = None,
        fit_intercept: bool = True,
        class_weights="balanced",
        max_iter: int = 100,
        verbose: bool = False,
        **_unused,
    ):
        assert scale in ("centered", None)
        self.scale = scale
        self.reg_lambda = reg_lambda
        self.fit_intercept = fit_intercept
        self.class_weights = class_weights
        self.max_iter = max_iter
        self.verbose = verbose
        self.mu_: Optional[np.ndarray] = None
        self.params_: Optional[np.ndarray] = None  # warm start

        if regularizer_vector is not None:
            v = np.asarray(regularizer_vector, dtype=np.float32).reshape(-1)
            self.anchor_ = v / max(np.linalg.norm(v), 1e-12)
        else:
            self.anchor_ = None

    def fit(self, X: np.ndarray, y: np.ndarray, sample_weights: Optional[np.ndarray] = None):
        X = np.asarray(X, dtype=np.float32)
        y = np.asarray(y, dtype=np.float32).reshape(-1)
        n, d = X.shape

        if self.scale == "centered":
            self.mu_ = X.mean(axis=0)
            X = X - self.mu_
        else:
            self.mu_ = np.zeros(d, dtype=np.float32)

        if self.class_weights == "balanced":
            npos = max(int((y == 1).sum()), 1)
            nneg = max(int((y == 0).sum()), 1)
            pos_weight = nneg / npos
        else:
            pos_weight = float(self.class_weights or 1.0)

        sw = (
            np.ones(n, dtype=np.float32)
            if sample_weights is None
            else np.asarray(sample_weights, dtype=np.float32).reshape(-1)
        )

        anchor = (
            self.anchor_ if self.anchor_ is not None else np.zeros(d, dtype=np.float32)
        )
        if self.params_ is not None and self.params_.shape[0] == d + 1:
            params0 = self.params_  # warm start
        elif self.anchor_ is not None:
            # cold-start AT the anchor: w = 0 is a stall point of the
            # anchor regularizer (the normalized-direction term's gradient
            # vanishes under the smoothing), where LBFGS line searches make
            # ~no progress — starting at q-hat lands in the same basin as
            # the reference's torch init (verified coefficient parity)
            params0 = np.concatenate([self.anchor_, np.zeros(1)]).astype(np.float32)
        else:
            params0 = np.zeros(d + 1, dtype=np.float32)

        params, f, diverged = _fit_linear(
            jnp.asarray(X),
            jnp.asarray(y),
            jnp.asarray(sw),
            jnp.asarray(pos_weight, dtype=jnp.float32),
            jnp.asarray(self.reg_lambda / n, dtype=jnp.float32),
            jnp.asarray(anchor),
            jnp.asarray(params0),
            fit_intercept=self.fit_intercept,
            max_iter=self.max_iter,
            loss_kind=self.loss_kind,
            has_anchor=self.anchor_ is not None,
        )
        if bool(diverged):
            raise ValueError("regression training diverged (nan/inf loss)")
        self.params_ = np.asarray(params)
        if self.verbose:
            print(f"fit done: loss={float(f):.5f}")
        return self

    def fit_rows(self, index, rows, y, sample_weights=None):
        """Fit over INDEX rows. On a device-only index (no host vector
        mirror) the gather + centering + LBFGS run as ONE device dispatch
        (_fit_ce_rows) — a per-click refine ships only y/weights up and
        (d+1) params back. Host-mirror indexes and non-ce probes take the
        ordinary fit() path."""
        rows = np.asarray(rows, dtype=np.int64)
        if getattr(index, "vectors", None) is not None or self.loss_kind != "ce":
            return self.fit(index.vectors_for_rows(rows), y, sample_weights)

        y = np.asarray(y, dtype=np.float32).reshape(-1)
        n = rows.shape[0]
        d = int(index._V.shape[1])
        assert n == y.shape[0] and n > 0

        if self.class_weights == "balanced":
            npos = max(int((y == 1).sum()), 1)
            nneg = max(int((y == 0).sum()), 1)
            pos_weight = nneg / npos
        else:
            pos_weight = float(self.class_weights or 1.0)
        sw = (
            np.ones(n, dtype=np.float32)
            if sample_weights is None
            else np.asarray(sample_weights, dtype=np.float32).reshape(-1)
        )

        B = 512
        while B < n:
            B *= 2
        prows = np.zeros(B, dtype=np.int32)
        prows[:n] = index.padded_row_ids(rows)
        valid = np.zeros(B, dtype=np.float32)
        valid[:n] = 1.0
        yp = np.zeros(B, dtype=np.float32)
        yp[:n] = y
        swp = np.zeros(B, dtype=np.float32)
        swp[:n] = sw

        anchor = (
            self.anchor_ if self.anchor_ is not None else np.zeros(d, dtype=np.float32)
        )
        if self.params_ is not None and self.params_.shape[0] == d + 1:
            params0 = self.params_
        elif self.anchor_ is not None:
            params0 = np.concatenate([self.anchor_, np.zeros(1)]).astype(np.float32)
        else:
            params0 = np.zeros(d + 1, dtype=np.float32)

        params, f, diverged, mu = _fit_ce_rows(
            index._V, index._row_scale,
            jnp.asarray(prows), jnp.asarray(valid),
            jnp.asarray(yp), jnp.asarray(swp),
            jnp.asarray(float(n), dtype=jnp.float32),
            jnp.asarray(pos_weight, dtype=jnp.float32),
            jnp.asarray(self.reg_lambda / n, dtype=jnp.float32),
            jnp.asarray(anchor),
            jnp.asarray(params0),
            fit_intercept=self.fit_intercept,
            max_iter=self.max_iter,
            has_anchor=self.anchor_ is not None,
            center=self.scale == "centered",
        )
        if bool(diverged):
            raise ValueError("regression training diverged (nan/inf loss)")
        self.params_ = np.asarray(params)
        self.mu_ = np.asarray(mu)
        if self.verbose:
            print(f"fit_rows done: loss={float(f):.5f}")
        return self

    def deferred_fit_rows(self, index, rows, y, sample_weights=None):
        """The fit_rows device arguments packaged as a DeferredVector: the
        index fuses the fit INTO the next query dispatch
        (MultiscaleIndex._query_logistic) — one device round-trip per
        LogReg2 feedback round. Apply the returned 'fit' payload with
        `apply_fit_result` to keep warm starts working."""
        from ..ops.frame_scoring import DeferredLogistic

        assert self.loss_kind == "ce"
        rows = np.asarray(rows, dtype=np.int64)
        y = np.asarray(y, dtype=np.float32).reshape(-1)
        n = rows.shape[0]
        d = int(index._V.shape[1])
        assert n == y.shape[0] and n > 0

        if self.class_weights == "balanced":
            npos = max(int((y == 1).sum()), 1)
            nneg = max(int((y == 0).sum()), 1)
            pos_weight = nneg / npos
        else:
            pos_weight = float(self.class_weights or 1.0)
        sw = (
            np.ones(n, dtype=np.float32)
            if sample_weights is None
            else np.asarray(sample_weights, dtype=np.float32).reshape(-1)
        )
        B = 512
        while B < n:
            B *= 2
        prows = np.zeros(B, dtype=np.int32)
        prows[:n] = index.padded_row_ids(rows)
        valid = np.zeros(B, dtype=np.float32)
        valid[:n] = 1.0
        yp = np.zeros(B, dtype=np.float32)
        yp[:n] = y
        swp = np.zeros(B, dtype=np.float32)
        swp[:n] = sw
        anchor = (
            self.anchor_ if self.anchor_ is not None
            else np.zeros(d, dtype=np.float32)
        )
        if self.params_ is not None and self.params_.shape[0] == d + 1:
            params0 = self.params_
        elif self.anchor_ is not None:
            params0 = np.concatenate([self.anchor_, np.zeros(1)]).astype(np.float32)
        else:
            params0 = np.zeros(d + 1, dtype=np.float32)
        return DeferredLogistic(
            prows=prows, valid=valid, y=yp, sw=swp,
            n_real=np.float32(n), pos_weight=np.float32(pos_weight),
            reg_weight=np.float32(self.reg_lambda / n),
            anchor=np.asarray(anchor, np.float32),
            params0=np.asarray(params0, np.float32),
            fit_intercept=self.fit_intercept, max_iter=self.max_iter,
            has_anchor=self.anchor_ is not None,
            center=self.scale == "centered",
            model=self,
        )

    def apply_fit_result(self, fit: dict):
        if bool(fit["diverged"]):
            raise ValueError("regression training diverged (nan/inf loss)")
        self.params_ = np.asarray(fit["params"])
        self.mu_ = np.asarray(fit["mu"])

    def get_coeff(self) -> np.ndarray:
        assert self.params_ is not None
        return self.params_[:-1].copy()

    def get_intercept(self) -> float:
        """Intercept in un-centered input space: b - w @ mu."""
        assert self.params_ is not None
        return float(self.params_[-1] - self.params_[:-1] @ self.mu_)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        assert self.params_ is not None
        X = np.asarray(X, dtype=np.float32) - self.mu_
        logits = X @ self.params_[:-1] + (self.params_[-1] if self.fit_intercept else 0.0)
        return (1.0 / (1.0 + np.exp(-logits))).reshape(-1, 1)

    def score_raw(self, X: np.ndarray) -> np.ndarray:
        """Uncalibrated linear scores (used for ranking)."""
        assert self.params_ is not None
        X = np.asarray(X, dtype=np.float32) - self.mu_
        return X @ self.params_[:-1] + (self.params_[-1] if self.fit_intercept else 0.0)


class LogisticRegression(_LinearProbeBase):
    loss_kind = "ce"


class RankRegression(_LinearProbeBase):
    """Pairwise-rank-loss probe; no intercept by default (matches reference
    RankingRegModule bias=False)."""

    loss_kind = "rank"

    def __init__(self, **kwargs):
        kwargs.setdefault("fit_intercept", False)
        kwargs.setdefault("class_weights", None)
        super().__init__(**kwargs)
