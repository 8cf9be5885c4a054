"""Multi-regularized per-round fit — the 'seesaw' method's RegModule.

jit re-derivation of the reference trainer (`/root/reference/seesaw/loops/
multi_reg.py:24-180` and `multi_reg_module.py:38-167`): a single weight
vector (or a 2-head target/confusion pair) optimized from the normalized
query vector with the 4-term loss

    L = label_loss + reg_data * w^T(XLX)w
               + reg_norm * (cosh(log w.w) - 1) + reg_query * (1 - w_hat.q_hat)/2

where label_loss is balanced weighted BCE or a max-inversion-normalized
pairwise rank/logistic loss, per-example weights are 1/(tiles in image),
and XLX is the trace-normalized graph-Laplacian quadratic form. LBFGS with
strong Wolfe; the whole fit is one device dispatch. Batch rows are padded
to power-of-two buckets (weight-0, pair-masked) so recompiles stay bounded.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lbfgs import lbfgs_minimize
from ..ops.rank_loss import pairwise_logistic_loss_sum, pairwise_rank_loss_sum


def _normalize(v):
    return v / jnp.sqrt(jnp.sum(v * v) + 1e-30)


@functools.partial(
    jax.jit,
    static_argnames=("label_loss_type", "pos_weight_balanced", "max_iter"),
)
def _fit_reg(
    X, y, sample_w, valid, qvec_hat, xlx, w0,
    rank_loss_margin, pos_weight_value,
    reg_data_lambda, reg_norm_lambda, reg_query_lambda,
    *,
    label_loss_type: str,
    pos_weight_balanced: bool,
    max_iter: int,
):
    def loss_fn(w):
        return multi_reg_loss(
            w, X, y, sample_w, valid, qvec_hat, xlx,
            rank_loss_margin, pos_weight_value,
            reg_data_lambda, reg_norm_lambda, reg_query_lambda,
            label_loss_type=label_loss_type,
            pos_weight_balanced=pos_weight_balanced,
        )

    res = lbfgs_minimize(loss_fn, w0, max_iter=max_iter, history=10)
    return _normalize(res.x), res.f, res.diverged


def multi_reg_loss(
    w, X, y, sample_w, valid, qvec_hat, xlx,
    rank_loss_margin, pos_weight_value,
    reg_data_lambda, reg_norm_lambda, reg_query_lambda,
    *,
    label_loss_type: str,
    pos_weight_balanced: bool,
):
    """The 4-term 'seesaw' objective (reference `loops/multi_reg.py:95-150`):
    label loss + cosh-log norm penalty + XLX data term + query-cosine term.
    Exposed standalone so tests can differentially check the exact loss."""
    logits = X @ w
    sw = sample_w
    pos_total = ((y == 1).astype(jnp.float32) * sw).sum()
    orig_sum = sw.sum()
    neg_total = orig_sum - pos_total

    if label_loss_type == "ce_loss":
        ce = jax.nn.softplus(-logits) * y + jax.nn.softplus(logits) * (1.0 - y)
        if pos_weight_balanced:
            pw = (neg_total + 1.0) / (pos_total + 1.0)
        else:
            pw = pos_weight_value
        sw2 = jnp.where(y == 1, sw * pw, sw)
        sw2 = sw2 * orig_sum / jnp.maximum(sw2.sum(), 1e-30)
        loss_labels = (ce * sw2).sum()
    elif label_loss_type in ("pairwise_rank_loss", "pairwise_logistic_loss"):
        if label_loss_type == "pairwise_rank_loss":
            per_item, max_inv = pairwise_rank_loss_sum(
                y, logits, margin=rank_loss_margin,
                return_max_inversions=True, valid=valid,
            )
        else:
            per_item, max_inv = pairwise_logistic_loss_sum(
                y, logits, return_max_inversions=True, valid=valid
            )
        per_norm = per_item / jnp.maximum(max_inv, 1.0)
        have_both = (pos_total > 0) & (neg_total > 0)
        loss_labels = jnp.where(have_both, (per_norm * sw).sum(), 0.0)
    else:
        raise ValueError(label_loss_type)

    w_hat = _normalize(w)
    ww = jnp.maximum(w @ w, 1e-30)
    loss_norm = reg_norm_lambda * (jnp.cosh(jnp.log(ww)) - 1.0)
    loss_datareg = reg_data_lambda * (w @ (xlx @ w))
    loss_queryreg = reg_query_lambda * (1.0 - w_hat @ qvec_hat) / 2.0
    return loss_labels + loss_norm + loss_datareg + loss_queryreg


def _pad_pow2(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


class RegFit:
    """Host wrapper: pads the per-round batch and runs the jitted fit."""

    def __init__(
        self,
        *,
        xlx: np.ndarray,
        qvec: np.ndarray,
        label_loss_type: str,
        rank_loss_margin: float = 0.0,
        pos_weight="balanced",
        reg_data_lambda: float,
        reg_norm_lambda: float,
        reg_query_lambda: float,
        max_iter: int = 100,
        verbose: bool = False,
        **_unused,
    ):
        assert label_loss_type in ("ce_loss", "pairwise_rank_loss", "pairwise_logistic_loss")
        q = np.asarray(qvec, dtype=np.float32).reshape(-1)
        nq = np.linalg.norm(q)
        assert nq > 0, "query vector must be nonzero"
        self.qvec_hat = q / nq
        self.xlx = np.asarray(xlx, dtype=np.float32)
        self.label_loss_type = label_loss_type
        self.rank_loss_margin = float(rank_loss_margin)
        self.pos_weight = pos_weight
        self.reg_data_lambda = float(reg_data_lambda)
        self.reg_norm_lambda = float(reg_norm_lambda)
        self.reg_query_lambda = float(reg_query_lambda)
        self.max_iter = max_iter
        self.verbose = verbose
        self.coeff_: Optional[np.ndarray] = None

    def fit(self, X: np.ndarray, y: np.ndarray, sample_weights: Optional[np.ndarray] = None):
        X = np.asarray(X, dtype=np.float32)
        y = np.asarray(y, dtype=np.float32).reshape(-1)
        n, d = X.shape if X.size else (0, self.qvec_hat.shape[0])
        sw = (
            np.ones(n, dtype=np.float32)
            if sample_weights is None
            else np.asarray(sample_weights, dtype=np.float32).reshape(-1)
        )
        if n > 0:
            X = X - X.mean(axis=0, keepdims=True)  # centering, like reference

        npad = _pad_pow2(max(n, 1))
        Xp = np.zeros((npad, d), dtype=np.float32)
        yp = np.zeros(npad, dtype=np.float32)
        swp = np.zeros(npad, dtype=np.float32)
        vp = np.zeros(npad, dtype=bool)
        Xp[:n], yp[:n], swp[:n], vp[:n] = X, y, sw, True

        coeff, f, diverged = _fit_reg(
            jnp.asarray(Xp), jnp.asarray(yp), jnp.asarray(swp), jnp.asarray(vp),
            jnp.asarray(self.qvec_hat), jnp.asarray(self.xlx),
            jnp.asarray(self.qvec_hat),  # w0 = normalized query vector
            jnp.asarray(self.rank_loss_margin, dtype=jnp.float32),
            jnp.asarray(
                self.pos_weight if isinstance(self.pos_weight, float) else 1.0,
                dtype=jnp.float32,
            ),
            jnp.asarray(self.reg_data_lambda, dtype=jnp.float32),
            jnp.asarray(self.reg_norm_lambda, dtype=jnp.float32),
            jnp.asarray(self.reg_query_lambda, dtype=jnp.float32),
            label_loss_type=self.label_loss_type,
            pos_weight_balanced=self.pos_weight == "balanced",
            max_iter=self.max_iter,
        )
        if bool(diverged):
            raise ValueError("multi-reg fit diverged (nan/inf)")
        self.coeff_ = np.asarray(coeff)
        if self.verbose:
            print(f"reg fit loss={float(f):.5f}")
        return self

    def deferred_fit_rows(self, index, rows, y, sample_weights=None):
        """Package the fit as a DeferredVector: the index fuses the labeled-
        row gather + centering + 4-term LBFGS + the query over the fitted
        coefficient into ONE dispatch (MultiscaleIndex._query_multireg)."""
        from ..ops.frame_scoring import DeferredMultiReg

        rows = np.asarray(rows, dtype=np.int64)
        y = np.asarray(y, dtype=np.float32).reshape(-1)
        n = rows.shape[0]
        sw = (
            np.ones(n, dtype=np.float32)
            if sample_weights is None
            else np.asarray(sample_weights, dtype=np.float32).reshape(-1)
        )
        npad = _pad_pow2(max(n, 1))
        prows = np.zeros(npad, dtype=np.int32)
        prows[:n] = index.padded_row_ids(rows)
        vp = np.zeros(npad, dtype=bool)
        vp[:n] = True
        yp = np.zeros(npad, dtype=np.float32)
        yp[:n] = y
        swp = np.zeros(npad, dtype=np.float32)
        swp[:n] = sw
        return DeferredMultiReg(
            prows=prows, valid=vp, y=yp, sw=swp,
            qvec_hat=self.qvec_hat, xlx=self.xlx,
            rank_loss_margin=np.float32(self.rank_loss_margin),
            pos_weight_value=np.float32(
                self.pos_weight if isinstance(self.pos_weight, float) else 1.0
            ),
            pos_weight_balanced=self.pos_weight == "balanced",
            label_loss_type=self.label_loss_type,
            reg_data_lambda=np.float32(self.reg_data_lambda),
            reg_norm_lambda=np.float32(self.reg_norm_lambda),
            reg_query_lambda=np.float32(self.reg_query_lambda),
            max_iter=self.max_iter,
        )

    def get_coeff(self) -> np.ndarray:
        assert self.coeff_ is not None
        return self.coeff_.copy()


def two_head_loss(
    flat, X, ys, sample_w, valid, qvec_hat,
    reg_norm_lambda, reg_query_lambda,
):
    """The 2-head (target + confusion) objective, value-equal to the
    reference `MultiRegModule._step` (`loops/multi_reg_module.py:65-118`):
    per-head BCE on normalized-head logits + soft cross-entropy among heads
    for rows with any label + cosh(log ||W_h||) norm penalty + query-angle
    anchors on BOTH heads. Exposed standalone for the differential test."""
    d = X.shape[1]
    W = flat.reshape(2, d)
    Wn = W / jnp.sqrt(jnp.sum(W * W, axis=1, keepdims=True) + 1e-30)
    logits = X @ Wn.T  # (n, 2)

    # vertical: per-head BCE, summed over heads
    ce = jax.nn.softplus(-logits) * ys + jax.nn.softplus(logits) * (1.0 - ys)
    vertical = ce.sum(axis=1)
    vertical_sum = vertical @ sample_w

    # horizontal: soft cross-entropy among heads for rows with any label
    near = ys.sum(axis=1)
    logp = jax.nn.log_softmax(logits, axis=1)
    xent = -(ys * logp).sum(axis=1)
    mask = (near > 0) & valid
    horizontal_sum = (jnp.where(mask, xent, 0.0) * sample_w).sum()

    norms = jnp.sqrt(jnp.sum(W * W, axis=1) + 1e-30)
    loss_norm = reg_norm_lambda * (jnp.cosh(jnp.log(norms)) - 1.0).sum()
    loss_q1 = reg_query_lambda * (1.0 - Wn[0] @ qvec_hat) / 2.0
    loss_q2 = reg_query_lambda * (1.0 - Wn[1] @ qvec_hat) / 2.0
    return vertical_sum + horizontal_sum + loss_norm + loss_q1 + loss_q2


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _fit_two_head(
    X, ys, sample_w, valid, qvec_hat, W0,
    reg_norm_lambda, reg_query_lambda,
    *,
    max_iter: int,
):
    d = X.shape[1]

    def loss_fn(flat):
        return two_head_loss(
            flat, X, ys, sample_w, valid, qvec_hat,
            reg_norm_lambda, reg_query_lambda,
        )

    res = lbfgs_minimize(loss_fn, W0.reshape(-1), max_iter=max_iter, history=10)
    W = res.x.reshape(2, d)
    Wn = W / jnp.sqrt(jnp.sum(W * W, axis=1, keepdims=True) + 1e-30)
    return Wn, res.f, res.diverged


class MultiRegFit:
    """Two-head (target + confusion-class) variant (MultiRegModule)."""

    def __init__(
        self,
        *,
        qvec: np.ndarray,
        reg_norm_lambda: float,
        reg_query_lambda: float,
        max_iter: int = 100,
        verbose: bool = False,
        **_unused,
    ):
        q = np.asarray(qvec, dtype=np.float32).reshape(-1)
        nq = np.linalg.norm(q)
        assert nq > 0
        self.qvec_hat = q / nq
        self.reg_norm_lambda = float(reg_norm_lambda)
        self.reg_query_lambda = float(reg_query_lambda)
        self.max_iter = max_iter
        self.verbose = verbose
        self.W_: Optional[np.ndarray] = None

    def fit(self, X: np.ndarray, ys: np.ndarray, sample_weights=None):
        X = np.asarray(X, dtype=np.float32)
        ys = np.asarray(ys, dtype=np.float32)
        assert ys.ndim == 2 and ys.shape[1] == 2
        n, d = X.shape if X.size else (0, self.qvec_hat.shape[0])
        sw = (
            np.ones(n, dtype=np.float32)
            if sample_weights is None
            else np.asarray(sample_weights, dtype=np.float32).reshape(-1)
        )
        if n > 0:
            X = X - X.mean(axis=0, keepdims=True)

        npad = _pad_pow2(max(n, 1))
        Xp = np.zeros((npad, d), dtype=np.float32)
        yp = np.zeros((npad, 2), dtype=np.float32)
        swp = np.zeros(npad, dtype=np.float32)
        vp = np.zeros(npad, dtype=bool)
        Xp[:n], yp[:n], swp[:n], vp[:n] = X, ys, sw, True

        # deterministic near-query init for both heads (reference used the
        # torch default random init; anchoring at q is strictly better here)
        rng = np.random.default_rng(0)
        W0 = np.stack(
            [self.qvec_hat, self.qvec_hat + 0.01 * rng.normal(size=d).astype(np.float32)]
        )
        W, f, diverged = _fit_two_head(
            jnp.asarray(Xp), jnp.asarray(yp), jnp.asarray(swp), jnp.asarray(vp),
            jnp.asarray(self.qvec_hat), jnp.asarray(W0),
            jnp.asarray(self.reg_norm_lambda, dtype=jnp.float32),
            jnp.asarray(self.reg_query_lambda, dtype=jnp.float32),
            max_iter=self.max_iter,
        )
        if bool(diverged):
            raise ValueError("two-head multi-reg fit diverged")
        self.W_ = np.asarray(W)
        return self

    def get_coeff(self) -> np.ndarray:
        assert self.W_ is not None
        return self.W_[0].copy()

    def get_confusion_vec(self) -> np.ndarray:
        assert self.W_ is not None
        return self.W_[1].copy()
