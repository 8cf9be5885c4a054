"""Pairwise ranking losses and the O(n log n) sort-based gradient.

Re-derivation of the reference's rank-loss stack
(`/root/reference/seesaw/rank_loss.py`) in jnp:

- dense O(n²) pairwise hinge and logistic losses (used by the multi-reg
  fit where n is small per round);
- the fast zero-margin pairwise-rank gradient: for each element, the
  gradient of the summed hinge loss equals 2x its *net reversal count* —
  the displacement between its position in the (target, score)-lexicographic
  order and the (score, -target)-lexicographic ("anti-stable") order. Three
  sorts instead of an n x n matrix; translates directly to XLA sorts on TPU.

All functions are jit-friendly (static shapes, no data-dependent control
flow) and used inside LBFGS closures.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sign(x):
    return jnp.sign(x)


def pairwise_rank_loss_matrix(target: jnp.ndarray, scores: jnp.ndarray, *, margin: float):
    """(n,n) hinge loss per ordered pair: max(0, margin - y_ij * s_ij) with
    y_ij = sign(t_i - t_j), s_ij = s_i - s_j; pairs with equal targets
    contribute 0 (their constant margin term is removed)."""
    t_ij = _sign(target[:, None] - target[None, :])
    s_ij = scores[:, None] - scores[None, :]
    viol = margin - t_ij * s_ij
    # hinge via where() so the boundary case (equal scores, unequal targets)
    # is *active* and passes gradient — the reference counts those pairs as
    # inversions ("equal is needed..."), and the sorted fast gradient's
    # anti-stable tie-breaking depends on this convention. jnp.clip would
    # split the tie gradient 0.5/0.5 instead.
    loss = jnp.where(viol >= 0, viol, 0.0)
    return loss - margin * (t_ij == 0)


def pairwise_logistic_loss_matrix(target: jnp.ndarray, scores: jnp.ndarray):
    """(n,n) logistic loss log(1 + exp(-s_ij * y_ij)) for pairs with
    different targets, 0 otherwise."""
    t_ij = _sign(target[:, None] - target[None, :])
    s_ij = scores[:, None] - scores[None, :]
    # softplus for stability; mask zero-target pairs exactly
    loss = jax.nn.softplus(-s_ij * t_ij)
    return jnp.where(t_ij != 0, loss, 0.0)


def pairwise_rank_loss_sum(
    target, scores, *, margin: float, return_max_inversions=False, valid=None
):
    """Column-summed pairwise hinge loss (reference aggregate='sum').

    ``valid`` masks padded rows: pairs involving an invalid element
    contribute neither loss nor inversion counts (jit-friendly batching)."""
    loss = pairwise_rank_loss_matrix(target, scores, margin=margin)
    t_ij = _sign(target[:, None] - target[None, :])
    comparable = (t_ij != 0).astype(loss.dtype)
    if valid is not None:
        pair_ok = (valid[:, None] & valid[None, :]).astype(loss.dtype)
        loss = loss * pair_ok
        comparable = comparable * pair_ok
    loss = loss.sum(axis=0)
    if return_max_inversions:
        return loss, comparable.sum(axis=0)
    return loss


def pairwise_logistic_loss_sum(target, scores, *, return_max_inversions=False, valid=None):
    loss = pairwise_logistic_loss_matrix(target, scores)
    t_ij = _sign(target[:, None] - target[None, :])
    comparable = (t_ij != 0).astype(loss.dtype)
    if valid is not None:
        pair_ok = (valid[:, None] & valid[None, :]).astype(loss.dtype)
        loss = loss * pair_ok
        comparable = comparable * pair_ok
    loss = loss.sum(axis=0)
    if return_max_inversions:
        return loss, comparable.sum(axis=0)
    return loss


def _lexsort2(primary: jnp.ndarray, secondary: jnp.ndarray) -> jnp.ndarray:
    """Indices sorting by primary asc, ties by secondary asc, stable."""
    return jnp.lexsort((secondary, primary))


@jax.jit
def quick_pairwise_gradient_parts(target: jnp.ndarray, scores: jnp.ndarray):
    """Gradient of sum-pairwise hinge loss at margin 0, via sorting.

    Returns (grads, max_reversals, total_pairs):
      grads: d/ds_i of sum_ij max(0, -y_ij s_ij)  — equals 2 * net reversals
      max_reversals: per-element count of comparable pairs (different target)
      total_pairs: total ordered comparable pairs (n² - Σ group²)
    """
    n = target.shape[0]
    sindex = _lexsort2(target, scores)  # (target, score)-sorted order
    starget = target[sindex]
    sscores = scores[sindex]
    invsindex = jnp.argsort(sindex, stable=True)

    # anti-stable score sort: equal scores with unequal targets must permute
    # in reverse so boundary pairs (equal score, different target) still get
    # nonzero gradient, matching the margin-0 hinge subgradient convention.
    final_indices = _lexsort2(sscores, -starget)
    reverse_indices = jnp.argsort(final_indices, stable=True)
    net_reversals = (reverse_indices - jnp.arange(n)).astype(jnp.float32)

    # per-group counts of equal targets (groups are consecutive after sort)
    new_group = jnp.concatenate(
        [jnp.ones((1,), dtype=jnp.int32),
         (starget[1:] != starget[:-1]).astype(jnp.int32)]
    )
    group_id = jnp.cumsum(new_group) - 1
    counts = jax.ops.segment_sum(jnp.ones(n, jnp.float32), group_id, num_segments=n)
    elem_count = counts[group_id]
    max_reversals = (n - elem_count).astype(jnp.float32)
    total_pairs = (n * n - jnp.sum(counts * counts)).astype(jnp.float32)

    return 2.0 * net_reversals[invsindex], max_reversals[invsindex], total_pairs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cheap_pairwise_rank_loss(target: jnp.ndarray, scores: jnp.ndarray, normalized: bool = True):
    """Per-element |gradient| of the zero-margin pairwise rank loss, with a
    custom VJP that backpropagates the true (sorted) gradient. Matches the
    reference `_CheapPairwiseRankingLoss` autograd function: the forward
    value is the net-inversion magnitude (informative as a loss surrogate),
    the backward pass is exact for the underlying hinge loss."""
    grads, _, total_pairs = quick_pairwise_gradient_parts(target, scores)
    factor = jnp.where(total_pairs > 0, 1.0 / jnp.maximum(total_pairs, 1.0), 1.0) if normalized else 1.0
    return jnp.abs(grads) * factor


def _cprl_fwd(target, scores, normalized):
    grads, _, total_pairs = quick_pairwise_gradient_parts(target, scores)
    if normalized:
        factor = jnp.where(total_pairs > 0, 1.0 / jnp.maximum(total_pairs, 1.0), 1.0)
    else:
        factor = jnp.asarray(1.0, dtype=jnp.float32)
    return jnp.abs(grads) * factor, (grads, factor)


def _cprl_bwd(normalized, res, g):
    grads, factor = res
    return (None, grads * factor * g)


cheap_pairwise_rank_loss.defvjp(_cprl_fwd, _cprl_bwd)


def signed_inversions_matrix(target: jnp.ndarray, scores: jnp.ndarray, *, margin: float):
    """(n,n) ±1 matrix of margin violations (reference `ref_signed_inversions`)."""
    t_ij = _sign(target[:, None] - target[None, :])
    s_ij = scores[:, None] - scores[None, :] - margin * t_ij
    neg = (t_ij < 0) & (s_ij >= 0)
    pos = (t_ij > 0) & (s_ij <= 0)
    return pos.astype(jnp.float32) - neg.astype(jnp.float32)
