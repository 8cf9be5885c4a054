"""Jit-compiled L-BFGS with strong-Wolfe line search.

The per-round feedback fits (logistic / rank / multi-reg regressions,
SURVEY.md §7 P4) are small dense problems (~512 params) optimized with
LBFGS(strong_wolfe) in the reference (torch `opt.LBFGS`, e.g.
`/root/reference/seesaw/logistic_regression.py:63-65`). Here the whole
optimizer — two-loop recursion over a fixed-size circular history plus a
bracket/zoom Wolfe line search — is a single XLA program built from
`lax.while_loop`, so a feedback round costs one device dispatch.

Everything is fixed-shape: history buffers are (m, d) with a validity
counter; the line search is a bounded state machine.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LBFGSResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    n_iter: jnp.ndarray
    converged: jnp.ndarray  # grad-norm tolerance reached
    diverged: jnp.ndarray  # NaN/inf encountered


_C1 = 1e-4
_C2 = 0.9
_MAX_LS = 20


def _strong_wolfe(value_and_grad: Callable, x, d, f0, g0, alpha0):
    """Find alpha satisfying strong Wolfe conditions along direction d.

    Bracket-then-zoom with bisection (N&W alg. 3.5/3.6, bisection zoom for
    compile simplicity). Returns (alpha, f_new, g_new, n_evals). Falls back
    to the best Armijo point seen if the curvature condition can't be met
    within the eval budget.
    """
    dphi0 = g0 @ d

    def phi(a):
        f, g = value_and_grad(x + a * d)
        return f, g, g @ d

    # state: (stage, a_lo, a_hi, a_prev, phi_prev, a, best_a, best_phi, best_f?, done, f, g, i)
    # stage 0 = bracketing, 1 = zoom
    class S(NamedTuple):
        stage: jnp.ndarray
        a_lo: jnp.ndarray
        phi_lo: jnp.ndarray
        a_hi: jnp.ndarray
        a_prev: jnp.ndarray
        phi_prev: jnp.ndarray
        a: jnp.ndarray
        done: jnp.ndarray
        alpha: jnp.ndarray
        f: jnp.ndarray
        g: jnp.ndarray
        i: jnp.ndarray

    f0_ = f0

    def cond(s: S):
        return (~s.done) & (s.i < _MAX_LS)

    def body(s: S):
        f_a, g_a, dphi_a = phi(s.a)

        def bracket_step():
            armijo_fail = (f_a > f0_ + _C1 * s.a * dphi0) | (
                (s.i > 0) & (f_a >= s.phi_prev)
            )
            curvature_ok = jnp.abs(dphi_a) <= -_C2 * dphi0
            going_up = dphi_a >= 0

            # -> zoom(a_prev, a) when armijo fails; accept when wolfe holds;
            # -> zoom(a, a_prev) when slope turned positive; else expand.
            new_stage = jnp.where(armijo_fail | going_up, 1, 0)
            a_lo = jnp.where(armijo_fail, s.a_prev, s.a)
            phi_lo = jnp.where(armijo_fail, s.phi_prev, f_a)
            a_hi = jnp.where(armijo_fail, s.a, s.a_prev)
            done = (~armijo_fail) & curvature_ok
            next_a = jnp.where(
                done | (new_stage == 1), 0.5 * (a_lo + a_hi), jnp.minimum(s.a * 2.0, 1e8)
            )
            return S(
                stage=new_stage,
                a_lo=a_lo,
                phi_lo=phi_lo,
                a_hi=a_hi,
                a_prev=s.a,
                phi_prev=f_a,
                a=jnp.where(done, s.a, next_a),
                done=done,
                alpha=jnp.where(done, s.a, s.alpha),
                f=jnp.where(done, f_a, s.f),
                g=jnp.where(done[..., None] if s.g.ndim else done, g_a, s.g),
                i=s.i + 1,
            )

        def zoom_step():
            armijo_fail = (f_a > f0_ + _C1 * s.a * dphi0) | (f_a >= s.phi_lo)
            curvature_ok = jnp.abs(dphi_a) <= -_C2 * dphi0
            done = (~armijo_fail) & curvature_ok

            # shrink the bracket
            a_hi1 = jnp.where(armijo_fail, s.a, s.a_hi)
            same_side = dphi_a * (s.a_hi - s.a_lo) >= 0
            a_hi2 = jnp.where((~armijo_fail) & same_side, s.a_lo, a_hi1)
            a_lo2 = jnp.where(armijo_fail, s.a_lo, s.a)
            phi_lo2 = jnp.where(armijo_fail, s.phi_lo, f_a)
            next_a = 0.5 * (a_lo2 + a_hi2)
            return S(
                stage=s.stage,
                a_lo=a_lo2,
                phi_lo=phi_lo2,
                a_hi=a_hi2,
                a_prev=s.a,
                phi_prev=f_a,
                a=jnp.where(done, s.a, next_a),
                done=done,
                alpha=jnp.where(done, s.a, s.alpha),
                f=jnp.where(done, f_a, s.f),
                g=jnp.where(done[..., None] if s.g.ndim else done, g_a, s.g),
                i=s.i + 1,
            )

        return jax.tree.map(
            lambda b, z: jnp.where(s.stage == 0, b, z), bracket_step(), zoom_step()
        )

    init = S(
        stage=jnp.asarray(0),
        a_lo=jnp.asarray(0.0, x.dtype),
        phi_lo=f0_,
        a_hi=jnp.asarray(0.0, x.dtype),
        a_prev=jnp.asarray(0.0, x.dtype),
        phi_prev=f0_,
        a=jnp.asarray(alpha0, x.dtype),
        done=jnp.asarray(False),
        alpha=jnp.asarray(0.0, x.dtype),
        f=f0_,
        g=g0,
        i=jnp.asarray(0),
    )
    out = lax.while_loop(cond, body, init)

    # if the search never satisfied Wolfe, take the last trial point if it at
    # least decreased f; otherwise keep alpha=0 (no step).
    f_last, g_last, _ = phi(out.a)
    fallback_ok = (~out.done) & (f_last < f0_)
    alpha = jnp.where(out.done, out.alpha, jnp.where(fallback_ok, out.a, 0.0))
    f_new = jnp.where(out.done, out.f, jnp.where(fallback_ok, f_last, f0_))
    g_new = jnp.where(out.done, out.g, jnp.where(fallback_ok, g_last, g0))
    return alpha, f_new, g_new


class _State(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    S: jnp.ndarray  # (m, d) s_k history
    Y: jnp.ndarray  # (m, d) y_k history
    rho: jnp.ndarray  # (m,)
    head: jnp.ndarray  # next write slot
    n_hist: jnp.ndarray
    k: jnp.ndarray
    done: jnp.ndarray
    diverged: jnp.ndarray


def lbfgs_minimize(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    *,
    max_iter: int = 100,
    history: int = 10,
    tol_grad: float = 1e-5,
    tol_change: float = 1e-9,
) -> LBFGSResult:
    """Minimize ``fun`` (R^d -> R) from ``x0``. Jit-safe; call inside jit or
    wrap with jax.jit(functools.partial(...)).
    """
    d = x0.shape[0]
    m = history
    value_and_grad = jax.value_and_grad(fun)

    def two_loop(g, S, Y, rho, head, n_hist):
        # q <- g; iterate newest -> oldest
        def bwd(i, carry):
            q, alphas = carry
            pos = (head - 1 - i) % m
            valid = i < n_hist
            a = jnp.where(valid, rho[pos] * (S[pos] @ q), 0.0)
            q = q - a * Y[pos] * valid
            return q, alphas.at[pos].set(a)

        q, alphas = lax.fori_loop(0, m, bwd, (g, jnp.zeros(m, x0.dtype)))

        # initial Hessian scaling gamma = s·y / y·y of newest pair
        newest = (head - 1) % m
        have = n_hist > 0
        ys = S[newest] @ Y[newest]
        yy = Y[newest] @ Y[newest]
        gamma = jnp.where(have & (yy > 0), ys / jnp.maximum(yy, 1e-30), 1.0)
        r = gamma * q

        def fwd(i, r):
            pos = (head - n_hist + i) % m  # oldest -> newest
            valid = i < n_hist
            b = jnp.where(valid, rho[pos] * (Y[pos] @ r), 0.0)
            return r + (alphas[pos] - b) * S[pos] * valid

        return lax.fori_loop(0, m, fwd, r)

    def cond(s: _State):
        return (~s.done) & (~s.diverged) & (s.k < max_iter)

    def body(s: _State):
        direction = -two_loop(s.g, s.S, s.Y, s.rho, s.head, s.n_hist)
        # ensure descent; fall back to steepest descent if not
        descent = direction @ s.g
        direction = jnp.where(descent < 0, direction, -s.g)
        # first iteration: scale like torch (lr * min(1, 1/|g|_1) step start)
        alpha0 = jnp.where(
            s.k == 0, jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.abs(s.g).sum(), 1e-30)), 1.0
        )
        alpha, f_new, g_new = _strong_wolfe(value_and_grad, s.x, direction, s.f, s.g, alpha0)

        step = alpha * direction
        x_new = s.x + step
        y = g_new - s.g
        sy = step @ y
        update = sy > 1e-10

        S_new = jnp.where(update, s.S.at[s.head].set(step), s.S)
        Y_new = jnp.where(update, s.Y.at[s.head].set(y), s.Y)
        rho_new = jnp.where(
            update, s.rho.at[s.head].set(1.0 / jnp.maximum(sy, 1e-30)), s.rho
        )
        head_new = jnp.where(update, (s.head + 1) % m, s.head)
        n_new = jnp.where(update, jnp.minimum(s.n_hist + 1, m), s.n_hist)

        gmax = jnp.max(jnp.abs(g_new))
        no_progress = alpha == 0.0
        small_change = jnp.max(jnp.abs(step)) < tol_change
        done = (gmax <= tol_grad) | no_progress | small_change
        diverged = ~jnp.isfinite(f_new) | ~jnp.isfinite(g_new).all()

        return _State(
            x=x_new, f=f_new, g=g_new,
            S=S_new, Y=Y_new, rho=rho_new, head=head_new, n_hist=n_new,
            k=s.k + 1, done=done, diverged=diverged,
        )

    f0, g0 = value_and_grad(x0)
    init = _State(
        x=x0, f=f0, g=g0,
        S=jnp.zeros((m, d), x0.dtype), Y=jnp.zeros((m, d), x0.dtype),
        rho=jnp.zeros(m, x0.dtype), head=jnp.asarray(0), n_hist=jnp.asarray(0),
        k=jnp.asarray(0),
        done=jnp.max(jnp.abs(g0)) <= tol_grad,
        diverged=~jnp.isfinite(f0) | ~jnp.isfinite(g0).all(),
    )
    out = lax.while_loop(cond, body, init)
    return LBFGSResult(x=out.x, f=out.f, n_iter=out.k, converged=out.done,
                       diverged=out.diverged)


@functools.partial(jax.jit, static_argnames=("fun", "max_iter", "history"))
def lbfgs_minimize_jit(fun, x0, *, max_iter: int = 100, history: int = 10):
    return lbfgs_minimize(fun, x0, max_iter=max_iter, history=history)
