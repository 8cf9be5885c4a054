"""kNN-based rankers: Bayesian neighbor voting + label-propagation scoring.

Reimplements the reference rankers (`/root/reference/seesaw/research/
knn_methods.py:8-199`) over the fixed-degree graph:

- SimpleKNNRanker: per-vertex score = (pseudo-count * prior + positive
  neighbor votes) / (pseudo-count + labeled neighbor count); labels clamp
  their own vertex. Updates touch only the reverse neighborhood of the
  labeled vertex.
- BaseLabelPropagationRanker / LabelPropagationRanker2: normalize + sigmoid
  calibrate base scores into priors, run device label propagation after
  each batch that contains negatives.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

from ..knn_graph import KNNGraph, SymmetricWeights, rbf_kernel, symmetrize_weights
from ..label_propagation import LabelPropagation


def _xp(x):
    """numpy for host arrays, jax.numpy for device arrays — the calibration
    helpers run wherever the scores already live (device scores at serving
    scale never round-trip through the host)."""
    import jax

    if isinstance(x, jax.Array):
        import jax.numpy as jnp

        return jnp
    return np


def sigmoid(x):
    xp = _xp(x)
    return 1.0 / (1.0 + xp.exp(-x))


def normalize_scores(scores, epsilon: float):
    """Affine-map scores into (epsilon, 1-epsilon); all-equal maps to 0.5.
    Reference `research/knn_methods.py` (f32 throughout); accepts host or
    device arrays (device input syncs once per query on the gap check)."""
    assert epsilon < 0.5
    xp = _xp(scores)
    lo = scores.min()
    gap = scores.max() - lo
    if float(gap) == 0:
        return xp.full_like(scores, 0.5)
    x = (scores - lo) / gap
    return x * (1 - 2 * epsilon) + epsilon


@functools.lru_cache(maxsize=1)
def _scatter_labels_fn():
    import jax

    # donated: the round's scatter updates the persistent (N,) label state
    # in place instead of copying it
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def f(labels, is_labeled, ids, vals):
        labels = labels.at[ids].set(vals, mode="drop")
        is_labeled = is_labeled.at[ids].set(True, mode="drop")
        return labels, is_labeled

    return f


def _scatter_labels(labels, is_labeled, ids, vals):
    return _scatter_labels_fn()(labels, is_labeled, ids, vals)


class SimpleKNNRanker:
    def __init__(self, knng: KNNGraph, init_scores: Optional[np.ndarray] = None):
        self.knng = knng
        n = knng.nvecs
        if init_scores is None:
            self.init_numerators = np.ones(n) * 0.1
        else:
            self.set_base_scores(init_scores)
        self.pscount = 1.0
        self.numerators = np.zeros(n)
        self.denominators = np.zeros(n)
        self.labels = np.zeros(n)
        self.is_labeled = np.zeros(n)
        self._rev_indptr, self._rev_src = knng.reverse_adjacency()

    def set_base_scores(self, scores: np.ndarray):
        assert scores.shape[0] == self.knng.nvecs
        self.init_numerators = sigmoid(2 * scores)

    def current_scores(self) -> np.ndarray:
        num = self.pscount * self.init_numerators + self.numerators
        denom = self.pscount + self.denominators
        estimates = num / denom
        return self.labels * self.is_labeled + estimates * (1 - self.is_labeled)

    def update(self, idxs, labels):
        for idx, label in zip(idxs, labels):
            idx, label = int(idx), float(label)
            assert np.isclose(label, 0) or np.isclose(label, 1)
            if self.is_labeled[idx] > 0:
                delta_num = label - self.labels[idx]
                delta_denom = 0
            else:
                delta_num = label
                delta_denom = 1
            self.labels[idx] = label
            self.is_labeled[idx] = 1
            # vertices that list idx among their neighbors
            rev = self._rev_src[self._rev_indptr[idx] : self._rev_indptr[idx + 1]]
            self.numerators[rev] += delta_num
            self.denominators[rev] += delta_denom

    def top_k(self, k: Optional[int], unlabeled_only: bool = True):
        if unlabeled_only:
            subset = np.where(self.is_labeled < 1)[0]
        else:
            subset = np.arange(self.knng.nvecs)
        raw = self.current_scores()
        order = np.argsort(-raw[subset])
        if k is not None:
            order = order[:k]
        top = subset[order]
        return top, raw[top]


class BaseLabelPropagationRanker:
    def __init__(
        self,
        *,
        nvecs: int,
        normalize_scores: bool,
        sigmoid_before_propagate: bool,
        calib_a: float,
        calib_b: float,
        prior_weight: float,
        normalize_epsilon: Optional[float] = None,
        warm_start: bool = False,
        **_other,
    ):
        self.nvecs = nvecs
        self.normalize = normalize_scores
        if self.normalize:
            assert normalize_epsilon is not None
            self.epsilon = normalize_epsilon
        self.calib_a = calib_a
        self.calib_b = calib_b
        self.prior_weight = prior_weight
        self.sigmoid_before_propagate = sigmoid_before_propagate
        # opt-in serving optimization: start each round's Jacobi iteration
        # from the PREVIOUS round's converged scores instead of the prior.
        # The reference always starts from the prior
        # (/root/reference/seesaw/research/knn_methods.py:152), and the
        # fixed point is unique for reg_lambda > 0, so warm starting changes
        # only the convergence-stop iterate (within ~sqrt(epsilon)) while a
        # few new clicks barely perturb the solution — most iterations of a
        # feedback round are saved. Default OFF: fidelity paths keep the
        # reference's exact iterate.
        self.warm_start = warm_start
        self._scores_dev = None  # device-resident last propagation result
        # iterations of the most recent FUSED one-dispatch round (host int,
        # rides back with the ranked result); eager rounds report through
        # lp.last_result instead
        self.last_n_iter = None

        self.is_labeled = np.zeros(nvecs)
        self.labels = np.zeros(nvecs)
        self.prior_scores = None
        self._current_scores = None
        # device mode (engaged when set_base_scores receives a device array,
        # i.e. a device-built serving index): labels/is_labeled live
        # device-PERSISTENT and each feedback round scatters only the round's
        # clicked ordinals — the host mirrors above stay authoritative for
        # top_k/analysis. Mirrors the index's device-persistent exclusion
        # masks (indices/multiscale._device_exclusion).
        self._labels_dev = None
        self._is_labeled_dev = None
        self._pending: list = []  # (idx, label) staged since last flush
        # deferred propagation (device mode + windowed layout): `update`
        # stages the round and the NEXT rank_by_scores call fuses
        # scatter+propagate+rank into one dispatch (ops.propagation.
        # DeferredPropagation); host consumers flush eagerly first
        self._needs_prop = False

    def set_base_scores(self, init_scores: np.ndarray):
        assert init_scores.shape[0] == self.nvecs
        if self.normalize:
            init_scores = normalize_scores(init_scores, epsilon=self.epsilon)
        if self.sigmoid_before_propagate:
            self.prior_scores = sigmoid(self.calib_a * (init_scores + self.calib_b))
        else:
            self.prior_scores = init_scores
        self._needs_prop = False  # a fresh prior supersedes any staged round
        self._scores_dev = None  # ... and any warm-start iterate
        if self.is_labeled.sum() == 0:
            self._current_scores = self.prior_scores
        else:
            self._current_scores = self._propagate(self.prior_scores)

    def _propagate(self, scores):
        raise NotImplementedError

    def _propagation_start(self):
        """Start iterate for the next propagation: the prior (reference
        semantics) unless `warm_start` and a previous result exists."""
        if self.warm_start:
            if self._scores_dev is not None:
                return self._scores_dev
            if isinstance(self._current_scores, np.ndarray):
                return self._current_scores
        return self.prior_scores

    def update(self, idxs, labels):
        for idx, label in zip(idxs, labels):
            idx, label = int(idx), float(label)
            assert np.isclose(label, 0) or np.isclose(label, 1)
            self.labels[idx] = label
            self.is_labeled[idx] = 1
            self._pending.append((idx, label))
        num_neg = (self.labels[self.is_labeled > 0] == 0).sum()
        if num_neg > 0:
            if self._defer_available():
                # serving path: stage the round; the next rank_by_scores
                # fuses scatter+propagate+rank into one dispatch
                self._needs_prop = True
            else:
                self._current_scores = self._propagate(
                    self._propagation_start())
        # no negatives: scores unchanged (labels still clamp via current_scores)

    def _defer_available(self) -> bool:
        """Whether propagation may be deferred into the next ranking dispatch
        (overridden by LabelPropagationRanker2 for the windowed device mode)."""
        return False

    def _flush_propagation(self):
        """Run any staged propagation eagerly (host consumers, non-fusable
        indexes) and return the resulting scores."""
        if self._needs_prop:
            self._current_scores = self._propagate(self._propagation_start())
            self._needs_prop = False
        return self._current_scores

    def _ensure_device_labels(self) -> None:
        """First engagement of device label state: the host mirrors already
        include every staged click, so upload them whole and drop the staged
        list (nothing left to scatter)."""
        import jax.numpy as jnp

        if self._labels_dev is None:
            self._labels_dev = jnp.asarray(self.labels, dtype=jnp.float32)
            self._is_labeled_dev = jnp.asarray(self.is_labeled > 0)
            self._pending.clear()

    def _padded_pending(self):
        """The staged clicks as a padded (ids, vals) scatter pair. pow2
        buckets (min 64) bound the consuming programs' recompiles to
        log2(max clicks per round) shapes; out-of-range padding ids
        (= nvecs) are dropped by the scatter."""
        P = max(64, 1 << int(np.ceil(np.log2(max(len(self._pending), 1)))))
        ids = np.full(P, self.nvecs, dtype=np.int32)
        vals = np.zeros(P, dtype=np.float32)
        for j, (i, v) in enumerate(self._pending):
            ids[j] = i
            vals[j] = v
        return ids, vals

    def _deferred_state(self):
        """(labels_dev, is_labeled_dev, ids, vals) for the fused round:
        the persistent device label state WITHOUT flushing staged clicks —
        they ride as a padded scatter argument inside the fused program.
        `_commit_deferred` publishes the program's returned state."""
        self._ensure_device_labels()
        ids, vals = self._padded_pending()
        return self._labels_dev, self._is_labeled_dev, ids, vals

    def _commit_deferred(self, scores, labels_dev, is_labeled_dev,
                         n_iter: int, converged: bool):
        """Publish the fused round's returned state: device scores become
        current, the scattered label state replaces the persistent arrays,
        and the staged clicks are consumed."""
        self._labels_dev = labels_dev
        self._is_labeled_dev = is_labeled_dev
        self._pending.clear()
        self._current_scores = scores
        self._scores_dev = scores  # device-resident warm-start iterate
        self.last_n_iter = n_iter
        self._needs_prop = False
        if getattr(self, "lp", None) is not None and self.lp.verbose \
                and not converged:
            print(
                f"warning: propagation did not converge after {n_iter} iters"
            )

    def _device_label_state(self):
        """Device-persistent (labels, is_labeled): the first call in device
        mode uploads the full host mirrors once; afterwards each call flushes
        the clicks staged since the last propagation as ONE padded scatter
        (same pow2 padding rule as the fused round, `_padded_pending`)."""
        import jax.numpy as jnp

        self._ensure_device_labels()
        if self._pending:
            ids, vals = self._padded_pending()
            self._labels_dev, self._is_labeled_dev = _scatter_labels(
                self._labels_dev, self._is_labeled_dev,
                jnp.asarray(ids), jnp.asarray(vals),
            )
            self._pending.clear()
        return self._labels_dev, self._is_labeled_dev

    def current_scores(self) -> np.ndarray:
        if self._needs_prop:
            self._flush_propagation()
        cs = self._current_scores
        if cs is not None and not isinstance(cs, np.ndarray):
            # materialize a device-resident result once, then cache the host
            # copy for repeat host consumers (analysis, top_k)
            cs = np.asarray(cs)
            if self.prior_scores is not None:
                # the host path's prior-bound sanitizer
                # (label_propagation.py fit_transform) — re-applied here since
                # device_out returns before it runs
                pr = self.prior_scores
                if isinstance(pr, np.ndarray):
                    pr_lo = float(pr.min(initial=0.0))
                    pr_hi = float(pr.max(initial=1.0))
                else:  # device-resident prior (device mode)
                    pr_lo, pr_hi = map(float, (pr.min(), pr.max()))
                lo = min(0.0, pr_lo)
                hi = max(1.0, pr_hi)
                assert (cs >= lo - 1e-5).all() and (cs <= hi + 1e-5).all(), (
                    "propagated scores must stay within prior bounds"
                )
            self._current_scores = cs
        return cs

    def current_scores_any(self):
        """Scores WITHOUT forcing a host download: a jax array when the last
        propagation ran device-resident, else the host np array. The serving
        path (`KnnProp2.next_batch` -> `rank_by_scores`) uses this so the
        (N,) scores never cross the host boundary per feedback round. With a
        staged round (windowed device mode) this returns a
        DeferredPropagation marker instead — rank_by_scores fuses the whole
        round into one dispatch, or materializes if it can't."""
        if self._needs_prop:
            from ..ops.propagation import DeferredPropagation

            return DeferredPropagation(self)
        return self._current_scores

    def top_k(self, k: Optional[int], unlabeled_only: bool = True):
        if unlabeled_only:
            subset = np.where(self.is_labeled < 1)[0]
        else:
            subset = np.arange(self.nvecs)
        raw = self.current_scores()
        order = np.argsort(-raw[subset])
        if k is not None:
            order = order[:k]
        top = subset[order]
        return top, raw[top]


class LabelPropagationRanker2(BaseLabelPropagationRanker):
    def __init__(self, *, weights: SymmetricWeights, verbose: int = 0,
                 windowed_layout=None, mesh=None, **other):
        super().__init__(nvecs=weights.nvecs, **other)
        self.weights = weights
        # windowed_layout: ops.pallas_spmv.WindowedSpmv for the serving-scale
        # lane-shuffle propagation step (build_windowed_layout_auto selects
        # the layout by measurement and RCM-relabels internally if needed).
        # mesh: multi-chip row-sharded propagation (parallel/sharded_graph);
        # mesh rounds stay on the host-assembled eager path (_defer_available
        # and device mode both require single-device propagation)
        self.lp = LabelPropagation(
            weights, reg_lambda=self.prior_weight, max_iter=300,
            verbose=verbose, windowed_layout=windowed_layout, mesh=mesh,
        )

    def _defer_available(self) -> bool:
        import jax

        # fusable rounds need: device mode (device-resident prior), the
        # windowed layout (the XLA step's 300-iteration bound is watchdog
        # territory inside one dispatch), and single-device propagation
        return (
            self.lp.windowed_layout is not None
            and self.lp.mesh is None
            and isinstance(self.prior_scores, jax.Array)
        )

    def _propagate(self, scores):
        import jax

        if isinstance(self.prior_scores, jax.Array) and self.lp.mesh is None:
            # device mode (device-built serving index): the prior is already
            # device-resident, labels/is_labeled are device-persistent and
            # this round's clicks arrive as one small scatter — no (N,)
            # host->device uploads per feedback round
            import jax.numpy as jnp

            labels_dev, is_labeled_dev = self._device_label_state()
            out = self.lp.fit_transform_device(
                labels=labels_dev, is_labeled=is_labeled_dev,
                reg_values=self.prior_scores,
                start=jnp.asarray(scores, dtype=jnp.float32),
            )
            self._scores_dev = out
            return out
        ids = np.nonzero(self.is_labeled.reshape(-1))[0]
        labels = self.labels.reshape(-1)[ids]
        out = self.lp.fit_transform(
            label_ids=ids,
            label_values=labels,
            reg_values=self.prior_scores,
            start_value=scores,
            device_out=True,
        )
        # warm-start iterate for the next round (device array on the
        # single-device path, host np on the mesh path — both valid starts)
        self._scores_dev = out
        return out
