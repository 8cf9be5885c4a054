"""Point-based loops: rank by a single query vector, refine the vector.

Reference: `/root/reference/seesaw/loops/point_based.py`, `log_reg.py`,
`rocchio_update.py`.
"""
from __future__ import annotations

import numpy as np

from ..learners import LogisticRegression
from .loop_base import LoopBase


class PointBased(LoopBase):
    def __init__(self, gdm, q, params):
        super().__init__(gdm, q, params)
        self.curr_vec = None

    def set_text_vec(self, vec):
        super().set_text_vec(vec)
        self.curr_vec = vec

    def next_batch(self):
        assert self.curr_vec is not None
        from ..ops.frame_scoring import DeferredVector

        if isinstance(self.curr_vec, DeferredVector):
            res = self.q.query_stateful(
                vector=self.curr_vec,
                batch_size=self.params.batch_size,
                shortlist_size=self.params.shortlist_size,
                agg_method=self.params.agg_method,
                aug_larger=self.params.aug_larger,
                aug_weight=self.params.aug_weight or "level_max",
            )
            # the device-resolved vector rides back in the same fetch so
            # host consumers (state/save) still see a concrete vector
            if "qvec" in res:
                self.curr_vec = res.pop("qvec")
            return res
        return self._next_batch_curr_vec(np.asarray(self.curr_vec).reshape(-1))

    def refine(self, change=None):
        raise NotImplementedError("implement in subclass")


class Plain(PointBased):
    """Zero-feedback baseline: always rank by the text vector."""

    @staticmethod
    def from_params(gdm, q, params):
        return Plain(gdm, q, params)

    def refine(self, change=None):
        pass


class LogReg2(PointBased):
    """Fit a logistic probe on labeled tile vectors; its coefficient becomes
    the query vector. Skips fitting while labels are one-sided (the anchor
    regularizer would just return the text vector anyway)."""

    def __init__(self, gdm, q, params):
        super().__init__(gdm, q, params)
        self.model = None

    @staticmethod
    def from_params(gdm, q, params):
        return LogReg2(gdm, q, params)

    def set_text_vec(self, vec):
        super().set_text_vec(vec)
        self.model = None

    def next_batch(self):
        res = super().next_batch()
        fit = res.pop("fit", None) if isinstance(res, dict) else None
        if fit is not None:
            # the fused round's fit payload keeps warm starts working
            self.model.apply_fit_result(fit)
        return res

    def refine(self, change=None):
        xy = self.q.getXy()
        rows, ys = xy["rows"], xy["ys"]
        if rows.shape[0] == 0 or (ys == 1).all() or (ys == 0).all():
            return
        if self.model is None:
            opts = dict(self.params.interactive_options or {})
            opts.pop("model_type", None)
            self.model = LogisticRegression(
                regularizer_vector=self.state.tvec, **opts
            )
        if getattr(self.index, "supports_deferred_query", False):
            # ONE device dispatch per round: fit fuses into the next query
            self.curr_vec = self.model.deferred_fit_rows(self.index, rows, ys)
            return
        # on device-only indexes this is ONE dispatch (gather + center +
        # LBFGS fused); host-mirror indexes take the ordinary fit path
        self.model.fit_rows(self.index, rows, ys)
        self.curr_vec = self.model.get_coeff()


class RocchioUpdate(PointBased):
    """q <- alpha*q0 + beta*mean(relevant) - gamma*mean(non-relevant)."""

    def __init__(self, gdm, q, params):
        super().__init__(gdm, q, params)
        opts = params.interactive_options or {}
        self.alpha = opts["rocchio_alpha"]
        self.beta = opts["rocchio_beta"]
        self.gamma = opts["rocchio_gamma"]

    @staticmethod
    def from_params(gdm, q, params):
        return RocchioUpdate(gdm, q, params)

    def refine(self, change=None):
        xy = self.q.getXy()
        rows, ys = xy["rows"], xy["ys"]
        pos_rows, neg_rows = rows[ys > 0], rows[ys == 0]
        if getattr(self.index, "supports_deferred_query", False):
            # ONE device dispatch per round: the class-mean gather + Rocchio
            # update fuse into the next query program
            # (ops.frame_scoring.DeferredRocchio)
            from ..ops.frame_scoring import DeferredRocchio

            self.curr_vec = DeferredRocchio(
                self.curr_qvec, pos_rows, neg_rows,
                self.alpha, self.beta, self.gamma,
            )
            return
        # class sums reduce ON the index (one tiny dispatch on device-only
        # indexes) instead of fetching the whole labeled matrix
        sums = self.index.sum_vectors_for_rows([pos_rows, neg_rows])
        mean_rel = sums[0] / max(pos_rows.shape[0], 1)
        mean_nrel = sums[1] / max(neg_rows.shape[0], 1)
        self.curr_vec = (
            self.alpha * self.curr_qvec + self.beta * mean_rel - self.gamma * mean_nrel
        )


class RandomResults(LoopBase):
    """Random unseen images; no feedback. Benchmark floor."""

    @staticmethod
    def from_params(gdm, q, params):
        return RandomResults(gdm, q, params)

    def set_text_vec(self, vec):
        self.curr_qvec = vec

    def next_batch_external(self):
        return self.q.query_random(batch_size=self.params.batch_size)

    def refine_external(self, change=None):
        pass
