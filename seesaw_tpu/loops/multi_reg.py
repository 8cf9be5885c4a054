"""MultiReg — the full 'seesaw' feedback method.

Per round, fits a weight vector from the query anchor with label loss +
graph-Laplacian data regularizer + norm + query-angle regularizers
(learners.multi_reg.RegFit), weighting each tile by 1/(tiles in its image).
Reference: `/root/reference/seesaw/loops/multi_reg.py:183-227`.
"""
from __future__ import annotations

import numpy as np

from ..learners.multi_reg import RegFit
from .graph_based import get_weights_from_index
from .loop_base import LoopBase
from .point_based import PointBased


def _per_image_weights(dbidx: np.ndarray) -> np.ndarray:
    """weight = 1 / (number of labeled tiles in the same image)."""
    if dbidx.shape[0] == 0:
        return np.ones(0, dtype=np.float32)
    _, inverse, counts = np.unique(dbidx, return_inverse=True, return_counts=True)
    return (1.0 / counts[inverse]).astype(np.float32)


class MultiReg(PointBased):
    def __init__(self, gdm, q, params):
        super().__init__(gdm, q, params)
        self.options = params.interactive_options or {}
        self.xlx = get_weights_from_index(
            q.index, self.options["matrix_options"], xlx_matrix=True,
            X_vectors=q.index.vectors,
        )

    @staticmethod
    def from_params(gdm, q, params):
        return MultiReg(gdm, q, params)

    def set_text_vec(self, tvec):
        super().set_text_vec(tvec)
        # with both regularizers active the optimization is well-defined even
        # before any labels: run it immediately (reference `multi_reg.py:194-199`)
        if (
            self.options.get("reg_data_lambda", 0) > 0
            and self.options.get("reg_query_lambda", 0) > 0
            and self.started
        ):
            self.refine()
        else:
            self.curr_vec = self.curr_qvec

    def refine(self, change=None):
        xy = self.q.getXy()
        rows, ys, dbidx = xy["rows"], xy["ys"], xy["dbidx"]
        assert self.curr_qvec is not None
        model = RegFit(
            xlx=self.xlx,
            qvec=self.curr_qvec,
            label_loss_type=self.options["label_loss_type"],
            rank_loss_margin=self.options.get("rank_loss_margin", 0.0),
            pos_weight=self.options.get("pos_weight", "balanced"),
            reg_data_lambda=self.options["reg_data_lambda"],
            reg_norm_lambda=self.options["reg_norm_lambda"],
            reg_query_lambda=self.options["reg_query_lambda"],
            max_iter=self.options.get("max_iter", 100),
            verbose=self.options.get("verbose", False),
        )
        if (
            getattr(self.index, "supports_deferred_query", False)
            and rows.shape[0] > 0
        ):
            # ONE device dispatch per round: the 4-term fit fuses into the
            # next query (ops.frame_scoring.DeferredMultiReg)
            self.curr_vec = model.deferred_fit_rows(
                self.index, rows, ys, _per_image_weights(dbidx)
            )
            return
        X = self.index.vectors_for_rows(rows)
        model.fit(X, ys, _per_image_weights(dbidx))
        self.curr_vec = model.get_coeff()
