"""Loop method registry: name -> class (reference `loops/registry.py:19-34`).

Methods are imported lazily so partially built subsystems (graph, active
search, textual) don't break the core loops.
"""
from __future__ import annotations


def _registry():
    from .point_based import Plain, LogReg2, RocchioUpdate, RandomResults

    reg = {
        "plain": Plain,
        "log_reg2": LogReg2,
        "rocchio_update": RocchioUpdate,
        "random": RandomResults,
    }
    try:
        from .graph_based import KnnProp2
        reg["knn_prop2"] = KnnProp2
    except ImportError:
        pass
    try:
        from .pseudo_lr import PseudoLR
        reg["pseudo_lr"] = PseudoLR
    except ImportError:
        pass
    try:
        from .multi_reg import MultiReg
        reg["multi_reg"] = MultiReg
    except ImportError:
        pass
    try:
        from .multi_reg_neg import MultiRegNeg
        reg["multi_reg_neg"] = MultiRegNeg
    except ImportError:
        pass
    try:
        from .active_search import ActiveSearch, LKNNSearch
        reg["active_search"] = ActiveSearch
        reg["lknn"] = LKNNSearch
    except ImportError:
        pass
    try:
        from .textual import TextualFeedback
        reg["textual"] = TextualFeedback
    except ImportError:
        pass
    return reg


def available_methods():
    return sorted(_registry().keys())


def build_loop_from_params(gdm, q, params):
    reg = _registry()
    cls = reg.get(params.interactive)
    if cls is None:
        raise ValueError(
            f"unknown interactive method {params.interactive!r}; available: "
            f"{sorted(reg)}"
        )
    return cls.from_params(gdm, q, params)
