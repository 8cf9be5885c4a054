"""Import the LITERAL reference implementation (/root/reference) for
differential fidelity tests.

The reference depends on a few packages this image doesn't ship (ray,
pyroaring, pynndescent, annoy, torchvision).  We install *minimal* stubs for
those — only mechanical primitives (set-backed bitmaps, torch box
inter/union) — so that the reference's own logic (score_frame2, box_join,
LabelPropagation, LKNN posteriors, rank-loss gradients, metrics) runs
verbatim as the oracle.  Nothing from the reference is copied; it is imported
from /root/reference at test time.

Usage:  from refimpl import ref   (then e.g. ref.multiscale_index.score_frame2)
"""
from __future__ import annotations

import sys
import types

REF_PATH = "/root/reference"


def _module(name: str, is_pkg: bool = False) -> types.ModuleType:
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None, is_package=is_pkg)
    if is_pkg:
        m.__path__ = []  # mark as package so submodule imports resolve
    sys.modules[name] = m
    return m


def _install_stubs() -> None:
    if "pyroaring" not in sys.modules:
        pyroaring = _module("pyroaring")

        class BitMap(set):
            """Set-backed stand-in for pyroaring.BitMap (semantics only)."""

            def __init__(self, it=()):
                super().__init__(int(x) for x in it)

            def add(self, x):
                set.add(self, int(x))

            def __contains__(self, x):
                # pyroaring's C-level uint32 conversion accepted SIZE-1 numpy
                # arrays on the reference's numpy 1.x (Session._check_reversals
                # relies on this: it iterates per-BATCH arrays,
                # seesaw_session.py:124-127, so batch_size must be 1 — the
                # reference's own benchmark setting, std_bench.yaml:7)
                import numpy as np

                if isinstance(x, np.ndarray):
                    x = x.item()
                return set.__contains__(self, int(x))

            def union(self, *o):
                return BitMap(set.union(self, *o))

            def intersection(self, *o):
                return BitMap(set.intersection(self, *o))

            def difference(self, *o):
                return BitMap(set.difference(self, *o))

            def to_array(self):
                import numpy as np

                return np.array(sorted(self), dtype="int64")

            def copy(self):
                return BitMap(self)

            def __getitem__(self, i):
                # pyroaring indexes the sorted order
                return sorted(set.__iter__(self))[i]

            def __iter__(self):
                # pyroaring iterates in sorted order
                return iter(sorted(set.__iter__(self)))

            def __array__(self, dtype=None):
                import numpy as np

                a = np.array(sorted(set.__iter__(self)), dtype="int64")
                return a.astype(dtype) if dtype is not None else a

            def __sub__(self, o):
                return BitMap(set.__sub__(self, o))

            def __or__(self, o):
                return BitMap(set.__or__(self, o))

            def __and__(self, o):
                return BitMap(set.__and__(self, o))

            def __xor__(self, o):
                return BitMap(set.__xor__(self, o))

        pyroaring.BitMap = BitMap
        pyroaring.FrozenBitMap = BitMap

    if "ray" not in sys.modules:
        ray = _module("ray", is_pkg=True)

        def _remote(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda f: f

        ray.remote = _remote
        ray.get = lambda x: x
        ray.put = lambda x: x
        ray.method = _remote
        ray_actor = _module("ray.actor")

        class ActorHandle:  # referenced in type annotations only
            pass

        ray_actor.ActorHandle = ActorHandle
        ray.actor = ray_actor
        ray_data = _module("ray.data", is_pkg=True)
        ray.data = ray_data
        ray_ext = _module("ray.data.extensions")
        # TensorArray wraps per-row ndarrays into a pandas column; a plain
        # list gives pandas an object column with identical row semantics.
        ray_ext.TensorArray = lambda x: list(x)
        ray_data.extensions = ray_ext
        def _any_class(name):
            if name.startswith("__"):
                raise AttributeError(name)
            return type(name, (), {})

        ray_ds = _module("ray.data.datasource", is_pkg=True)
        ray_ds.__getattr__ = _any_class
        ray_data.datasource = ray_ds
        ray_data.__getattr__ = _any_class
        ray_fmp = _module("ray.data.datasource.file_meta_provider")
        ray_fmp.__getattr__ = _any_class
        ray_ds.file_meta_provider = ray_fmp
        ray_tune = _module("ray.tune")
        ray_tune.__getattr__ = _any_class
        ray.tune = ray_tune

    if "pynndescent" not in sys.modules:
        pynn = _module("pynndescent")

        class NNDescent:
            def __init__(self, *a, **k):
                raise RuntimeError("pynndescent stub: not available in tests")

        pynn.NNDescent = NNDescent

    if "annoy" not in sys.modules:
        annoy = _module("annoy")

        class AnnoyIndex:
            def __init__(self, *a, **k):
                raise RuntimeError("annoy stub: not available in tests")

        annoy.AnnoyIndex = AnnoyIndex

    if "torchvision" not in sys.modules:
        import torch

        tv = _module("torchvision", is_pkg=True)
        tv_ops = _module("torchvision.ops", is_pkg=True)
        tv_boxes = _module("torchvision.ops.boxes")

        def box_area(boxes):
            return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

        def _box_inter_union(boxes1, boxes2):
            # exact torchvision semantics: xyxy boxes, pairwise matrices
            area1 = box_area(boxes1)
            area2 = box_area(boxes2)
            lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
            rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[..., 0] * wh[..., 1]
            union = area1[:, None] + area2[None, :] - inter
            return inter, union

        tv_boxes.box_area = box_area
        tv_boxes._box_inter_union = _box_inter_union
        tv_ops.boxes = tv_boxes
        tv.ops = tv_ops

        tv_transforms = _module("torchvision.transforms", is_pkg=True)

        class _AnyTransform:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        def _getattr(name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _AnyTransform

        tv_transforms.__getattr__ = _getattr
        tv.transforms = tv_transforms
        tv_models = _module("torchvision.models")
        tv_models.__getattr__ = _getattr
        tv.models = tv_models

    # tqdm is installed; transformers/torch/sklearn/scipy are installed.


class _Ref:
    """Lazy attribute access to reference seesaw modules."""

    def __init__(self):
        self._loaded = False

    def _ensure(self):
        if not self._loaded:
            _install_stubs()
            if REF_PATH not in sys.path:
                sys.path.insert(0, REF_PATH)
            self._loaded = True

    def load(self, modname: str):
        """Import e.g. 'seesaw.metrics' from the reference tree.

        The reference targets pydantic v1; this image ships v2.  While the
        reference module (and anything it pulls in) is being imported,
        'pydantic' temporarily resolves to the bundled pydantic.v1 compat
        package.  Our own modules import v2 outside this window as usual."""
        self._ensure()
        import importlib

        import pydantic.v1 as pv1

        saved = {k: v for k, v in sys.modules.items() if k == "pydantic" or k.startswith("pydantic.")}
        sys.modules["pydantic"] = pv1
        try:
            return importlib.import_module(modname)
        finally:
            sys.modules.pop("pydantic", None)
            sys.modules.update(saved)


ref = _Ref()
