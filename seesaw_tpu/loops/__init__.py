"""Relevance-feedback loop methods (L4) + registry."""

from .loop_base import LoopBase, LoopState  # noqa: F401
from .registry import build_loop_from_params  # noqa: F401
