"""Index layer: AccessMethod interface, multiscale and coarse indices."""

from .interface import AccessMethod  # noqa: F401
