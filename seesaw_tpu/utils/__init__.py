"""Host utilities: atomic folders, caching, timing."""

from .transactional import transactional_folder  # noqa: F401
