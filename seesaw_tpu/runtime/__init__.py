"""Host-side runtime: bitmaps, caching, atomic IO, timing.

Replaces the reference's Ray-actor runtime layer (`seesaw/services.py`,
`seesaw/memory_cache.py`) with single-process equivalents, plus a native C++
bitmap backing the seen/accepted sets (reference used pyroaring)."""

from .bitmap import BitMap, FrozenBitMap  # noqa: F401
