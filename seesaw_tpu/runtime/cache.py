"""Process-wide memoization + file staging.

Replaces the reference's Ray runtime (`/root/reference/seesaw/
memory_cache.py:13-94`, `services.py:18-78`, `definitions.py:18-79`) for
single-host serving:

- LocalCache.get_or_initialize: share-once loading of parquet/npz/models
  with per-key locks (the cluster cache actor's lock protocol, in-process);
- get_parquet/get_npz: cached columnar loads;
- FsCache: copy remote/network files to a local scratch dir once, guarded
  by a lock file (the local-SSD staging path).
"""
from __future__ import annotations

import os
import shutil
import threading
from pathlib import Path
from typing import Callable, Dict


class LocalCache:
    def __init__(self):
        self._values: Dict[str, object] = {}
        self._locks: Dict[str, threading.Lock] = {}
        self._meta_lock = threading.Lock()

    def _lock_for(self, key: str) -> threading.Lock:
        with self._meta_lock:
            if key not in self._locks:
                self._locks[key] = threading.Lock()
            return self._locks[key]

    def get_or_initialize(self, key: str, init: Callable[[], object]):
        """Initialize once per key, even under concurrent callers."""
        if key in self._values:
            return self._values[key]
        with self._lock_for(key):
            if key not in self._values:
                self._values[key] = init()
        return self._values[key]

    def put(self, key: str, value):
        with self._lock_for(key):
            self._values[key] = value

    def invalidate(self, key: str):
        with self._meta_lock:
            self._values.pop(key, None)

    def invalidate_prefix(self, fragment: str):
        """Drop every key containing ``fragment`` (index rebuilds at the
        same path must not serve the stale cached object)."""
        with self._meta_lock:
            for k in [k for k in self._values if fragment in k]:
                self._values.pop(k, None)

    def clear(self):
        with self._meta_lock:
            self._values.clear()


GLOBAL_CACHE = LocalCache()

# process-wide index registry: sessions share one device-resident index per
# (path, options) — the reference cache actor's share-once role
# (indices/interface.py AccessMethod.load)
index_cache = LocalCache()


def cache_closure(init: Callable[[], object], *, key: str, use_cache: bool = True):
    """reference `services._cache_closure`."""
    if not use_cache:
        return init()
    return GLOBAL_CACHE.get_or_initialize(key, init)


def get_parquet(path: str, cache: bool = True):
    import pandas as pd

    path = str(Path(path).resolve())
    return cache_closure(lambda: pd.read_parquet(path), key=f"parquet://{path}",
                         use_cache=cache)


def get_npz(path: str, cache: bool = True) -> dict:
    import numpy as np

    path = str(Path(path).resolve())

    def load():
        with np.load(path) as z:
            return {k: z[k] for k in z.files}

    return cache_closure(load, key=f"npz://{path}", use_cache=cache)


class FsCache:
    """Stage files into a local scratch directory once (lock-file guarded)."""

    def __init__(self, scratch_dir: str):
        self.scratch = Path(scratch_dir)
        self.scratch.mkdir(parents=True, exist_ok=True)

    # a lock file older than this is from a killed copier — break it
    STALE_LOCK_S = 600.0

    def get(self, path: str) -> str:
        import hashlib

        src = Path(path).resolve()
        # key on the FULL source path, not the basename: /a/vectors.npz and
        # /b/vectors.npz must not serve each other's bytes
        tag = hashlib.sha1(str(src).encode()).hexdigest()[:12]
        name = f"{tag}_{src.name}"
        dst = self.scratch / name
        lock = self.scratch / (name + ".lock")
        done = self.scratch / (name + ".done")
        if done.exists():
            return str(dst)
        # single-host: a simple O_EXCL lock file suffices
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                break
            except FileExistsError:
                if done.exists():
                    return str(dst)
                import time

                try:  # a process killed mid-copy leaves the lock forever
                    if time.time() - lock.stat().st_mtime > self.STALE_LOCK_S:
                        lock.unlink(missing_ok=True)
                        continue
                except OSError:
                    pass
                time.sleep(0.05)
        try:
            if src.is_dir():
                shutil.copytree(src, dst, dirs_exist_ok=True)
            else:
                shutil.copy2(src, dst)
            done.touch()
        finally:
            os.unlink(lock)
        return str(dst)
