import threading

import numpy as np
import pandas as pd

from seesaw_tpu.runtime.cache import FsCache, LocalCache, get_npz, get_parquet


def test_get_or_initialize_once_under_concurrency():
    cache = LocalCache()
    calls = []

    def init():
        calls.append(1)
        import time

        time.sleep(0.02)
        return object()

    results = []
    threads = [
        threading.Thread(target=lambda: results.append(cache.get_or_initialize("k", init)))
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1
    assert all(r is results[0] for r in results)


def test_parquet_and_npz_cached(tmp_path):
    p = tmp_path / "x.parquet"
    pd.DataFrame({"a": [1, 2]}).to_parquet(p)
    d1 = get_parquet(str(p))
    d2 = get_parquet(str(p))
    assert d1 is d2  # same object: cached

    n = tmp_path / "y.npz"
    np.savez(n, v=np.arange(3))
    z1 = get_npz(str(n))
    z2 = get_npz(str(n))
    assert z1 is z2
    assert z1["v"].tolist() == [0, 1, 2]


def test_fs_cache_stages_once(tmp_path):
    src = tmp_path / "data.bin"
    src.write_bytes(b"abc123")
    scratch = tmp_path / "scratch"
    fc = FsCache(str(scratch))
    p1 = fc.get(str(src))
    p2 = fc.get(str(src))
    assert p1 == p2
    assert open(p1, "rb").read() == b"abc123"
