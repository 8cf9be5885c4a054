"""Native C++ JPEG decode pool: pixel parity with PIL, failure handling,
shutdown probe."""
import numpy as np
import PIL.Image
import pytest


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i, (h, w) in enumerate([(48, 64), (64, 48), (120, 200)]):
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        p = d / f"im_{i}.jpg"
        PIL.Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
        arrays.append(np.asarray(PIL.Image.open(p).convert("RGB")))
    return paths, arrays


def test_native_pool_matches_pil(jpegs):
    from seesaw_tpu.runtime.jpeg_decode import NativeJpegPool, _load_native

    if _load_native() is None:
        pytest.skip("no native toolchain/libjpeg")
    paths, arrays = jpegs
    pool = NativeJpegPool(n_threads=2)
    for i, p in enumerate(paths):
        pool.submit(i, p)
    got = {}
    import time

    while len(got) < len(paths):
        out = pool.poll()
        if out is None:
            time.sleep(0.001)
            continue
        got[out[0]] = out[1]
    pool.close()
    for i, want in enumerate(arrays):
        assert got[i] is not None
        assert got[i].shape == want.shape
        # both decoders are libjpeg; IDCT variants may differ by a ulp or two
        assert np.abs(got[i].astype(int) - want.astype(int)).max() <= 2


def test_decode_pool_iterator_and_failures(jpegs, tmp_path):
    from seesaw_tpu.runtime.jpeg_decode import decode_pool

    paths, arrays = jpegs
    bad = tmp_path / "corrupt.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0garbage")
    all_paths = paths + [str(bad), str(tmp_path / "missing.jpg")]
    results = dict(decode_pool(all_paths, n_threads=2))
    assert len(results) == len(all_paths)
    for i in range(len(paths)):
        assert results[i] is not None and results[i].shape == arrays[i].shape
    assert results[len(paths)] is None  # corrupt
    assert results[len(paths) + 1] is None  # missing


def test_shutdown_probe(jpegs):
    """Allocate many pools and let the interpreter GC them: no __del__
    exceptions (checked by pytest's stderr cleanliness) and no deadlocks."""
    from seesaw_tpu.runtime.jpeg_decode import NativeJpegPool, _load_native

    if _load_native() is None:
        pytest.skip("no native toolchain/libjpeg")
    paths, _ = jpegs
    for _ in range(10):
        pool = NativeJpegPool(n_threads=2)
        pool.submit(0, paths[0])
        del pool  # close via __del__ with work possibly in flight
