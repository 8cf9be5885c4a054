"""Pooling parity vs torch nn.AvgPool2d over many shapes — the reference's
test_pooling strategy (tests/test_pooling.py:1-36)."""
import numpy as np
import pytest
import jax.numpy as jnp

from seesaw_tpu.ops.pooling import avg_pool2d, manual_pooling, sliding_window


@pytest.mark.parametrize("h,w,k,s", [
    (8, 8, 4, 4),
    (9, 9, 4, 4),     # uneven: trailing pixels cut
    (14, 10, 6, 3),   # overlapping windows
    (224, 224, 112, 56),
    (7, 7, 7, 7),     # single window
])
def test_avg_pool_matches_torch(h, w, k, s):
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, h, w)).astype(np.float32)
    want = torch.nn.AvgPool2d(k, stride=s)(torch.from_numpy(x)).numpy()
    got = np.asarray(avg_pool2d(jnp.asarray(x), k, s))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_centering_shifts_windows():
    x = jnp.arange(10, dtype=jnp.float32).reshape(1, 10)
    x = jnp.broadcast_to(x, (10, 10))
    # k=4 s=4 on 10: windows at 0,4 (cut 2). centered: offset 1 -> 1,5
    plain = manual_pooling(x, lambda w: w.mean(axis=(-2, -1)), 4, 4, center=False)
    centered = manual_pooling(x, lambda w: w.mean(axis=(-2, -1)), 4, 4, center=True)
    assert plain.shape == centered.shape == (2, 2)
    assert float(centered[0, 0]) == pytest.approx(float(plain[0, 0]) + 1.0)


def test_arbitrary_kernel_vector_output():
    # kernel producing a vector per window (like a CLIP tower)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 8, 8)).astype(np.float32))

    def kern(win):  # (3, 4, 4) -> (5,)
        return win.reshape(-1)[:5] * 2.0

    out = manual_pooling(x, kern, 4, 4)
    assert out.shape == (5, 2, 2)
    np.testing.assert_allclose(
        np.asarray(out[:, 0, 0]), np.asarray(x[..., :4, :4]).reshape(-1)[:5] * 2
    )


def test_sliding_window_batched():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 3, 12, 12)).astype(np.float32))
    out = sliding_window(x, lambda w: w.mean(axis=(-2, -1)), 6, 3)
    assert out.shape == (1, 3, 3, 3)
