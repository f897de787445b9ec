"""window_accumulate (Pallas windowed scatter-add) vs a numpy loop."""
import jax
import jax.numpy as jnp
import numpy as np

from relation_detr_tpu.ops.patch_scatter import window_accumulate


def test_window_accumulate_matches_loop():
    rng = np.random.RandomState(0)
    nt, ph, pw, c, h, w = 12, 7, 6, 256, 20, 25
    g = jnp.asarray(rng.randn(nt, ph, pw, c).astype(np.float32))
    y0 = rng.randint(0, h - ph + 1, nt).astype(np.int32)
    x0 = rng.randint(0, w - pw + 1, nt).astype(np.int32)
    got = np.asarray(window_accumulate(g, y0, x0, h, w))
    want = np.zeros((h, w, c), np.float32)
    for i in range(nt):
        want[y0[i]:y0[i] + ph, x0[i]:x0[i] + pw] += np.asarray(g[i])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_window_accumulate_channel_split():
    """Canvas large enough to force the channel-block split path."""
    rng = np.random.RandomState(1)
    nt, ph, pw, c, h, w = 4, 21, 19, 256, 100, 168
    g = jnp.asarray(rng.randn(nt, ph, pw, c).astype(np.float32))
    y0 = np.asarray([0, 40, 79, 10], np.int32)
    x0 = np.asarray([0, 60, 149, 10], np.int32)
    got = np.asarray(window_accumulate(g, y0, x0, h, w))
    want = np.zeros((h, w, c), np.float32)
    for i in range(nt):
        want[y0[i]:y0[i] + ph, x0[i]:x0[i] + pw] += np.asarray(g[i])
    np.testing.assert_allclose(got, want, atol=1e-5)
