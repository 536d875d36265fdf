"""SSIM / 3DGS photometric loss tests (pure CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.train.losses import (
    gaussian_splatting_loss,
    l1,
    ssim,
)


def _rand_img(key, shape):
    return jax.random.uniform(jax.random.PRNGKey(key), shape)


class TestSSIM:
    def test_identical_images(self):
        img = _rand_img(0, (64, 64, 3))
        assert abs(float(ssim(img, img)) - 1.0) < 1e-5

    def test_range_and_symmetry(self):
        a = _rand_img(1, (64, 64, 3))
        b = _rand_img(2, (64, 64, 3))
        s_ab = float(ssim(a, b))
        s_ba = float(ssim(b, a))
        assert -1.0 <= s_ab <= 1.0
        np.testing.assert_allclose(s_ab, s_ba, rtol=1e-6)

    def test_noise_lowers_ssim(self):
        a = _rand_img(3, (64, 64, 3))
        slight = a + 0.01 * _rand_img(4, (64, 64, 3))
        heavy = a + 0.5 * _rand_img(5, (64, 64, 3))
        assert float(ssim(a, heavy)) < float(ssim(a, slight)) < 1.0

    def test_matches_reference_formula(self):
        # direct NumPy reimplementation (valid-region agnostic: same 'same'
        # padding) as an independent oracle
        import numpy as np

        rng = np.random.default_rng(0)
        a = rng.random((32, 32, 1)).astype(np.float32)
        b = np.clip(a + 0.1 * rng.random((32, 32, 1)).astype(np.float32), 0, 1)

        x = np.arange(11) - 5.0
        w1 = np.exp(-(x**2) / (2 * 1.5**2))
        w1 /= w1.sum()

        def blur(img):
            from scipy.ndimage import convolve1d

            out = convolve1d(img, w1, axis=0, mode="constant")
            return convolve1d(out, w1, axis=1, mode="constant")

        mx, my = blur(a), blur(b)
        sx = blur(a * a) - mx * mx
        sy = blur(b * b) - my * my
        sxy = blur(a * b) - mx * my
        c1, c2 = 0.01**2, 0.03**2
        ref = np.mean(
            ((2 * mx * my + c1) * (2 * sxy + c2))
            / ((mx * mx + my * my + c1) * (sx + sy + c2))
        )
        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_batched(self):
        a = _rand_img(6, (2, 32, 32, 3))
        assert abs(float(ssim(a, a)) - 1.0) < 1e-5


class TestLoss:
    def test_zero_at_identity(self):
        img = _rand_img(7, (64, 64, 4))
        assert float(gaussian_splatting_loss(img, img)) < 1e-5

    def test_differentiable(self):
        a = _rand_img(8, (32, 32, 4))
        b = _rand_img(9, (32, 32, 4))
        g = jax.grad(lambda x: gaussian_splatting_loss(x, b))(a)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0.0
        # alpha channel dropped by rgb_only: zero gradient there
        assert float(jnp.abs(g[..., 3]).sum()) == 0.0

    def test_l1_component(self):
        a = jnp.zeros((16, 16, 3))
        b = jnp.ones((16, 16, 3)) * 0.5
        np.testing.assert_allclose(float(l1(a, b)), 0.5, rtol=1e-6)
