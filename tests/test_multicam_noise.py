"""Multi-camera batched rendering and noise material tests."""

import jax.numpy as jnp
import numpy as np

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.ops.noise import apply_noise, ridged_multi_4d
from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled
from bevy_gaussian_splatting_tpu.render.multi_camera import (
    render_multi_camera,
    stack_cameras,
)


def _np(x):
    return np.asarray(x)


class TestMultiCamera:
    def test_batch_matches_individual(self):
        cloud = bgs.random_gaussians_3d_seeded(200, seed=1)
        cams = [
            bgs.Camera.create(eye=(0, 0, 60.0), target=(0, 0, 0), width=64, height=64),
            bgs.Camera.create(eye=(30, 10, 50.0), target=(0, 0, 0), width=64, height=64),
            bgs.Camera.create(eye=(-40, 0, 40.0), target=(0, 0, 0), width=64, height=64),
        ]
        batch = _np(render_multi_camera(cloud, cams))
        assert batch.shape == (3, 64, 64, 4)
        for i, cam in enumerate(cams):
            single = _np(render_tiled(cloud, cam, bgs.CloudSettings(), width=64, height=64))
            np.testing.assert_allclose(batch[i], single, atol=2e-5, err_msg=f"cam {i}")

    def test_views_differ(self):
        cloud = bgs.random_gaussians_3d_seeded(100, seed=2)
        cams = [
            bgs.Camera.create(eye=(0, 0, 60.0), width=64, height=64),
            bgs.Camera.create(eye=(60, 0, 0.1), width=64, height=64),
        ]
        batch = _np(render_multi_camera(cloud, cams))
        assert not np.allclose(batch[0], batch[1])

    def test_prestacked(self):
        cloud = bgs.random_gaussians_3d_seeded(50, seed=3)
        cams = [bgs.Camera.create(eye=(0, 0, 60.0), width=64, height=64)] * 2
        stacked = stack_cameras(cams)
        batch = _np(render_multi_camera(cloud, stacked, width=64, height=64))
        np.testing.assert_allclose(batch[0], batch[1])


class TestNoise:
    def test_noise_in_range_and_deterministic(self, rng):
        x = jnp.asarray(rng.uniform(-5, 5, 1000).astype(np.float32))
        n1 = _np(ridged_multi_4d(x, x * 0.7, x * 1.3, jnp.zeros_like(x)))
        n2 = _np(ridged_multi_4d(x, x * 0.7, x * 1.3, jnp.zeros_like(x)))
        np.testing.assert_array_equal(n1, n2)
        assert np.isfinite(n1).all()
        assert n1.min() >= -1.5 and n1.max() <= 1.5
        assert n1.std() > 0.01  # non-degenerate

    def test_apply_noise_rewrites_sh(self):
        cloud = bgs.test_model_3d(seed=1)
        noised = apply_noise(cloud, scale=2.0)
        assert noised.spherical_harmonic.shape == cloud.spherical_harmonic.shape
        assert not np.allclose(
            _np(noised.spherical_harmonic), _np(cloud.spherical_harmonic)
        )
        # position-dependent: two distinct gaussians get distinct SH
        sh = _np(noised.spherical_harmonic)
        assert not np.allclose(sh[0], sh[1])
        # the duplicated corner gaussian (rows 0 and 8) gets identical SH
        np.testing.assert_allclose(sh[0], sh[8])
        # still renders
        cam = bgs.Camera.create(eye=(0, 1.5, 5), width=64, height=64)
        img = _np(render_tiled(noised, cam, bgs.CloudSettings(), width=64, height=64))
        assert np.isfinite(img).all()
