"""Oracle renderer tests.

Mirrors the reference's render-test strategy: statistical pixel assertions on
tiny deterministic scenes (tests/visibility_render.rs:36-37 asserts >= 64
non-black pixels visible / <= 8 hidden on a 128x128 target) plus analytic
checks of the fragment math the reference cannot easily test on GPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.models.settings import (
    DrawMode,
    GaussianMode,
    GaussianColorSpace,
    RasterizeMode,
    SortMode,
)
from bevy_gaussian_splatting_tpu.ops import sh as sh_ops
from bevy_gaussian_splatting_tpu.ops.rasterize_ref import render_oracle


def _np(x):
    return np.asarray(x)


def single_gaussian_cloud(
    pos=(0.0, 0.0, 0.0), scale=0.1, opacity=0.8, sh0=(0.5, 0.2, -0.1)
):
    pv = np.array([[pos[0], pos[1], pos[2], 1.0]], np.float32)
    sh = np.zeros((1, 48), np.float32)
    sh[0, :3] = sh0
    rot = np.array([[1.0, 0.0, 0.0, 0.0]], np.float32)
    so = np.array([[scale, scale, scale, opacity]], np.float32)
    return bgs.Gaussian3dCloud(
        position_visibility=jnp.asarray(pv),
        spherical_harmonic=jnp.asarray(sh),
        rotation=jnp.asarray(rot),
        scale_opacity=jnp.asarray(so),
    )


CAM = bgs.Camera.create(eye=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0), width=64, height=64)


class TestAnalytic:
    def test_center_pixel_alpha_equals_opacity_aabb(self):
        # at the splat center power == 0 so alpha == opacity (gaussian.wgsl:499)
        cloud = single_gaussian_cloud(opacity=0.7)
        settings = bgs.CloudSettings(aabb=True, opacity_adaptive_radius=False)
        img = _np(render_oracle(cloud, CAM, settings))
        center = img[31:33, 31:33]  # 64x64, center straddles 4 pixels
        # nearest pixel center is half a pixel off-center: alpha =
        # opacity * exp(-0.5 * conic * 2) ~= 0.96 * opacity
        assert center[..., 3].max() > 0.66
        # expected premultiplied color = srgb_to_linear(0.5 + shc0*sh) * alpha
        expected_rgb = _np(
            sh_ops.srgb_to_linear(0.5 + sh_ops.SHC[0] * jnp.array([0.5, 0.2, -0.1]))
        )
        got = center.reshape(-1, 4)[center.reshape(-1, 4)[:, 3].argmax()]
        np.testing.assert_allclose(got[:3] / got[3], expected_rgb, rtol=1e-2)

    def test_linear_color_space_skips_srgb(self):
        cloud = single_gaussian_cloud(opacity=0.7)
        settings = bgs.CloudSettings(
            aabb=True, color_space=GaussianColorSpace.LIN_REC709_DISPLAY
        )
        img = _np(render_oracle(cloud, CAM, settings))
        got = img[31:33, 31:33].reshape(-1, 4)
        got = got[got[:, 3].argmax()]
        expected_rgb = 0.5 + _np(sh_ops.SHC)[0] * np.array([0.5, 0.2, -0.1])
        np.testing.assert_allclose(got[:3] / got[3], expected_rgb, rtol=1e-2)

    def test_alpha_cap(self):
        cloud = single_gaussian_cloud(scale=1.0, opacity=1.0)
        settings = bgs.CloudSettings(aabb=True)
        img = _np(render_oracle(cloud, CAM, settings))
        assert img[..., 3].max() <= 0.999 + 1e-6

    def test_back_to_front_compositing(self):
        # red gaussian in front of green: center pixel dominated by red
        red = single_gaussian_cloud(pos=(0, 0, 1.0), opacity=0.9, sh0=(1.5, -1.5, -1.5))
        green = single_gaussian_cloud(pos=(0, 0, -1.0), opacity=0.9, sh0=(-1.5, 1.5, -1.5))
        cloud = bgs.Gaussian3dCloud(
            position_visibility=jnp.concatenate(
                [green.position_visibility, red.position_visibility]
            ),
            spherical_harmonic=jnp.concatenate(
                [green.spherical_harmonic, red.spherical_harmonic]
            ),
            rotation=jnp.concatenate([green.rotation, red.rotation]),
            scale_opacity=jnp.concatenate([green.scale_opacity, red.scale_opacity]),
        )
        img = _np(render_oracle(cloud, CAM, bgs.CloudSettings(aabb=True)))
        center = img[32, 32]
        assert center[0] > center[1] * 2, center  # red wins

    def test_global_opacity_scales_alpha(self):
        cloud = single_gaussian_cloud(opacity=0.8)
        s1 = bgs.CloudSettings(aabb=True)
        s2 = s1.replace(global_opacity=0.5)
        a1 = _np(render_oracle(cloud, CAM, s1))[..., 3]
        a2 = _np(render_oracle(cloud, CAM, s2))[..., 3]
        # not exactly linear (adaptive cutoff unchanged) but close at center
        np.testing.assert_allclose(a2.max(), a1.max() * 0.5, rtol=5e-2)

    def test_background_composited(self):
        cloud = single_gaussian_cloud(opacity=0.5)
        bgcol = jnp.array([0.0, 0.0, 1.0, 1.0])
        img = _np(render_oracle(cloud, CAM, bgs.CloudSettings(aabb=True), background=bgcol))
        # corners keep the background
        np.testing.assert_allclose(img[0, 0], [0, 0, 1, 1], atol=1e-6)
        # center blends over it
        assert img[32, 32, 2] < 1.0


class TestVisibilityRender:
    """Port of tests/visibility_render.rs statistical assertions."""

    def _render(self, cloud, settings):
        cam = bgs.Camera.create(
            eye=(0.0, 1.5, 5.0), target=(0.0, 0.0, 0.0), width=128, height=128
        )
        return _np(render_oracle(cloud, cam, settings))

    def test_visible_cloud_covers_pixels(self):
        cloud = bgs.test_model_3d()
        img = self._render(cloud, bgs.CloudSettings())
        non_black = (img[..., 3] > 1.0 / 255.0).sum()
        assert non_black >= 64, non_black

    def test_selected_mode_hides_invisible(self):
        cloud = bgs.test_model_3d()
        hidden = cloud.with_visibility(jnp.zeros(len(cloud)))
        img = self._render(hidden, bgs.CloudSettings(draw_mode=DrawMode.SELECTED))
        non_black = (img[..., 3] > 1.0 / 255.0).sum()
        assert non_black <= 8, non_black

    def test_highlight_selected(self):
        cloud = bgs.test_model_3d()
        img = self._render(
            cloud, bgs.CloudSettings(draw_mode=DrawMode.HIGHLIGHT_SELECTED)
        )
        # all gaussians selected -> highlight color (0.3, 1.0, 0.1) dominates
        lit = img[img[..., 3] > 0.5]
        assert len(lit) > 0
        assert np.all(lit[:, 1] >= lit[:, 0])  # green >= red everywhere lit


class TestModes:
    def test_all_modes_render_finite(self):
        cloud = bgs.test_model_3d()
        for mode in [
            RasterizeMode.COLOR,
            RasterizeMode.DEPTH,
            RasterizeMode.NORMAL,
            RasterizeMode.POSITION,
            RasterizeMode.OPTICAL_FLOW,
            RasterizeMode.CLASSIFICATION,
        ]:
            img = _np(render_oracle(cloud, CAM, bgs.CloudSettings(rasterize_mode=mode)))
            assert np.isfinite(img).all(), mode
            assert (img[..., 3] > 0).any(), mode

    def test_2dgs_renders(self):
        cloud = bgs.test_model_3d()
        img = _np(
            render_oracle(cloud, CAM, bgs.CloudSettings(gaussian_mode=GaussianMode.GAUSSIAN_2D))
        )
        assert np.isfinite(img).all()
        assert (img[..., 3] > 1 / 255).sum() > 64

    def test_4d_renders_and_time_varies(self):
        cloud = bgs.random_gaussians_4d_seeded(64, seed=5)
        cam = bgs.Camera.create(eye=(0, 0, 60.0), target=(0, 0, 0), width=64, height=64)
        s0 = bgs.CloudSettings(gaussian_mode=GaussianMode.GAUSSIAN_4D, time=0.0)
        s5 = s0.replace(time=0.5)
        i0 = _np(render_oracle(cloud, cam, s0))
        i5 = _np(render_oracle(cloud, cam, s5))
        assert np.isfinite(i0).all() and np.isfinite(i5).all()
        assert not np.allclose(i0, i5)  # temporal marginal changes the image

    def test_sort_mode_host_matches_device(self):
        cloud = bgs.random_gaussians_3d_seeded(128, seed=9)
        # shrink positions so every gaussian is inside the frustum: the host
        # sorts don't frustum-cull (src/sort/std_sort.rs), the device sort does
        cloud = dataclasses.replace(
            cloud,
            position_visibility=cloud.position_visibility * jnp.array([0.2, 0.2, 0.2, 1.0]),
        )
        cam = bgs.Camera.create(eye=(0, 0, 60.0), target=(0, 0, 0), width=64, height=64)
        # all gaussians in frustum from far away -> identical painter order
        a = _np(render_oracle(cloud, cam, bgs.CloudSettings(sort_mode=SortMode.RADIX)))
        b = _np(render_oracle(cloud, cam, bgs.CloudSettings(sort_mode=SortMode.STD)))
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestGradients:
    def test_grad_flows_to_all_fields(self):
        cloud = bgs.test_model_3d()
        # make scales anisotropic: with isotropic covariance the rotation
        # gradient is legitimately zero (Sigma = s^2 I for any R)
        cloud = dataclasses.replace(
            cloud,
            scale_opacity=cloud.scale_opacity * jnp.array([1.0, 2.0, 0.5, 1.0]),
        )
        settings = bgs.CloudSettings(aabb=True)

        def loss(c):
            img = render_oracle(c, CAM, settings)
            return jnp.sum(img[..., :3] ** 2)

        grads = jax.grad(loss)(cloud)
        for name in ("position_visibility", "spherical_harmonic", "rotation", "scale_opacity"):
            g = _np(getattr(grads, name))
            assert np.isfinite(g).all(), name
            assert np.abs(g).max() > 0.0, name

    def test_grad_obb_finite(self):
        cloud = bgs.test_model_3d()
        settings = bgs.CloudSettings()  # OBB default

        def loss(c):
            return jnp.sum(render_oracle(c, CAM, settings))

        grads = jax.grad(loss)(cloud)
        assert np.isfinite(_np(grads.position_visibility)).all()

    def test_render_deterministic(self):
        cloud = bgs.random_gaussians_3d_seeded(32, seed=11)
        cam = bgs.Camera.create(eye=(0, 0, 50.0), target=(0, 0, 0), width=32, height=32)
        a = _np(render_oracle(cloud, cam, bgs.CloudSettings()))
        b = _np(render_oracle(cloud, cam, bgs.CloudSettings()))
        np.testing.assert_array_equal(a, b)
