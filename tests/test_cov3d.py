"""precompute_covariance_3d storage flavor — packed f16 bit layout, gcloud
round-trip, and image parity vs the quat/scale path (reference:
src/gaussian/f16.rs:122-172 Covariance3dOpacityPacked128,
src/render/gaussian_3d.wgsl:76-88 get_cov3d consumption)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.models.f16 import (
    pack_covariance_3d_opacity,
    unpack_covariance_3d_opacity,
)


def _np(x):
    return np.asarray(x)


def _scene_cloud(n=96, seed=3):
    c = bgs.random_gaussians_3d_seeded(n, seed=seed)
    so = _np(c.scale_opacity).copy()
    so[:, :3] = np.abs(so[:, :3]) * 0.05 + 0.02
    so[:, 3] = np.clip(np.abs(so[:, 3]), 0.2, 0.9)
    pos = _np(c.position_visibility).copy()
    pos[:, :3] *= 0.05
    return dataclasses.replace(
        c,
        scale_opacity=jnp.asarray(so),
        position_visibility=jnp.asarray(pos),
    )


class TestPackedBits:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        cov = rng.normal(size=(40, 6)).astype(np.float32)
        op = rng.uniform(0, 1, 40).astype(np.float32)
        packed = pack_covariance_3d_opacity(cov, op)
        assert packed.dtype == np.uint32 and packed.shape == (40, 4)
        cov2, op2 = unpack_covariance_3d_opacity(packed)
        # f16 quantization round-trip
        np.testing.assert_array_equal(cov2, cov.astype(np.float16).astype(np.float32))
        np.testing.assert_array_equal(op2, op.astype(np.float16).astype(np.float32))

    def test_bit_layout_upper_lower(self):
        """(upper << 16) | lower, f16.rs:244-251 — and opacity duplicated into
        both halves (f16.rs:149)."""
        cov = np.array([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0]], np.float32)
        op = np.array([0.5], np.float32)
        packed = pack_covariance_3d_opacity(cov, op)
        f16b = lambda v: int(np.float16(v).view(np.uint16))
        assert packed[0, 0] == (f16b(1.0) << 16) | f16b(2.0)
        assert packed[0, 2] == (f16b(5.0) << 16) | f16b(6.0)
        assert packed[0, 3] == (f16b(0.5) << 16) | f16b(0.5)


class TestIo:
    def test_gcloud_roundtrip_and_loader_dispatch(self, tmp_path):
        from bevy_gaussian_splatting_tpu.io.loader import load_cloud, save_cloud

        cc = bgs.precompute_covariance_3d(_scene_cloud(), f16_quantize=True)
        p = str(tmp_path / "cov.gcloud")
        save_cloud(cc, p)
        out = load_cloud(p)
        assert isinstance(out, bgs.Gaussian3dCovCloud)
        np.testing.assert_array_equal(
            _np(out.covariance_3d_opacity), _np(cc.covariance_3d_opacity)
        )
        np.testing.assert_array_equal(
            _np(out.position_visibility), _np(cc.position_visibility)
        )
        # plain clouds still dispatch to the quat/scale decoder
        plain = _scene_cloud(32, seed=5)
        p2 = str(tmp_path / "plain.gcloud")
        save_cloud(plain, p2)
        assert isinstance(load_cloud(p2), bgs.Gaussian3dCloud)


class TestRenderParity:
    @pytest.mark.parametrize("aabb", [True, False])
    def test_oracle_parity_vs_quat_scale(self, aabb):
        """Unquantized precomputed covariance must reproduce the quat/scale
        render exactly (identity transform, global_scale 1)."""
        from bevy_gaussian_splatting_tpu.ops.rasterize_ref import render_oracle

        cloud = _scene_cloud()
        cov_cloud = bgs.precompute_covariance_3d(cloud)
        camera = bgs.Camera.create(
            eye=(0.0, 0.0, 6.0), target=(0.0, 0.0, 0.0), width=64, height=64
        )
        settings = bgs.CloudSettings(aabb=aabb)
        a = render_oracle(cloud, camera, settings)
        b = render_oracle(cov_cloud, camera, settings)
        np.testing.assert_allclose(_np(a), _np(b), atol=1e-6)

    def test_f16_quantized_close(self):
        from bevy_gaussian_splatting_tpu.ops.rasterize_ref import render_oracle

        cloud = _scene_cloud()
        cov_cloud = bgs.precompute_covariance_3d(cloud, f16_quantize=True)
        camera = bgs.Camera.create(
            eye=(0.0, 0.0, 6.0), target=(0.0, 0.0, 0.0), width=64, height=64
        )
        settings = bgs.CloudSettings()
        a = render_oracle(cloud, camera, settings)
        b = render_oracle(cov_cloud, camera, settings)
        assert np.abs(_np(a) - _np(b)).max() < 0.05  # f16 storage quantization

    def test_tiled_matches_oracle(self):
        from bevy_gaussian_splatting_tpu.ops.rasterize_ref import render_oracle
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled

        cov_cloud = bgs.precompute_covariance_3d(_scene_cloud())
        camera = bgs.Camera.create(
            eye=(0.0, 0.0, 6.0), target=(0.0, 0.0, 0.0), width=64, height=64
        )
        settings = bgs.CloudSettings()
        ref = render_oracle(cov_cloud, camera, settings)
        tiled = render_tiled(cov_cloud, camera, settings, differentiable=False)
        np.testing.assert_allclose(_np(tiled), _np(ref), atol=2e-5)

    def test_unsupported_modes_raise(self):
        from bevy_gaussian_splatting_tpu.ops.project import project_gaussians

        cov_cloud = bgs.precompute_covariance_3d(_scene_cloud(16))
        camera = bgs.Camera.create(
            eye=(0.0, 0.0, 6.0), target=(0.0, 0.0, 0.0), width=64, height=64
        )
        with pytest.raises(ValueError, match="GAUSSIAN_3D only"):
            project_gaussians(
                cov_cloud, camera,
                bgs.CloudSettings(gaussian_mode=bgs.GaussianMode.GAUSSIAN_2D),
            )
        with pytest.raises(ValueError, match="NORMAL"):
            project_gaussians(
                cov_cloud, camera,
                bgs.CloudSettings(rasterize_mode=bgs.RasterizeMode.NORMAL),
            )
