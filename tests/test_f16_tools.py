"""f16 storage packing + tool CLI tests."""

import subprocess
import sys

import jax.numpy as jnp
import numpy as np

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.models import f16 as f16_mod


def _np(x):
    return np.asarray(x)


class TestF16Packing:
    def test_pack_unpack_roundtrip(self, rng):
        upper = rng.uniform(-10, 10, 100).astype(np.float32)
        lower = rng.uniform(-10, 10, 100).astype(np.float32)
        packed = f16_mod.pack_f32s_to_u32(upper, lower)
        u, l = f16_mod.unpack_u32_to_f32s(packed)
        # f16 precision round trip (f16.rs:244-263 bit layout)
        np.testing.assert_allclose(u, upper.astype(np.float16).astype(np.float32))
        np.testing.assert_allclose(l, lower.astype(np.float16).astype(np.float32))

    def test_bit_layout_matches_reference(self):
        # 1.0f16 = 0x3C00; 2.0f16 = 0x4000; upper<<16 | lower (f16.rs:249-251)
        packed = f16_mod.pack_f32s_to_u32(np.float32(1.0), np.float32(2.0))
        assert int(packed) == (0x3C00 << 16) | 0x4000

    def test_rotation_scale_opacity_pack(self, rng):
        rot = rng.normal(size=(10, 4)).astype(np.float32)
        scale = rng.uniform(0, 2, (10, 3)).astype(np.float32)
        op = rng.uniform(0, 1, 10).astype(np.float32)
        packed = f16_mod.pack_rotation_scale_opacity(rot, scale, op)
        assert packed.shape == (10, 4) and packed.dtype == np.uint32
        r2, s2, o2 = f16_mod.unpack_rotation_scale_opacity(packed)
        np.testing.assert_allclose(r2, rot.astype(np.float16).astype(np.float32))
        np.testing.assert_allclose(o2, op.astype(np.float16).astype(np.float32))

    def test_f16_cloud_renders(self):
        from bevy_gaussian_splatting_tpu.render.api import render

        cloud = bgs.test_model_3d(seed=2)
        half = f16_mod.to_f16_storage(cloud)
        assert half.position_visibility.dtype == jnp.float16
        cam = bgs.Camera.create(eye=(0, 1.5, 5), width=64, height=64)
        a = _np(render(cloud, cam))
        b = _np(render(half, cam))
        # f16 storage quantization only
        np.testing.assert_allclose(b, a, atol=2e-3)
        assert (np.abs(b) > 0).any()


class TestToolCLIs:
    def _run(self, *args):
        import os

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        return subprocess.run(
            [sys.executable, *args], capture_output=True, text=True, env=env,
            timeout=300,
        )

    def test_ply_to_gcloud(self, tmp_path):
        from bevy_gaussian_splatting_tpu.io.loader import save_cloud, load_cloud

        cloud = bgs.random_gaussians_3d_seeded(50, seed=3)
        ply = str(tmp_path / "in.ply")
        save_cloud(cloud, ply)
        out = str(tmp_path / "out.gcloud")
        r = self._run("tools/ply_to_gcloud.py", ply, out)
        assert r.returncode == 0, r.stderr
        assert "wrote" in r.stdout
        loaded = load_cloud(out)
        assert len(loaded) >= 50

    def test_compare_aabb_obb(self, tmp_path):
        out = str(tmp_path / "cmp.png")
        r = self._run("tools/compare_aabb_obb.py", "-o", out, "--size", "64")
        assert r.returncode == 0, r.stderr
        from bevy_gaussian_splatting_tpu.utils.image import load_png

        img = load_png(out)
        assert img.shape == (64, 128, 4)
        assert (img[..., 3] > 0).any()

    def test_surfel_plane(self, tmp_path):
        out = str(tmp_path / "surfel.png")
        r = self._run("tools/surfel_plane.py", "-o", out, "--size", "64")
        assert r.returncode == 0, r.stderr
        from bevy_gaussian_splatting_tpu.utils.image import load_png

        img = load_png(out)
        assert img.shape == (64, 128, 4)
