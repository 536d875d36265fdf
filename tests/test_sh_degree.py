"""SH degree axis (sh0..sh4) — storage, basis, IO, and render parity per
degree (reference: cargo features sh0..sh4 selecting SH_COEFF_COUNT at compile
time, src/material/spherical_harmonics.rs:33-120).  Here the degree is encoded
by the spherical_harmonic array width (4/12/28/48/76)."""

import dataclasses
import io as _io

import jax.numpy as jnp
import numpy as np
import pytest

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.models.cloud import (
    num_sh_coefficients,
    set_sh_degree,
    sh_coeff_width,
    sh_degree_from_width,
)
from bevy_gaussian_splatting_tpu.ops import sh as sh_ops

DEGREES = [0, 1, 2, 3, 4]


def _np(x):
    return np.asarray(x)


def assert_clouds_equal(a, b, atol=0.0):
    assert type(a) is type(b)
    for f in dataclasses.fields(a):
        np.testing.assert_allclose(
            _np(getattr(a, f.name)), _np(getattr(b, f.name)), atol=atol,
            err_msg=f.name,
        )


class TestWidths:
    def test_width_table(self):
        # pad_4(3 * (d+1)^2) per the reference's pad_4 rule
        assert [sh_coeff_width(d) for d in DEGREES] == [4, 12, 28, 48, 76]

    def test_inverse(self):
        for d in DEGREES:
            assert sh_degree_from_width(sh_coeff_width(d)) == d
        with pytest.raises(ValueError):
            sh_degree_from_width(47)

    def test_set_sh_degree_truncate_extend(self):
        c3 = bgs.random_gaussians_3d_seeded(16, seed=1, sh_degree=3)
        c1 = set_sh_degree(c3, 1)
        assert c1.spherical_harmonic.shape[1] == 12
        np.testing.assert_array_equal(
            _np(c1.spherical_harmonic), _np(c3.spherical_harmonic)[:, :12]
        )
        back = set_sh_degree(c1, 3)
        assert back.spherical_harmonic.shape[1] == 48
        np.testing.assert_array_equal(
            _np(back.spherical_harmonic)[:, :12], _np(c1.spherical_harmonic)
        )
        assert _np(back.spherical_harmonic)[:, 12:].max() == 0.0


class TestBasis:
    def test_degree4_basis_orthonormal(self):
        """Y_4 terms (divided by their shc scale signs) integrate to delta_ij
        against each other on the sphere — validates the polynomial forms."""
        rng = np.random.default_rng(0)
        d = rng.normal(size=(200_000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        basis = _np(sh_ops.sh_basis(jnp.asarray(d, jnp.float32), degree=4))
        assert basis.shape[1] == 25
        # the shc/SHC4 constants normalize each term: Monte-Carlo Gram matrix
        # of the scaled basis is (1 / 4pi) * I over uniform sphere samples
        gram = basis.T @ basis / len(d)
        off = gram - np.diag(np.diag(gram))
        np.testing.assert_allclose(
            np.diag(gram), np.full(25, 1.0 / (4 * np.pi)), rtol=0.05
        )
        assert np.abs(off).max() < 0.01

    def test_lookup_infers_degree_from_width(self):
        rng = np.random.default_rng(3)
        d = rng.normal(size=(32, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        sh4 = rng.normal(size=(32, 76)).astype(np.float32)
        # reference shader semantics: degree-4 coeffs stored but NOT evaluated
        got = sh_ops.spherical_harmonics_lookup(jnp.asarray(d), jnp.asarray(sh4))
        want = sh_ops.spherical_harmonics_lookup(
            jnp.asarray(d), jnp.asarray(sh4[:, :48]), degree=3
        )
        np.testing.assert_allclose(_np(got), _np(want), atol=1e-6)
        # escape hatch: full degree-4 evaluation differs
        full = sh_ops.spherical_harmonics_lookup(
            jnp.asarray(d), jnp.asarray(sh4), eval_degree=4
        )
        assert np.abs(_np(full) - _np(got)).max() > 1e-3

    def test_low_degree_matches_zero_extended(self):
        rng = np.random.default_rng(4)
        d = rng.normal(size=(16, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        for deg in (0, 1, 2):
            w = sh_coeff_width(deg)
            shv = np.zeros((16, w), np.float32)
            shv[:, : num_sh_coefficients(deg) * 3] = rng.normal(
                size=(16, num_sh_coefficients(deg) * 3)
            )
            ext = np.zeros((16, 48), np.float32)
            ext[:, : num_sh_coefficients(deg) * 3] = shv[
                :, : num_sh_coefficients(deg) * 3
            ]
            a = sh_ops.spherical_harmonics_lookup(jnp.asarray(d), jnp.asarray(shv))
            b = sh_ops.spherical_harmonics_lookup(jnp.asarray(d), jnp.asarray(ext))
            np.testing.assert_allclose(_np(a), _np(b), atol=1e-6)


class TestIoPerDegree:
    @pytest.mark.parametrize("degree", DEGREES)
    def test_gcloud_roundtrip(self, degree):
        from bevy_gaussian_splatting_tpu.io import gcloud as gc

        cloud = bgs.random_gaussians_3d_seeded(70, seed=degree, sh_degree=degree)
        for use_native in (True, False):
            data = gc.encode_gcloud_3d(cloud, use_native=use_native)
            out = gc.decode_gcloud_3d(data, use_native=use_native)
            assert out.spherical_harmonic.shape[1] == sh_coeff_width(degree)
            assert_clouds_equal(cloud, out)
        # cross: python-encoded decodes natively and vice versa
        out = gc.decode_gcloud_3d(gc.encode_gcloud_3d(cloud, use_native=False))
        assert_clouds_equal(cloud, out)

    @pytest.mark.parametrize("degree", DEGREES)
    def test_bincode2_roundtrip(self, degree):
        from bevy_gaussian_splatting_tpu.io import bincode2

        cloud = bgs.random_gaussians_3d_seeded(33, seed=degree, sh_degree=degree)
        out = bincode2.decode_bincode_3d(bincode2.encode_bincode_3d(cloud))
        assert_clouds_equal(cloud, out)

    @pytest.mark.parametrize("degree", DEGREES)
    def test_ply_roundtrip(self, degree):
        from bevy_gaussian_splatting_tpu.io import ply as ply_codec

        cloud = bgs.random_gaussians_3d_seeded(40, seed=degree, sh_degree=degree)
        # writer needs positive scales / (0,1) opacity to invert activations
        so = _np(cloud.scale_opacity).copy()
        so[:, :3] = np.abs(so[:, :3]) + 0.1
        so[:, 3] = np.clip(so[:, 3], 0.05, 0.95)
        rot = _np(cloud.rotation)
        rot = rot / np.linalg.norm(rot, axis=1, keepdims=True)
        cloud = dataclasses.replace(
            cloud,
            scale_opacity=jnp.asarray(so),
            rotation=jnp.asarray(rot.astype(np.float32)),
        )
        data = ply_codec.write_ply_3d(cloud)
        out = ply_codec.parse_ply_3d(data, strict_reference=False)
        # degree is inferred from the f_rest property count
        assert out.spherical_harmonic.shape[1] == sh_coeff_width(degree)
        n = len(cloud)
        np.testing.assert_allclose(
            _np(out.spherical_harmonic)[:n], _np(cloud.spherical_harmonic),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            _np(out.scale_opacity)[:n], so, rtol=2e-5, atol=1e-5
        )

    @pytest.mark.parametrize("degree", [0, 2, 4])
    def test_ply_native_matches_python(self, degree):
        from bevy_gaussian_splatting_tpu import native
        from bevy_gaussian_splatting_tpu.io import ply as ply_codec

        if not native.available():
            pytest.skip("no native toolchain")
        cloud = bgs.random_gaussians_3d_seeded(25, seed=7, sh_degree=degree)
        so = _np(cloud.scale_opacity).copy()
        so[:, :3] = np.abs(so[:, :3]) + 0.1
        so[:, 3] = np.clip(so[:, 3], 0.05, 0.95)
        rot = _np(cloud.rotation)
        rot = rot / np.linalg.norm(rot, axis=1, keepdims=True)
        cloud = dataclasses.replace(
            cloud,
            scale_opacity=jnp.asarray(so),
            rotation=jnp.asarray(rot.astype(np.float32)),
        )
        data = ply_codec.write_ply_3d(cloud)
        for strict in (True, False):
            a = ply_codec.parse_ply_3d(data, strict_reference=strict, use_native=True)
            b = ply_codec.parse_ply_3d(data, strict_reference=strict, use_native=False)
            assert_clouds_equal(a, b, atol=1e-6)

    def test_ply_explicit_degree_override(self):
        """Loading a degree-3 file at sh_degree=1 truncates exactly like a
        reference sh1 build would (f_rest remap with per_channel=(1+1)^2)."""
        from bevy_gaussian_splatting_tpu.io import ply as ply_codec

        cloud = bgs.random_gaussians_3d_seeded(20, seed=9, sh_degree=3)
        so = _np(cloud.scale_opacity).copy()
        so[:, :3] = np.abs(so[:, :3]) + 0.1
        so[:, 3] = np.clip(so[:, 3], 0.05, 0.95)
        cloud = dataclasses.replace(cloud, scale_opacity=jnp.asarray(so))
        data = ply_codec.write_ply_3d(cloud)
        for use_native in (True, False):
            out = ply_codec.parse_ply_3d(
                data, strict_reference=False, sh_degree=1, use_native=use_native
            )
            assert out.spherical_harmonic.shape[1] == 12

    @pytest.mark.parametrize("degree", [1, 4])
    def test_npz_roundtrip(self, degree):
        from bevy_gaussian_splatting_tpu.io import gcloud as gc

        cloud = bgs.random_gaussians_3d_seeded(12, seed=degree, sh_degree=degree)
        out = gc.decode_npz(gc.encode_npz(cloud))
        assert_clouds_equal(cloud, out)


class TestKhrPerDegree:
    def _export_import(self, cloud, sh_degree):
        from bevy_gaussian_splatting_tpu.io.scene import (
            encode_khr_gaussian_scene_glb_bytes,
            load_khr_gaussian_scene,
        )

        glb = encode_khr_gaussian_scene_glb_bytes(
            [("c", cloud, np.eye(4, dtype=np.float32))]
        )
        return load_khr_gaussian_scene(glb, sh_degree=sh_degree)

    @pytest.mark.parametrize("degree", [0, 1, 2, 3])
    def test_roundtrip_data_driven_width(self, degree):
        cloud = bgs.random_gaussians_3d_seeded(30, seed=degree, sh_degree=degree)
        so = _np(cloud.scale_opacity).copy()
        so[:, :3] = np.abs(so[:, :3]) + 0.1
        so[:, 3] = np.clip(so[:, 3], 0.0, 1.0)
        rot = _np(cloud.rotation)
        rot = rot / np.linalg.norm(rot, axis=1, keepdims=True)
        cloud = dataclasses.replace(
            cloud,
            scale_opacity=jnp.asarray(so),
            rotation=jnp.asarray(rot.astype(np.float32)),
        )
        scene = self._export_import(cloud, sh_degree=None)
        out = scene.clouds[0].cloud
        assert out.spherical_harmonic.shape[1] == sh_coeff_width(degree)
        np.testing.assert_allclose(
            _np(out.spherical_harmonic)[:, : num_sh_coefficients(degree) * 3],
            _np(cloud.spherical_harmonic)[:, : num_sh_coefficients(degree) * 3],
            atol=1e-6,
        )

    def test_default_load_stays_degree3(self):
        cloud = bgs.random_gaussians_3d_seeded(10, seed=3, sh_degree=1)
        so = _np(cloud.scale_opacity).copy()
        so[:, :3] = np.abs(so[:, :3]) + 0.1
        cloud = dataclasses.replace(cloud, scale_opacity=jnp.asarray(so))
        scene = self._export_import(cloud, sh_degree=3)
        out = scene.clouds[0].cloud
        assert out.spherical_harmonic.shape[1] == 48
        np.testing.assert_allclose(
            _np(out.spherical_harmonic)[:, :12], _np(cloud.spherical_harmonic),
            atol=1e-6,
        )


class TestRenderPerDegree:
    @pytest.mark.parametrize("degree", DEGREES)
    def test_oracle_matches_zero_extended_deg3(self, degree):
        """A degree-d cloud must render exactly like the same cloud stored at
        degree 3 with coefficients beyond d zeroed / truncated at 48 —
        the reference shader evaluates at most degree 3
        (spherical_harmonics.wgsl:41-65)."""
        from bevy_gaussian_splatting_tpu.ops.rasterize_ref import render_oracle

        cloud = bgs.random_gaussians_3d_seeded(64, seed=degree, sh_degree=degree)
        so = _np(cloud.scale_opacity).copy()
        so[:, :3] = np.abs(so[:, :3]) * 0.05 + 0.02
        so[:, 3] = np.clip(np.abs(so[:, 3]), 0.2, 0.9)
        pos = _np(cloud.position_visibility).copy()
        pos[:, :3] *= 0.05
        cloud = dataclasses.replace(
            cloud,
            scale_opacity=jnp.asarray(so),
            position_visibility=jnp.asarray(pos),
        )
        camera = bgs.Camera.create(
            eye=(0.0, 0.0, 6.0), target=(0.0, 0.0, 0.0), width=64, height=64
        )
        settings = bgs.CloudSettings()
        img_d = render_oracle(cloud, camera, settings)
        img_3 = render_oracle(set_sh_degree(cloud, 3), camera, settings)
        np.testing.assert_allclose(_np(img_d), _np(img_3), atol=2e-6)

    @pytest.mark.parametrize("degree", [0, 4])
    def test_tiled_matches_oracle(self, degree):
        from bevy_gaussian_splatting_tpu.ops.rasterize_ref import render_oracle
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled

        cloud = bgs.random_gaussians_3d_seeded(64, seed=degree, sh_degree=degree)
        so = _np(cloud.scale_opacity).copy()
        so[:, :3] = np.abs(so[:, :3]) * 0.05 + 0.02
        so[:, 3] = np.clip(np.abs(so[:, 3]), 0.2, 0.9)
        pos = _np(cloud.position_visibility).copy()
        pos[:, :3] *= 0.05
        cloud = dataclasses.replace(
            cloud,
            scale_opacity=jnp.asarray(so),
            position_visibility=jnp.asarray(pos),
        )
        camera = bgs.Camera.create(
            eye=(0.0, 0.0, 6.0), target=(0.0, 0.0, 0.0), width=64, height=64
        )
        settings = bgs.CloudSettings()
        ref = render_oracle(cloud, camera, settings)
        tiled = render_tiled(cloud, camera, settings, differentiable=False)
        np.testing.assert_allclose(_np(tiled), _np(ref), atol=2e-5)
