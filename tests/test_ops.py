"""Math-op unit tests: covariance, SH, sort keys (reference analogue: tests/radix.rs
CPU key-model tests + shader math invariants)."""

import jax
import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.models.camera import Camera
from bevy_gaussian_splatting_tpu.ops import covariance, sh, sort
from bevy_gaussian_splatting_tpu.ops.transforms import world_to_clip, in_frustum


def _np(x):
    return np.asarray(x)


class TestCovariance:
    def test_rotation_matrix_identity(self):
        q = jnp.array([1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(_np(covariance.quat_to_rotation_matrix(q)), np.eye(3), atol=1e-6)

    def test_rotation_matrix_orthonormal(self, rng):
        q = rng.normal(size=(10, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        R = _np(covariance.quat_to_rotation_matrix(jnp.asarray(q)))
        for m in R:
            np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
            assert abs(np.linalg.det(m) - 1.0) < 1e-5

    def test_cov3d_axis_aligned(self):
        # identity rotation: Sigma = diag(scale^2)  (covariance.rs:31-41)
        q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        s = jnp.array([[1.0, 2.0, 3.0]])
        cov = _np(covariance.compute_cov3d(q, s))[0]
        np.testing.assert_allclose(cov, [1.0, 0.0, 0.0, 4.0, 0.0, 9.0], atol=1e-5)

    def test_cov3d_matches_dense_reference(self, rng):
        # brute-force Sigma = (S R)^T (S R) with the reference's R layout
        q = rng.normal(size=(20, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        s = rng.uniform(0.1, 2.0, size=(20, 3)).astype(np.float32)
        cov6 = _np(covariance.compute_cov3d(jnp.asarray(q), jnp.asarray(s)))
        R = _np(covariance.quat_to_rotation_matrix(jnp.asarray(q)))
        for i in range(20):
            M = np.diag(s[i]) @ R[i]
            sigma = M.T @ M
            expect = [sigma[0, 0], sigma[0, 1], sigma[0, 2], sigma[1, 1], sigma[1, 2], sigma[2, 2]]
            np.testing.assert_allclose(cov6[i], expect, rtol=1e-4, atol=1e-5)

    def test_cov2d_isotropic_centered(self):
        # An isotropic gaussian centered on the optical axis must project to an
        # isotropic 2D covariance with the +0.3 dilation on the diagonal.
        cam = Camera.create(eye=(0.0, 0.0, 5.0), target=(0.0, 0.0, 0.0), width=128, height=128)
        cov3d = jnp.array([[0.01, 0.0, 0.0, 0.01, 0.0, 0.01]])
        pos = jnp.array([[0.0, 0.0, 0.0]])
        c2 = _np(
            covariance.cov2d(
                pos, cov3d, cam.view_from_world, cam.clip_from_view,
                jnp.array([128.0, 128.0]),
            )
        )[0]
        assert abs(c2[1]) < 1e-4  # no xy correlation
        assert abs(c2[0] - c2[2]) < 1e-3  # isotropic
        # focal = P00 * w; sigma2d ~ (focal/z)^2 * sigma3d + 0.3
        focal = float(cam.clip_from_view[0, 0]) * 128.0
        expect = (focal / 5.0) ** 2 * 0.01 + 0.3
        np.testing.assert_allclose(c2[0], expect, rtol=1e-3)

    def test_conic_and_eigen(self):
        cov = jnp.array([[4.0, 1.0, 2.0]])
        conic = _np(covariance.conic_from_cov2d(cov))[0]
        det = 4.0 * 2.0 - 1.0
        np.testing.assert_allclose(conic, [2.0 / det, -1.0 / det, 4.0 / det], rtol=1e-6)
        l1, l2 = covariance.cov2d_eigen(cov)
        # eigenvalues of [[4,1],[1,2]]
        expect = np.linalg.eigvalsh(np.array([[4.0, 1.0], [1.0, 2.0]]))
        np.testing.assert_allclose([float(l2[0]), float(l1[0])], expect, rtol=1e-5)

    def test_opacity_cutoff(self):
        op = jnp.array([1.0, 0.5, 0.011109])
        c = _np(covariance.opacity_cutoff(op, adaptive=True))
        np.testing.assert_allclose(c[0], 3.0, rtol=1e-5)
        assert c[1] < 3.0
        assert c[2] < c[1]
        c3 = _np(covariance.opacity_cutoff(op, adaptive=False))
        np.testing.assert_allclose(c3, 3.0)


class TestSphericalHarmonics:
    def test_degree0_constant(self, rng):
        shv = jnp.asarray(rng.normal(size=(5, 48)).astype(np.float32))
        d1 = jnp.array([[0.0, 0.0, 1.0]] * 5)
        d2 = jnp.array([[1.0, 0.0, 0.0]] * 5)
        c1 = sh.spherical_harmonics_lookup(d1, shv, degree=0)
        c2 = sh.spherical_harmonics_lookup(d2, shv, degree=0)
        np.testing.assert_allclose(_np(c1), _np(c2), atol=1e-6)
        np.testing.assert_allclose(
            _np(c1), 0.5 + float(sh.SHC[0]) * _np(shv[:, :3]), atol=1e-6
        )

    def test_basis_matches_wgsl_expressions(self, rng):
        # direct transcription check of spherical_harmonics.wgsl:40-66
        d = rng.normal(size=(7, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        basis = _np(sh.sh_basis(jnp.asarray(d), degree=3))
        x, y, z = d[:, 0], d[:, 1], d[:, 2]
        shc = np.asarray(sh.SHC)
        np.testing.assert_allclose(basis[:, 1], shc[1] * y, rtol=1e-5)
        np.testing.assert_allclose(basis[:, 2], shc[2] * z, rtol=1e-5)
        np.testing.assert_allclose(basis[:, 3], shc[3] * x, rtol=1e-5)
        np.testing.assert_allclose(basis[:, 6], shc[6] * (2 * z * z - x * x - y * y), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(basis[:, 10], shc[10] * x * y * z, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(basis[:, 15], shc[15] * x * (x * x - 3 * y * y), rtol=1e-4, atol=1e-6)

    def test_srgb_roundtrip(self, rng):
        v = jnp.asarray(rng.uniform(0.0, 1.0, size=(100,)).astype(np.float32))
        np.testing.assert_allclose(_np(sh.linear_to_srgb(sh.srgb_to_linear(v))), _np(v), atol=1e-5)

    def test_spherindrical_reduces_to_spatial_at_zero_temporal_coeffs(self, rng):
        shv = np.zeros((3, 144), np.float32)
        shv[:, :48] = rng.normal(size=(3, 48)).astype(np.float32)
        d = rng.normal(size=(3, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        dir_t = jnp.array([0.3, 0.5, 0.9])
        got = sh.spherindrical_harmonics_lookup(
            jnp.asarray(d), dir_t, jnp.asarray(shv), duration=jnp.float32(1.0)
        )
        want = sh.spherical_harmonics_lookup(jnp.asarray(d), jnp.asarray(shv[:, :48]))
        np.testing.assert_allclose(_np(got), _np(want), atol=1e-5)


class TestSortKeys:
    """Port of the reference's CPU key-model tests (tests/radix.rs:9-106)."""

    def _keys(self, positions, cam, depth_bits):
        return _np(
            sort.radix_depth_key(
                jnp.asarray(positions),
                jnp.eye(4),
                cam.clip_from_world,
                cam.world_position,
                depth_bits,
            )
        )

    def test_back_to_front_ordering(self):
        cam = Camera.create(eye=(0.0, 0.0, 10.0), target=(0.0, 0.0, 0.0))
        # three gaussians at increasing distance from the camera
        pos = np.array([[0.0, 0.0, 5.0], [0.0, 0.0, 0.0], [0.0, 0.0, -5.0]], np.float32)
        for bits in (24, 32):
            keys = self._keys(pos, cam, bits)
            # farther -> smaller key (sorted ascending = back to front)
            assert keys[2] < keys[1] < keys[0], keys

    def test_frustum_culled_sentinel(self):
        cam = Camera.create(eye=(0.0, 0.0, 10.0), target=(0.0, 0.0, 0.0))
        pos = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 50.0]], np.float32)  # behind cam
        keys = self._keys(pos, cam, 32)
        assert keys[1] == 0xFFFFFFFF
        assert keys[0] != 0xFFFFFFFF

    def test_16bit_collapses_close_depths(self):
        # tests/radix.rs:82-94 — 16-bit keys may merge nearby depths.
        # Construct two distances whose squared-distance f32 bit patterns share
        # the same high 16 bits but differ in the low bits.
        cam = Camera.create(eye=(0.0, 0.0, 10.0), target=(0.0, 0.0, 0.0))
        d2a = np.float32(100.0)
        d2b = (d2a.view(np.uint32) + np.uint32(100)).view(np.float32)
        za = 10.0 - np.sqrt(d2a)
        zb = 10.0 - np.sqrt(d2b)
        pos = np.array([[0.0, 0.0, za], [0.0, 0.0, zb]], np.float32)
        k16 = self._keys(pos, cam, 16)
        k32 = self._keys(pos, cam, 32)
        assert k32[0] != k32[1]
        assert k16[0] == k16[1]

    def test_key_formula_matches_bit_model(self):
        cam = Camera.create(eye=(0.0, 0.0, 10.0), target=(0.0, 0.0, 0.0))
        pos = np.array([[1.0, 2.0, 3.0]], np.float32)
        keys = self._keys(pos, cam, 32)
        diff = pos[0] - _np(cam.world_position)
        dist2 = np.float32(np.dot(diff, diff))
        expect = np.uint32(0xFFFFFFFF) - dist2.view(np.uint32)
        assert keys[0] == expect

    def test_digit_bookkeeping(self):
        # tests/radix.rs:42-62 digit place / shift / parity selection
        assert sort.digit_places(16) == 2
        assert sort.digit_places(24) == 3
        assert sort.digit_places(32) == 4
        assert sort.key_shift(16) == 16
        assert sort.key_shift(32) == 0
        assert sort.final_pass_parity(16) == 0
        assert sort.final_pass_parity(24) == 1
        assert sort.final_pass_parity(32) == 0
        key = np.uint32(0xAABBCCDD)
        assert sort.digit_of(key, 0) == 0xDD
        assert sort.digit_of(key, 3) == 0xAA

    def test_device_sort_matches_host_sort(self, rng):
        cam = Camera.create(eye=(0.0, 0.0, 30.0), target=(0.0, 0.0, 0.0))
        pos = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
        keys, idx = sort.sort_gaussians_radix(
            jnp.asarray(pos), jnp.eye(4), cam.clip_from_world, cam.world_position, 32
        )
        host_idx = sort.sort_gaussians_host(pos, np.eye(4), _np(cam.world_position))
        # all in frustum here -> device order should equal host back-to-front order
        np.testing.assert_array_equal(_np(idx), host_idx)
        assert bool(jnp.all(keys[:-1] <= keys[1:]))


class TestTransforms:
    def test_in_frustum_window(self):
        pts = jnp.array(
            [
                [0.0, 0.0, 0.5],
                [1.05, 0.0, 0.5],
                [1.15, 0.0, 0.5],
                [0.0, 0.0, -0.01],
                [0.0, 0.0, 1.01],
            ]
        )
        got = _np(in_frustum(pts))
        np.testing.assert_array_equal(got, [True, True, False, False, False])

    def test_world_to_clip_w_division(self):
        cam = Camera.create(eye=(0.0, 0.0, 5.0), target=(0.0, 0.0, 0.0), width=64, height=64)
        p = jnp.array([[0.5, 0.5, 0.0]])
        ndc = _np(world_to_clip(p, cam.clip_from_world))[0]
        assert ndc[3] > 0.99  # w ~= 1 after division


class TestSurfelPowerForms:
    def test_affine_power_matches_fragment_power(self):
        """The folded affine form q = dxn*A + dyn*B + C (what the oracle and
        both compositors evaluate) must reproduce the WGSL-faithful hu x hv
        formulation (gaussian_2d.wgsl:134-156) — identical algebra, so the
        tolerance is tight.  Keeps an independent check on the reference
        form now that all production paths share the folded coefficients
        (advisor round-2 finding: surfel_fragment_power was dead code)."""
        from bevy_gaussian_splatting_tpu.ops.gaussian_2d import (
            surfel_affine_coeffs,
            surfel_affine_power,
            surfel_fragment_power,
        )

        rng = np.random.default_rng(21)
        n, width = 512, 128.0
        local_to_pixel = jnp.asarray(
            rng.standard_normal((n, 3, 3)), jnp.float32
        )
        mean_2d = jnp.asarray(rng.standard_normal((n, 2)) * 2.0, jnp.float32)
        dxn = jnp.asarray(rng.standard_normal((n,)) * 0.05, jnp.float32)
        dyn = jnp.asarray(rng.standard_normal((n,)) * 0.05, jnp.float32)
        pixel_coord = mean_2d + width * jnp.stack([dxn, dyn], axis=-1)

        A, B, C = surfel_affine_coeffs(local_to_pixel, mean_2d, width)
        got = _np(surfel_affine_power(A, B, C, dxn, dyn, width))
        want = _np(surfel_fragment_power(local_to_pixel, pixel_coord, mean_2d))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class TestFrontDepthPermCarry:
    def test_multi_carry_matches_single_and_gather(self):
        """front_depth_perm's multi-operand carry must equal both the single
        -carry path and an explicit gather by the returned perm."""
        from bevy_gaussian_splatting_tpu.ops.rasterize_tile import (
            front_depth_perm,
        )

        rng = np.random.default_rng(3)
        n = 4096
        key = jnp.asarray(rng.integers(0, 1 << 31, n), jnp.uint32)
        active = jnp.asarray(rng.random(n) < 0.8)
        c_int = jnp.asarray(rng.integers(0, 1 << 28, n), jnp.int32)
        c_f1 = jnp.asarray(rng.standard_normal(n), jnp.float32)
        c_f2 = jnp.asarray(rng.standard_normal(n), jnp.float32)

        perm_a, carried_a = front_depth_perm(key, active=active, carry=c_int)
        perm_b, carried_b = front_depth_perm(
            key, active=active, carry=(c_int, c_f1, c_f2)
        )
        np.testing.assert_array_equal(np.asarray(perm_a), np.asarray(perm_b))
        np.testing.assert_array_equal(
            np.asarray(carried_a), np.asarray(carried_b[0])
        )
        for c, got in ((c_f1, carried_b[1]), (c_f2, carried_b[2])):
            np.testing.assert_array_equal(
                np.asarray(c)[np.asarray(perm_b)], np.asarray(got)
            )
