"""Morph (interpolate/particle) and query (select/sparse/raycast) tests.

Reference analogues: src/morph/interpolate.wgsl math, src/query/*.rs behavior.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.morph.interpolate import (
    interpolate_clouds,
    interpolation_factor,
)
from bevy_gaussian_splatting_tpu.morph.particle import (
    ParticleBehaviors,
    apply_particle_behaviors,
)
from bevy_gaussian_splatting_tpu.query.raycast import points_in_mesh
from bevy_gaussian_splatting_tpu.query.select import (
    Select,
    apply_selection,
    extract_selection,
    selection_from_visibility,
)
from bevy_gaussian_splatting_tpu.query.sparse import sparse_select


def _np(x):
    return np.asarray(x)


class TestInterpolate:
    def test_factor(self):
        # interpolate.wgsl:52-58
        assert float(interpolation_factor(0.5, 0.0, 1.0)) == 0.5
        assert float(interpolation_factor(-1.0, 0.0, 1.0)) == 0.0
        assert float(interpolation_factor(2.0, 0.0, 1.0)) == 1.0
        # degenerate duration snaps by time >= stop
        assert float(interpolation_factor(1.0, 1.0, 1.0)) == 1.0
        assert float(interpolation_factor(0.5, 1.0, 1.0)) == 0.0

    def test_endpoints_and_midpoint(self):
        a = bgs.random_gaussians_3d_seeded(32, seed=1)
        b = bgs.random_gaussians_3d_seeded(32, seed=2)
        at0 = interpolate_clouds(a, b, 0.0)
        at1 = interpolate_clouds(a, b, 1.0)
        np.testing.assert_allclose(_np(at0.position_visibility), _np(a.position_visibility), atol=1e-6)
        np.testing.assert_allclose(_np(at1.spherical_harmonic), _np(b.spherical_harmonic), atol=1e-6)
        # rotations at endpoints are the normalized inputs (nlerp)
        qa = _np(a.rotation) / np.linalg.norm(_np(a.rotation), axis=1, keepdims=True)
        np.testing.assert_allclose(_np(at0.rotation), qa, atol=1e-5)

        mid = interpolate_clouds(a, b, 0.5)
        np.testing.assert_allclose(
            _np(mid.position),
            0.5 * (_np(a.position) + _np(b.position)),
            atol=1e-5,
        )
        np.testing.assert_allclose(np.linalg.norm(_np(mid.rotation), axis=1), 1.0, atol=1e-5)

    def test_size_mismatch_raises(self):
        a = bgs.random_gaussians_3d_seeded(8)
        b = bgs.random_gaussians_3d_seeded(16)
        try:
            interpolate_clouds(a, b, 0.5)
            assert False
        except ValueError:
            pass


class TestParticles:
    def test_integration_step(self):
        cloud = bgs.test_model_3d()
        n = len(cloud)
        behaviors = ParticleBehaviors(
            indices=jnp.arange(n, dtype=jnp.int32),
            velocity=jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (n, 1)),
            acceleration=jnp.tile(jnp.array([[0.0, 2.0, 0.0, 0.0]]), (n, 1)),
            jerk=jnp.zeros((n, 4)),
        )
        dt = 0.1
        c2, b2 = apply_particle_behaviors(cloud, behaviors, dt)
        # x += v*dt; y += 0.5*a*dt^2
        np.testing.assert_allclose(
            _np(c2.position)[:, 0], _np(cloud.position)[:, 0] + 0.1, atol=1e-6
        )
        np.testing.assert_allclose(
            _np(c2.position)[:, 1], _np(cloud.position)[:, 1] + 0.5 * 2.0 * 0.01, atol=1e-6
        )
        # velocity integrated: v += a*dt
        np.testing.assert_allclose(_np(b2.velocity)[:, 1], 0.2, atol=1e-6)

    def test_negative_index_inert(self):
        cloud = bgs.test_model_3d()
        behaviors = ParticleBehaviors(
            indices=jnp.full((4,), -1, jnp.int32),
            velocity=jnp.ones((4, 4)),
            acceleration=jnp.zeros((4, 4)),
            jerk=jnp.zeros((4, 4)),
        )
        c2, b2 = apply_particle_behaviors(cloud, behaviors, 0.5)
        np.testing.assert_array_equal(_np(c2.position_visibility), _np(cloud.position_visibility))
        np.testing.assert_array_equal(_np(b2.velocity), _np(behaviors.velocity))


class TestSelect:
    def test_apply_and_invert(self):
        cloud = bgs.random_gaussians_3d_seeded(10, seed=1)
        sel = Select([1, 3, 5])
        selected = apply_selection(cloud, sel)
        vis = _np(selected.visibility)
        np.testing.assert_array_equal(np.nonzero(vis >= 0.5)[0], [1, 3, 5])
        inv = sel.invert(10)
        np.testing.assert_array_equal(inv.indices, [0, 2, 4, 6, 7, 8, 9])
        back = selection_from_visibility(selected)
        np.testing.assert_array_equal(back.indices, [1, 3, 5])

    def test_extract_and_save(self, tmp_path):
        cloud = bgs.random_gaussians_3d_seeded(10, seed=1)
        sub = extract_selection(cloud, Select([0, 9]))
        assert len(sub) == 2
        np.testing.assert_allclose(_np(sub.position)[1], _np(cloud.position)[9])
        from bevy_gaussian_splatting_tpu.query.select import save_selection

        nbytes = save_selection(cloud, Select([0, 9]), str(tmp_path / "live_output.gcloud"))
        assert nbytes > 0


class TestSparse:
    def test_outlier_detection(self):
        # dense cluster + 2 far outliers
        rng = np.random.default_rng(3)
        cluster = rng.normal(0, 0.01, (100, 3)).astype(np.float32)
        outliers = np.array([[5.0, 5.0, 5.0], [-5.0, -5.0, -5.0]], np.float32)
        pos = np.concatenate([cluster, outliers])
        pv = np.concatenate([pos, np.ones((102, 1), np.float32)], axis=1)
        cloud = bgs.Gaussian3dCloud(
            position_visibility=jnp.asarray(pv),
            spherical_harmonic=jnp.zeros((102, 48)),
            rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (102, 1)),
            scale_opacity=jnp.full((102, 4), 0.1),
        )
        sel = sparse_select(cloud, radius=0.05, neighbor_threshold=3)
        np.testing.assert_array_equal(sel.indices, [100, 101])


class TestRaycast:
    def test_points_in_unit_cube(self):
        # unit cube triangle mesh
        v = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
             [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
            np.float32,
        )
        f = np.array(
            [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
             [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
             [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]],
            np.int32,
        )
        # avoid y == z: those rays run along the face diagonal shared by two
        # triangles and hit both (even parity) — degenerate in the reference too
        pts = np.array(
            [[0.5, 0.3, 0.7], [1.5, 0.3, 0.7], [-0.1, 0.3, 0.7], [0.9, 0.2, 0.6]],
            np.float32,
        )
        got = _np(points_in_mesh(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(f)))
        np.testing.assert_array_equal(got, [True, False, False, True])

    def test_mesh_transform(self):
        v = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
             [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
            np.float32,
        )
        f = np.array(
            [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
             [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
             [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]],
            np.int32,
        )
        # mesh shifted by +10 in x
        mt = jnp.eye(4).at[0, 3].set(10.0)
        pts = np.array([[10.5, 0.3, 0.7], [0.5, 0.3, 0.7]], np.float32)
        got = _np(points_in_mesh(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(f), mt))
        np.testing.assert_array_equal(got, [True, False])
