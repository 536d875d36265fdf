"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4.5).

Checks: sharded render == single-device tiled render (collective identity),
sharded gradients match single-device gradients, train step reduces loss,
same-seed determinism.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bevy_gaussian_splatting_tpu as bgs
from bevy_gaussian_splatting_tpu.ops.rasterize_tile import render_tiled
from bevy_gaussian_splatting_tpu.parallel.render import (
    make_mesh,
    make_sharded_render,
    make_train_step,
    shard_cloud,
)


def _np(x):
    return np.asarray(x)


W = H = 128
CAM = bgs.Camera.create(eye=(0.0, 0.0, 60.0), target=(0.0, 0.0, 0.0), width=W, height=H)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    return make_mesh(8)


class TestShardedRender:
    def _compare(self, settings, n=300, seed=1, atol=3e-5):
        cloud = bgs.random_gaussians_3d_seeded(n, seed=seed)
        mesh = make_mesh(8)
        sharded = shard_cloud(cloud, mesh)
        fn = make_sharded_render(mesh, settings, W, H)
        img = fn(sharded, CAM)
        # reference: single-device tiled render on the same padded cloud
        padded = cloud.pad(multiple=max(256, 8 * 8))
        ref = render_tiled(padded, CAM, settings, width=W, height=H)
        np.testing.assert_allclose(_np(img), _np(ref), atol=atol)

    def test_obb_default(self, mesh):
        self._compare(bgs.CloudSettings())

    def test_aabb(self, mesh):
        self._compare(bgs.CloudSettings(aabb=True))

    def test_larger_cloud(self, mesh):
        self._compare(bgs.CloudSettings(), n=2000, seed=3)

    def test_2dgs_surfel(self, mesh):
        # Band binning/pixels run in the full image frame, so the pair sets
        # and pixel coords match single-chip exactly; the remaining tolerance
        # covers cross-program ulp differences in the projected surfel
        # homography (us = px/pz amplifies an input ulp near small |pz|),
        # which XLA does not guarantee bitwise across compilations.
        self._compare(
            bgs.CloudSettings(gaussian_mode=bgs.GaussianMode.GAUSSIAN_2D),
            atol=3e-4,
        )

    def test_4dgs_temporal(self, mesh):
        # Cross-program tolerance note: the OBB eigenvector of a near-isotropic
        # projected covariance is numerically ill-defined (inherited from the
        # reference's helpers.wgsl eigendecomposition), so a handful of
        # quad-clip boundary pixels flip between any two XLA compilations —
        # measured identically between jitted and unjitted single-chip
        # renders of the same code.  Assert bulk parity + small flip area.
        cloud = bgs.random_gaussians_4d_seeded(300, seed=4)
        mesh8 = make_mesh(8)
        sharded = shard_cloud(cloud, mesh8)
        settings = bgs.CloudSettings(
            gaussian_mode=bgs.GaussianMode.GAUSSIAN_4D, time=0.4
        )
        fn = make_sharded_render(mesh8, settings, W, H)
        img = _np(fn(sharded, CAM, time=0.4))
        padded = cloud.pad(multiple=max(256, 8 * 8))
        ref = _np(
            render_tiled(padded, CAM, settings, width=W, height=H, time=jnp.float32(0.4))
        )
        diff = np.abs(img - ref)
        assert np.isfinite(img).all()
        assert (diff > 3e-5).mean() < 0.01, (diff > 3e-5).mean()
        assert diff.max() < 0.1, diff.max()

    def test_deterministic(self, mesh):
        cloud = bgs.random_gaussians_3d_seeded(200, seed=2)
        sharded = shard_cloud(cloud, mesh)
        fn = make_sharded_render(mesh, bgs.CloudSettings(), W, H)
        a = _np(fn(sharded, CAM))
        b = _np(fn(sharded, CAM))
        np.testing.assert_array_equal(a, b)


class TestCameraParallel:
    def test_2d_mesh_multicam_matches_vmap(self):
        # (camera=2, tiles=4) mesh: camera batch splits across the camera
        # axis; result must equal the single-device vmap batch renderer
        from bevy_gaussian_splatting_tpu.parallel.render import (
            make_sharded_render_multicam,
        )
        from bevy_gaussian_splatting_tpu.render.multi_camera import (
            render_multi_camera,
            stack_cameras,
        )

        mesh2d = make_mesh(8, camera_parallel=2)
        assert dict(mesh2d.shape) == {"camera": 2, "tiles": 4}
        settings = bgs.CloudSettings()
        cloud = bgs.random_gaussians_3d_seeded(300, seed=5)
        sharded = shard_cloud(cloud, mesh2d)
        cams = [
            bgs.Camera.create(eye=e, target=(0, 0, 0), width=64, height=64)
            for e in ((0, 0, 60.0), (30.0, 10.0, 50.0))
        ]
        fn = make_sharded_render_multicam(mesh2d, settings, 64, 64)
        imgs = fn(sharded, stack_cameras(cams))
        assert imgs.shape == (2, 64, 64, 4)
        padded = cloud.pad(multiple=max(256, 8 * 8))
        ref = render_multi_camera(padded, cams, settings)
        np.testing.assert_allclose(_np(imgs), _np(ref), atol=3e-5)


    def test_2d_mesh_multicam_train_grads_match(self):
        # camera-parallel training: one step on the (2, 4) mesh must match a
        # single-device step on the mean multi-view objective
        import dataclasses as dc

        import optax

        from bevy_gaussian_splatting_tpu.parallel.render import (
            make_train_step_multicam,
        )
        from bevy_gaussian_splatting_tpu.render.multi_camera import (
            render_multi_camera,
            stack_cameras,
        )

        mesh2d = make_mesh(8, camera_parallel=2)
        settings = bgs.CloudSettings()
        cloud = bgs.random_gaussians_3d_seeded(200, seed=6)
        padded = cloud.pad(multiple=max(256, 8 * 8))
        cams = [
            bgs.Camera.create(eye=e, target=(0, 0, 0), width=64, height=64)
            for e in ((0, 0, 60.0), (30.0, 10.0, 50.0))
        ]
        targets = render_multi_camera(padded, cams, settings) * 0.9

        # single-device reference step (differentiable per-camera renders)
        def full_loss(c):
            imgs = jnp.stack([
                render_tiled(
                    c, cam, settings, width=64, height=64, differentiable=True
                )
                for cam in cams
            ])
            return jnp.mean((imgs - targets) ** 2)

        opt = optax.adam(1e-3)
        g_ref = jax.grad(full_loss)(padded)
        upd, _ = opt.update(g_ref, opt.init(padded))
        c_ref = optax.apply_updates(padded, upd)

        sharded = shard_cloud(cloud, mesh2d)
        step, init = make_train_step_multicam(
            mesh2d, settings, 64, 64, learning_rate=1e-3
        )
        c_new, _, loss = step(
            sharded, init(sharded), stack_cameras(cams), targets
        )
        np.testing.assert_allclose(
            float(loss), float(full_loss(padded)), rtol=1e-5
        )
        for f in ("position_visibility", "scale_opacity", "spherical_harmonic"):
            np.testing.assert_allclose(
                _np(getattr(c_new, f)), _np(getattr(c_ref, f)),
                atol=2e-4, err_msg=f,
            )


class TestShardedTraining:
    def test_loss_decreases_and_grads_match(self, mesh):
        settings = bgs.CloudSettings(aabb=True)
        target_cloud = bgs.random_gaussians_3d_seeded(120, seed=7)
        padded_target = target_cloud.pad(multiple=max(256, 8 * 8))
        target = render_tiled(padded_target, CAM, settings, width=W, height=H)

        start_cloud = dataclasses.replace(
            target_cloud,
            position_visibility=target_cloud.position_visibility
            + jnp.array([0.5, 0.0, 0.0, 0.0]),
        )
        sharded = shard_cloud(start_cloud, mesh)
        step, init = make_train_step(mesh, settings, W, H, learning_rate=5e-3)
        opt_state = init(sharded)

        losses = []
        cloud = sharded
        for _ in range(8):
            cloud, opt_state, loss = step(cloud, opt_state, CAM, target)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.9, losses

    def test_sharded_grads_match_single_device(self, mesh):
        settings = bgs.CloudSettings(aabb=True)
        cloud = bgs.random_gaussians_3d_seeded(100, seed=9)
        padded = cloud.pad(multiple=max(256, 8 * 8))
        target = render_tiled(padded, CAM, settings, width=W, height=H) * 0.9

        def single_loss(c):
            img = render_tiled(c, CAM, settings, width=W, height=H)
            return jnp.mean((img - target) ** 2)

        g_single = jax.grad(single_loss)(padded)

        # sharded grads via the train-step's internal loss (extracted by one
        # sgd step of lr 0 -> compare grads through a fresh value_and_grad)
        from bevy_gaussian_splatting_tpu.parallel.render import (
            TILES_AXIS,
            _local_band_render,
        )
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from functools import partial

        n_bands = 8

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(TILES_AXIS), P(TILES_AXIS)),
            out_specs=P(TILES_AXIS),
            check_vma=False,
        )
        def grads_fn(cloud_shard, target_band):
            def local_loss(shard):
                img_band = _local_band_render(
                    shard, CAM, settings, jnp.eye(4), jnp.zeros(4),
                    jnp.float32(0.0), W, H, n_bands,
                )
                # local band term only; gather transpose sums across devices
                return jnp.sum((img_band - target_band) ** 2) / (H * W * 4)

            return jax.grad(local_loss)(cloud_shard)

        sharded = shard_cloud(cloud, mesh)
        g_sharded = grads_fn(sharded, target)

        for f in ("position_visibility", "spherical_harmonic", "rotation", "scale_opacity"):
            a = _np(getattr(g_single, f))
            b = _np(getattr(g_sharded, f))
            scale = np.abs(a).max() + 1e-12
            np.testing.assert_allclose(b, a, atol=5e-4 * scale, err_msg=f)


class TestShardedPallas:
    """Sharded renderer with the Pallas compositor (interpret mode on the CPU
    mesh): forward parity + gradient parity vs the XLA sharded path."""

    def test_pallas_sharded_render_matches(self, mesh):
        settings = bgs.CloudSettings()
        cloud = bgs.random_gaussians_3d_seeded(300, seed=1)
        sharded = shard_cloud(cloud, mesh)
        img_p = make_sharded_render(mesh, settings, W, H, compositor="pallas")(
            sharded, CAM
        )
        padded = cloud.pad(multiple=max(256, 8 * 8))
        ref = render_tiled(padded, CAM, settings, width=W, height=H)
        np.testing.assert_allclose(_np(img_p), _np(ref), atol=3e-5)

    def test_pallas_sharded_2dgs_render_matches(self, mesh):
        # The band kernels receive the band's pixel-row offset (y0) plus the
        # full image height, so the surfel homography evaluates in exact
        # full-frame NDC — no band-local remap.  Tolerance as in
        # test_2dgs_surfel (us = px/pz ulp amplification near small |pz|).
        settings = bgs.CloudSettings(gaussian_mode=bgs.GaussianMode.GAUSSIAN_2D)
        cloud = bgs.random_gaussians_3d_seeded(300, seed=1)
        sharded = shard_cloud(cloud, mesh)
        img_p = make_sharded_render(mesh, settings, W, H, compositor="pallas")(
            sharded, CAM
        )
        padded = cloud.pad(multiple=max(256, 8 * 8))
        ref = render_tiled(padded, CAM, settings, width=W, height=H)
        np.testing.assert_allclose(_np(img_p), _np(ref), atol=3e-4)

    def test_pallas_sharded_2dgs_train_grads(self, mesh):
        settings = bgs.CloudSettings(gaussian_mode=bgs.GaussianMode.GAUSSIAN_2D)
        cloud = bgs.random_gaussians_3d_seeded(200, seed=2)
        sharded = shard_cloud(cloud, mesh)
        render_fn = make_sharded_render(mesh, settings, W, H)
        target = render_fn(sharded, CAM) * 0.9

        step_p, init_p = make_train_step(
            mesh, settings, W, H, learning_rate=1e-3, compositor="pallas"
        )
        step_x, init_x = make_train_step(mesh, settings, W, H, learning_rate=1e-3)
        c_p, _, loss_p = step_p(sharded, init_p(sharded), CAM, target)
        c_x, _, loss_x = step_x(sharded, init_x(sharded), CAM, target)
        np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-4)
        for f in ("position_visibility", "scale_opacity", "spherical_harmonic"):
            np.testing.assert_allclose(
                _np(getattr(c_p, f)), _np(getattr(c_x, f)), atol=2e-4, err_msg=f
            )

    def test_pallas_sharded_train_grads(self, mesh):
        settings = bgs.CloudSettings()
        cloud = bgs.random_gaussians_3d_seeded(200, seed=2)
        sharded = shard_cloud(cloud, mesh)
        render_fn = make_sharded_render(mesh, settings, W, H)
        target = render_fn(sharded, CAM) * 0.9

        step_p, init_p = make_train_step(
            mesh, settings, W, H, learning_rate=1e-3, compositor="pallas"
        )
        step_x, init_x = make_train_step(mesh, settings, W, H, learning_rate=1e-3)
        c_p, _, loss_p = step_p(sharded, init_p(sharded), CAM, target)
        c_x, _, loss_x = step_x(sharded, init_x(sharded), CAM, target)
        np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-4)
        # the post-step parameters agree -> the gradients agreed
        for f in ("position_visibility", "scale_opacity", "spherical_harmonic"):
            np.testing.assert_allclose(
                _np(getattr(c_p, f)), _np(getattr(c_x, f)), atol=2e-4, err_msg=f
            )


def test_train_step_skips_nonfinite():
    """apply_if_finite guard: a poisoned cloud (NaN position) must not
    propagate NaNs into the parameters; the bad step is skipped."""
    import dataclasses

    import bevy_gaussian_splatting_tpu as bgs
    from bevy_gaussian_splatting_tpu.parallel.render import (
        make_mesh,
        make_sharded_render,
        make_train_step,
        shard_cloud,
    )

    mesh8 = make_mesh(8)
    cloud = bgs.random_gaussians_3d_seeded(64, seed=0)
    sharded = shard_cloud(cloud, mesh8)
    cam = bgs.Camera.create(eye=(0, 0, 60.0), target=(0, 0, 0), width=64, height=128)
    settings = bgs.CloudSettings()
    render = make_sharded_render(mesh8, settings, 64, 128)
    target = render(sharded, cam)

    step, init = make_train_step(
        mesh8, settings, 64, 128, learning_rate=1e-2, skip_nonfinite=3
    )
    opt_state = init(sharded)

    # poison one position with NaN: grads become non-finite somewhere
    pv = np.asarray(sharded.position_visibility).copy()
    pv[0, 0] = np.nan
    bad = dataclasses.replace(sharded, position_visibility=jnp.asarray(pv))
    bad = shard_cloud(
        dataclasses.replace(cloud, position_visibility=jnp.asarray(pv[: len(cloud)])),
        mesh8,
    )
    opt_state_bad = init(bad)
    new_cloud, _, _ = step(bad, opt_state_bad, cam, target)
    # the NaN input entry remains NaN, but the update must have been skipped:
    # all OTHER parameters must be exactly unchanged (no NaN propagation)
    a = np.asarray(new_cloud.rotation)
    b = np.asarray(bad.rotation)
    np.testing.assert_array_equal(a, b)
